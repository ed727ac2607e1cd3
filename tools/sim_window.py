"""Measures 16-node-window locality of per-row (128-ray sub-packet) walks:
how many consecutive walk steps stay inside the same aligned 16-node row.
High run lengths mean one VMEM row load (the expensive per-row scalar
op in the while-while kernel) can serve several in-tile lane-gather steps.

Also reports, for lockstep scheduling of 16 rows with S unrolled in-window
steps per load round, the projected load-rounds and step-rounds per tile.

Usage: python tools/sim_window.py [scene]   (scene: mattest | sponza)
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
from sim_traversal import load_mattest, gen_rays, _majority_octant


def walk_trace(flat_oct, o, d, oct_):
    """Sequence of visited node ids for a 128-ray row walk (union)."""
    bmn, bmx = flat_oct["bmin"][oct_], flat_oct["bmax"][oct_]
    fst, skp = flat_oct["first"][oct_], flat_oct["skip"][oct_]
    m = bmn.shape[0]
    inv = np.where(np.abs(d) < 1e-20, 1e20, 1.0 / np.where(d == 0, 1, d))
    t_best = np.full(len(o), np.inf, np.float32)
    ptr = 0
    seq = []
    while 0 <= ptr < m:
        t0 = (bmn[ptr] - o) * inv
        t1 = (bmx[ptr] - o) * inv
        tn = np.minimum(t0, t1).max(-1)
        tf = np.maximum(t0, t1).min(-1)
        hit = (tn <= tf) & (tf >= 1e-4) & (tn <= t_best)
        anyh = hit.any()
        leaf = fst[ptr] >= 0
        seq.append(ptr)
        if anyh and leaf:
            t_best = np.where(hit, np.minimum(t_best, np.maximum(tf, 0)),
                              t_best)
            ptr = skp[ptr]
        else:
            ptr = ptr + 1 if (anyh and not leaf) else skp[ptr]
    return np.asarray(seq)


def run_lengths(seq):
    """Lengths of maximal runs within one aligned 16-node window."""
    w = seq // 16
    changes = np.flatnonzero(np.diff(w) != 0)
    bounds = np.concatenate([[-1], changes, [len(w) - 1]])
    return np.diff(bounds)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "mattest"
    if which == "sponza":
        import jax
        jax.config.update("jax_platforms", "cpu")
        from tools.make_sponza import build_scene
        from glaze_tpu.scene.flatten import flatten_scene
        parsed = build_scene()
        scene, camera, host = flatten_scene(parsed)
    else:
        scene, camera, host = load_mattest()
    from glaze_tpu.accel import bvh as bvh_mod
    b = scene.bvh
    if hasattr(b, "chunks"):
        print("chunked scene; using chunk 0")
        b = b.chunks[0]
    tris = np.asarray(b.tri)
    v0, e1, e2 = tris[:, 0:3], tris[:, 3:6], tris[:, 6:9]
    tv = np.stack([v0, v0 + e1, v0 + e2], axis=1)
    good = (np.abs(e1).sum(1) + np.abs(e2).sum(1)) > 0
    flat_oct = bvh_mod.build_host_octants(tv[good])
    print(f"nodes={flat_oct['bmin'].shape[1]}")
    (po, pd), (bo, bd) = gen_rays(scene, camera)

    for name, o, d in (("primary", po, pd), ("bounce", bo, bd)):
        all_runs = []
        tiles = range(0, len(o) // 2048, max(len(o) // 2048 // 8, 1))
        tot_steps = tot_loads = 0
        lockstep = {1: 0, 2: 0, 3: 0, 4: 0, 6: 0}
        for tix in tiles:
            sl = slice(tix * 2048, (tix + 1) * 2048)
            oct_ = _majority_octant(d[sl])
            traces = []
            for r in range(16):
                rr = slice(tix * 2048 + r * 128, tix * 2048 + (r + 1) * 128)
                seq = walk_trace(flat_oct, o[rr].astype(np.float32),
                                 d[rr].astype(np.float32), oct_)
                traces.append(seq)
                runs = run_lengths(seq)
                all_runs.append(runs)
                tot_steps += len(seq)
                tot_loads += len(runs)
            # lockstep model: each round = 1 load (all rows) + S in-window
            # steps; a row idles once its run ends. rounds = for each row,
            # sum over its runs of ceil(run/S); lockstep rounds = max? No:
            # rows run independent schedules but share the loop; rounds
            # needed = max over rows of ceil-sum.
            for S in lockstep:
                per_row = [int(np.ceil(run_lengths(t) / S).sum())
                           for t in traces]
                lockstep[S] += max(per_row)
        runs = np.concatenate(all_runs)
        ntiles = len(list(tiles))
        print(f"{name}: steps/row-walk avg={tot_steps / (ntiles * 16):8.1f} "
              f"loads={tot_loads / (ntiles * 16):8.1f} "
              f"steps/load={tot_steps / tot_loads:5.2f}")
        h = np.bincount(np.minimum(runs, 10))
        print(f"  run-length hist (capped 10): {h / h.sum()}")
        for S, rounds in lockstep.items():
            print(f"  lockstep rounds S={S}: {rounds / ntiles:8.1f} /tile")


if __name__ == "__main__":
    main()
