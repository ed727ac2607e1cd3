"""Exact emulation of the SLOT-SWEPT PER-LANE window design vs the
current windowed kernel, on mattest rays.

Design under test: each of the 16 rows holds 128 PER-LANE pointers. Per
outer round a row loads the aligned 16-node window containing its MINIMUM
pending lane pointer, then the kernel sweeps window slots w=0..15 in
order (compile-time-constant lane indices -> broadcasts, no dynamic
gathers); at each slot, lanes whose pointer sits at that slot resolve it
(slab test per lane, leaf enqueue at ROW level like today, pointer
advance). Monotone skip-links mean a lane never returns to a lower slot,
so one sweep fully services every in-window lane.

Outputs rounds (window loads, lockstep max over rows) and drain rounds,
to compare against tools/sim_win_exact.py's numbers for the current
kernel under the fitted cost model:
  current round  ~ 533 + S*262 cy      (S=4 -> 1581)
  slot round     ~ 533 + 16*C_slot cy  (C_slot unknown, plot breakeven)
  drain          ~ 3506 cy both

Usage: python tools/sim_slotsweep.py [Q]
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
from sim_traversal import load_mattest, gen_rays, _majority_octant


def emulate_tile(flat_oct, o, d, oct_, Q):
    bmn, bmx = flat_oct["bmin"][oct_], flat_oct["bmax"][oct_]
    fst, skp = flat_oct["first"][oct_], flat_oct["skip"][oct_]
    m = bmn.shape[0]
    R, L = 16, 128
    o = o.reshape(R, L, 3).astype(np.float32)
    d = d.reshape(R, L, 3).astype(np.float32)
    inv = np.where(np.abs(d) < 1e-20, 1e20, 1.0 / np.where(d == 0, 1, d))
    t_best = np.full((R, L), np.inf, np.float32)
    ptr = np.zeros((R, L), np.int64)  # PER-LANE pointers
    queue = [[] for _ in range(R)]
    rounds = drains = 0

    def slab_lane(r, lanes, i):
        t0 = (bmn[i] - o[r, lanes]) * inv[r, lanes]
        t1 = (bmx[i] - o[r, lanes]) * inv[r, lanes]
        tn = np.minimum(t0, t1).max(-1)
        tf = np.maximum(t0, t1).min(-1)
        return (tn <= tf) & (tf >= 1e-4) & (tn <= t_best[r, lanes])

    def do_drain():
        nonlocal drains
        while any(queue):
            drains += 1
            for r in range(R):
                if queue[r]:
                    leaf = queue[r].pop(0)
                    lanes = np.arange(L)
                    h = slab_lane(r, lanes, leaf)
                    t0 = (bmn[leaf] - o[r]) * inv[r]
                    t1 = (bmx[leaf] - o[r]) * inv[r]
                    tf = np.maximum(t0, t1).min(-1)
                    t_best[r] = np.where(h, np.minimum(t_best[r],
                                                       np.maximum(tf, 0)),
                                         t_best[r])

    while (ptr < m).any() or any(queue):
        rounds += 1
        for r in range(R):
            pend = ptr[r][ptr[r] < m]
            if not len(pend) or len(queue[r]) >= Q:
                continue
            win = (pend.min() // 16) * 16
            # sweep slots in order; per-lane resolution
            for w in range(16):
                node = win + w
                if node >= m:
                    break
                lanes = np.nonzero(ptr[r] == node)[0]
                if not len(lanes):
                    continue
                h = slab_lane(r, lanes, node)
                leaf = fst[node] >= 0
                if leaf and h.any():
                    if len(queue[r]) < Q:
                        queue[r].append(node)
                        ptr[r, lanes] = skp[node]
                    # queue full: lanes stay parked at this node
                else:
                    nxt = np.where(h & (fst[node] < 0), node + 1, skp[node])
                    ptr[r, lanes] = nxt
        if any(len(q) >= Q for q in queue) or not (ptr < m).any():
            do_drain()
    return rounds, drains


def main():
    Q = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    scene, camera, host = load_mattest()
    from glaze_tpu.accel import bvh as bvh_mod
    tris = np.asarray(scene.bvh.tri)
    v0, e1, e2 = tris[:, 0:3], tris[:, 3:6], tris[:, 6:9]
    tv = np.stack([v0, v0 + e1, v0 + e2], axis=1)
    good = (np.abs(e1).sum(1) + np.abs(e2).sum(1)) > 0
    flat_oct = bvh_mod.build_host_octants(tv[good])
    (po, pd), (bo, bd) = gen_rays(scene, camera)
    for name, o, d in (("primary", po, pd), ("bounce", bo, bd)):
        tr = td = n = 0
        for tix in range(0, len(o) // 2048, 24):
            sl = slice(tix * 2048, (tix + 1) * 2048)
            oct_ = _majority_octant(d[sl])
            r_, d_ = emulate_tile(flat_oct, o[sl], d[sl], oct_, Q)
            tr += r_
            td += d_
            n += 1
        # breakeven slot cost vs current kernel (S=4): time parity when
        # rounds*(533+16*C) + drains*3506 == current's 271*1581+180*3506
        print(f"{name}: rounds={tr/n:7.1f} drain-rounds={td/n:7.1f}  "
              f"/tile (Q={Q})")


if __name__ == "__main__":
    main()
