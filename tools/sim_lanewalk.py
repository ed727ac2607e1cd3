"""Simulates the LANE-ROW traversal design exactly and counts its cost
components, vs the packet-union baseline.

Design: every lane (ray) walks the skip-link DFS with its OWN pointer.
Pointers only increase (skip > ptr in DFS layouts), so scheduling the
minimum pending row visits each node row at most once per packet. Per
outer iteration the packet loads ONE node row (16 nodes) and lanes whose
pointer is inside step repeatedly (per-lane in-tile gathers); lanes that
reach a leaf block until the leaf's triangle row is scheduled the same
way (leaf first-indices are DFS-ordered too, so tri rows are also
monotone).

Outputs per 2048-ray packet: node-row iterations, total in-row steps
(sum over rows of the max per-lane step count — the dense inner loop),
and tri-row iterations. Compare with the baseline node-union count.

Usage: python tools/sim_lanewalk.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from sim_traversal import load_mattest, gen_rays, _majority_octant


def lane_row_walk(flat_oct, o, d, oct_, row_nodes=16, leaf_size=8):
    """Simulates the lane-row schedule for one packet. Returns
    (node_rows, inner_steps, tri_rows, per_ray_visits)."""
    bmn, bmx = flat_oct["bmin"][oct_], flat_oct["bmax"][oct_]
    fst, skp = flat_oct["first"][oct_], flat_oct["skip"][oct_]
    m = bmn.shape[0]
    g = len(o)
    inv = np.where(np.abs(d) < 1e-20, 1e20, 1.0 / np.where(d == 0, 1, d))
    t_best = np.full(g, np.inf, np.float32)
    ptr = np.zeros(g, np.int64)
    blocked_leaf = np.full(g, -1, np.int64)  # leaf node id awaiting tri row

    node_rows = inner_steps = tri_rows = 0
    visits = 0
    while True:
        active = ptr < m
        walkable = active & (blocked_leaf < 0)
        pending_tri = blocked_leaf >= 0
        if not walkable.any() and not pending_tri.any():
            break
        # schedule: min pending node row and min pending tri row
        if walkable.any():
            row = (ptr[walkable] // row_nodes).min()
            node_rows += 1
            # lanes step within this row until they leave it
            steps = 0
            while True:
                inrow = walkable & (ptr // row_nodes == row) & (ptr < m)
                if not inrow.any():
                    break
                steps += 1
                visits += int(inrow.sum())
                p = ptr[inrow]
                t0 = (bmn[p] - o[inrow]) * inv[inrow]
                t1 = (bmx[p] - o[inrow]) * inv[inrow]
                tn = np.minimum(t0, t1).max(-1)
                tf = np.maximum(t0, t1).min(-1)
                hit = (tn <= tf) & (tf >= 1e-4) & (tn <= t_best[inrow])
                leaf = fst[p] >= 0
                # leaf hit -> block for tri processing (stay at ptr)
                idx = np.where(inrow)[0]
                bl = hit & leaf
                blocked_leaf[idx[bl]] = p[bl]
                # non-blocking lanes advance
                nxt = np.where(hit & ~leaf, p + 1, skp[p])
                nxt = np.where(bl, p, nxt)  # blocked stay
                ptr[idx] = nxt
                walkable = active & (blocked_leaf < 0) & (ptr < m)
            inner_steps += steps
        pending_tri = blocked_leaf >= 0
        if pending_tri.any():
            # one tri row per outer iteration
            leaf_first = fst[blocked_leaf[pending_tri]]
            trow = (leaf_first // leaf_size).min()
            tri_rows += 1
            serve = pending_tri & (
                np.where(blocked_leaf >= 0, fst[np.maximum(blocked_leaf, 0)],
                         -1) // leaf_size == trow
            )
            # approximate the t update with the node's tf (consistent with
            # sim_traversal's optimistic pruning)
            p = blocked_leaf[serve]
            t0 = (bmn[p] - o[serve]) * inv[serve]
            t1 = (bmx[p] - o[serve]) * inv[serve]
            tf = np.maximum(t0, t1).min(-1)
            t_best[serve] = np.minimum(t_best[serve], np.maximum(tf, 0))
            ptr[serve] = skp[p]
            blocked_leaf[serve] = -1
    return node_rows, inner_steps, tri_rows, visits / g


def main():
    scene, camera, host = load_mattest()
    from glaze_tpu.accel import bvh as bvh_mod

    tris = np.asarray(scene.bvh.tri)
    v0, e1, e2 = tris[:, 0:3], tris[:, 3:6], tris[:, 6:9]
    tv = np.stack([v0, v0 + e1, v0 + e2], axis=1)
    good = (np.abs(e1).sum(1) + np.abs(e2).sum(1)) > 0
    flat_oct = bvh_mod.build_host_octants(tv[good])
    (po, pd), (bo, bd) = gen_rays(scene, camera)

    for name, o, d in (("primary", po, pd), ("bounce", bo, bd)):
        nr = ins = tr = pv = 0
        tiles = range(0, len(o) // 2048, 8)
        cnt = 0
        t0 = time.time()
        for t in tiles:
            sl = slice(t * 2048, (t + 1) * 2048)
            oct_ = _majority_octant(d[sl])
            a, b, c, v = lane_row_walk(flat_oct, o[sl].astype(np.float32),
                                       d[sl].astype(np.float32), oct_)
            nr += a
            ins += b
            tr += c
            pv += v
            cnt += 1
        print(f"{name:8s}: node-rows={nr / cnt:7.1f} inner-steps={ins / cnt:7.1f} "
              f"tri-rows={tr / cnt:7.1f} per-ray-visits={pv / cnt:6.1f} "
              f"[{time.time() - t0:.0f}s, {cnt} tiles]")
        # cost model: outer overhead ~300cy + inner step ~400cy(16,128);
        # tri row ~1100cy (8x MT dense)
        cyc = nr / cnt * 300 + ins / cnt * 400 + tr / cnt * 1100
        print(f"          est cycles/tile = {cyc / 1e3:.0f}k "
              f"(baseline union ~{1460 if name == 'bounce' else 120:.0f} "
              f"visits x ~1000cy)")


if __name__ == "__main__":
    main()
