"""Leaf multiplicity across the 16 rows of a tile, per drain phase:
how many rows queue the SAME leaf (windowed-kernel emulation, mattest).
Decides whether leaf-major drain scheduling (+MXU leaf matmuls) can pay:
breakeven needs multiplicity ~3.7; measured primary 4.65, bounce 1.21 —
bounce rows touch nearly disjoint leaf sets, so leaf-major coalescing is
a NON-win for the bounce bottleneck. Usage: python tools/sim_leafmult.py
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
from sim_traversal import load_mattest, gen_rays, _majority_octant

def emulate_tile(flat_oct, o, d, oct_, S, Q):
    """Windowed-kernel emulation, instrumented: per drain PHASE record
    (row-leaf pairs, distinct leaves)."""
    bmn, bmx = flat_oct["bmin"][oct_], flat_oct["bmax"][oct_]
    fst, skp = flat_oct["first"][oct_], flat_oct["skip"][oct_]
    m = bmn.shape[0]
    R = 16
    o = o.reshape(R, 128, 3).astype(np.float32)
    d = d.reshape(R, 128, 3).astype(np.float32)
    inv = np.where(np.abs(d) < 1e-20, 1e20, 1.0/np.where(d == 0, 1, d))
    t_best = np.full((R, 128), np.inf, np.float32)
    ptr = np.zeros(R, np.int64)
    queue = [[] for _ in range(R)]
    pairs = distinct = 0
    def slab(r, i):
        t0 = (bmn[i]-o[r])*inv[r]; t1 = (bmx[i]-o[r])*inv[r]
        tn = np.minimum(t0,t1).max(-1); tf = np.maximum(t0,t1).min(-1)
        return (tn<=tf)&(tf>=1e-4)&(tn<=t_best[r])
    def do_drain():
        nonlocal pairs, distinct
        all_leaves = [l for q in queue for l in q]
        pairs += len(all_leaves)
        distinct += len(set(all_leaves))
        while any(queue):
            for r in range(R):
                if queue[r]:
                    leaf = queue[r].pop(0)
                    h = slab(r, leaf)
                    t0 = (bmn[leaf]-o[r])*inv[r]; t1 = (bmx[leaf]-o[r])*inv[r]
                    tf = np.maximum(t0,t1).min(-1)
                    t_best[r] = np.where(h, np.minimum(t_best[r], np.maximum(tf,0)), t_best[r])
    while (ptr < m).any() or any(queue):
        win = np.minimum(ptr, m-1)//16
        for _ in range(S):
            for r in range(R):
                p = ptr[r]
                if p >= m or p//16 != win[r] or len(queue[r]) >= Q:
                    continue
                hit = slab(r, p); anyh = hit.any(); leaf = fst[p] >= 0
                if leaf and anyh:
                    queue[r].append(p); ptr[r] = skp[p]
                else:
                    ptr[r] = p+1 if (anyh and not leaf) else skp[p]
        if any(len(q) >= Q for q in queue) or not (ptr < m).any():
            do_drain()
    return pairs, distinct

def main():
    scene, camera, host = load_mattest()
    from glaze_tpu.accel import bvh as bvh_mod
    tris = np.asarray(scene.bvh.tri)
    v0, e1, e2 = tris[:,0:3], tris[:,3:6], tris[:,6:9]
    tv = np.stack([v0, v0+e1, v0+e2], axis=1)
    good = (np.abs(e1).sum(1)+np.abs(e2).sum(1)) > 0
    flat_oct = bvh_mod.build_host_octants(tv[good])
    (po, pd), (bo, bd) = gen_rays(scene, camera)
    for name, o, d in (("primary", po, pd), ("bounce", bo, bd)):
        tp_ = td = n = 0
        for tix in range(0, len(o)//2048, 24):
            sl = slice(tix*2048, (tix+1)*2048)
            oct_ = _majority_octant(d[sl])
            p_, d_ = emulate_tile(flat_oct, o[sl], d[sl], oct_, 4, 8)
            tp_ += p_; td += d_; n += 1
        print(f"{name}: row-leaf pairs {tp_/n:7.1f}/tile  distinct {td/n:7.1f}"
              f"  multiplicity {tp_/max(td,1):.2f}")

main()
