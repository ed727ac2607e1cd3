"""Simulates the while-while sub-packet schedule: 16 rows of 128 rays,
each row walks internal nodes until stalled at a hit leaf; a leaf phase
processes all stalled rows at once. Counts inner node iterations and
leaf phases per 2048-ray tile."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from sim_traversal import load_mattest, gen_rays, _majority_octant

def row_events(flat_oct, o, d, oct_):
    """Per 128-ray row: list of internal-run lengths between leaf visits."""
    bmn, bmx = flat_oct["bmin"][oct_], flat_oct["bmax"][oct_]
    fst, skp = flat_oct["first"][oct_], flat_oct["skip"][oct_]
    m = bmn.shape[0]
    inv = np.where(np.abs(d) < 1e-20, 1e20, 1.0/np.where(d == 0, 1, d))
    t_best = np.full(len(o), np.inf, np.float32)
    ptr = 0
    runs = [0]
    while 0 <= ptr < m:
        t0 = (bmn[ptr]-o)*inv; t1 = (bmx[ptr]-o)*inv
        tn = np.minimum(t0,t1).max(-1); tf = np.maximum(t0,t1).min(-1)
        hit = (tn<=tf)&(tf>=1e-4)&(tn<=t_best)
        anyh = hit.any(); leaf = fst[ptr] >= 0
        if anyh and leaf:
            t_best = np.where(hit, np.minimum(t_best, np.maximum(tf,0)), t_best)
            runs.append(0)
            ptr = skp[ptr]
        else:
            runs[-1] += 1
            ptr = ptr+1 if (anyh and not leaf) else skp[ptr]
    return runs  # runs[i] = internal iterations before leaf phase i

def main():
    scene, camera, host = load_mattest()
    from glaze_tpu.accel import bvh as bvh_mod
    tris = np.asarray(scene.bvh.tri)
    v0,e1,e2 = tris[:,0:3],tris[:,3:6],tris[:,6:9]
    tv = np.stack([v0,v0+e1,v0+e2],axis=1)
    good = (np.abs(e1).sum(1)+np.abs(e2).sum(1))>0
    flat_oct = bvh_mod.build_host_octants(tv[good])
    (po,pd),(bo,bd) = gen_rays(scene, camera)
    for name,o,d in (("primary",po,pd),("bounce",bo,bd)):
        tot_inner = tot_leaf = 0; cnt = 0
        for t in range(0, len(o)//2048, 8):
            sl = slice(t*2048,(t+1)*2048)
            oct_ = _majority_octant(d[sl])
            rows = [row_events(flat_oct, o[sl][r*128:(r+1)*128].astype(np.float32),
                               d[sl][r*128:(r+1)*128].astype(np.float32), oct_)
                    for r in range(16)]
            # lockstep rounds: round k: inner iterations = max over rows of
            # runs[k] (rows out of events idle); leaf phase if any row has
            # a leaf event k
            rounds = max(len(r) for r in rows)
            inner = sum(max((r[k] if k < len(r) else 0) for r in rows)
                        for k in range(rounds))
            leafp = max(len(r)-1 for r in rows)
            tot_inner += inner; tot_leaf += leafp; cnt += 1
        print(f"{name:8s}: inner-node-iters={tot_inner/cnt:7.1f} "
              f"leaf-phases={tot_leaf/cnt:6.1f}  per 2048-tile ({cnt} tiles)")

if __name__ == "__main__":
    main()
