"""Does a stable octant-only partition of bounce rays cut packet unions?
(Keeps pixel-order origin coherence within each octant bucket, unlike the
full morton sort which measured WORSE.)"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
from sim_traversal import load_mattest, gen_rays, walk_visits, _majority_octant

def main():
    scene, camera, host = load_mattest()
    from glaze_tpu.accel import bvh as bvh_mod
    tris = np.asarray(scene.bvh.tri)
    v0,e1,e2 = tris[:,0:3],tris[:,3:6],tris[:,6:9]
    tv = np.stack([v0,v0+e1,v0+e2],axis=1)
    good = (np.abs(e1).sum(1)+np.abs(e2).sum(1))>0
    flat = bvh_mod.build_host_octants(tv[good])
    (po,pd),(bo,bd) = gen_rays(scene, camera)

    def unions(o, d, label):
        ti, tl, ng, iters = walk_visits(flat, o.astype(np.float32),
                                        d.astype(np.float32), 2048,
                                        max_groups=24)
        print(f"{label:28s}: visits/tile={(ti+tl)/ng:7.1f} "
              f"(int {ti/ng:6.1f} leaf {tl/ng:6.1f})")

    unions(bo, bd, "bounce pixel-order")
    octant = ((bd[:,0]>=0).astype(int) | ((bd[:,1]>=0).astype(int)<<1)
              | ((bd[:,2]>=0).astype(int)<<2))
    perm = np.argsort(octant, kind="stable")
    unions(bo[perm], bd[perm], "bounce octant-partitioned")

    # mixed launch: 40% regen (camera), 60% continuing — interleaved per
    # pixel vs liveness-partitioned
    rng = np.random.default_rng(3)
    regen = rng.random(len(bo)) < 0.4
    mo = np.where(regen[:,None], po, bo)
    md = np.where(regen[:,None], pd, bd)
    unions(mo, md, "mixed 40/60 pixel-order")
    perm2 = np.argsort(~regen, kind="stable")  # regen first, stable
    unions(mo[perm2], md[perm2], "mixed liveness-partitioned")
    key = (~regen).astype(int)*8 + octant
    perm3 = np.argsort(key, kind="stable")
    unions(mo[perm3], md[perm3], "mixed liveness+octant")

if __name__ == "__main__":
    main()
