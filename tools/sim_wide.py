"""Union-visit counts for wide (BVH4/BVH8) trees vs the binary baseline,
on mattest bounce rays. Wide nodes are binary nodes collapsed 2-3 levels;
leaf granularity (8 tris) is unchanged. Cost model from measured kernel
numbers: C_int2=887cy, C_leaf=2460cy, C_int4~=1150, C_int8~=1700."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
from sim_traversal import load_mattest, gen_rays, _majority_octant

def build_wide(flat, arity):
    """Collapse binary skip-link arrays into a wide tree (dict of arrays).
    Returns (children list per wide node, is_leaf flags, boxes)."""
    fst, skp = flat["first"][0], flat["skip"][0]
    bmn, bmx = flat["bmin"][0], flat["bmax"][0]
    levels = {4: 2, 8: 3}[arity]
    # binary children: internal i -> (i+1, skp[i+1])
    def kids(i):
        if fst[i] >= 0:
            return None
        return (i + 1, skp[i + 1])
    wide_children = {}
    def expand(i):
        """wide children of subtree rooted at binary node i."""
        front = [i]
        for _ in range(levels):
            nxt = []
            for n in front:
                k = kids(n)
                if k is None:
                    nxt.append(n)
                else:
                    nxt.extend(k)
            front = nxt
        return front
    # BFS build from root
    from collections import deque
    q = deque()
    root_kids = expand(0) if kids(0) is not None else [0]
    wide_children[0] = root_kids
    q.extend(root_kids)
    seen = {0}
    while q:
        n = q.popleft()
        if n in seen:
            continue
        seen.add(n)
        if kids(n) is not None:
            ch = expand(n)
            wide_children[n] = ch
            q.extend(ch)
    return wide_children, fst, bmn, bmx

def walk_wide(wide_children, fst, bmn, bmx, o, d):
    inv = np.where(np.abs(d) < 1e-20, 1e20, 1.0/np.where(d == 0, 1, d))
    t_best = np.full(len(o), np.inf, np.float32)
    n_int = n_leaf = 0
    stack = [0]
    def slab(i):
        t0 = (bmn[i]-o)*inv; t1 = (bmx[i]-o)*inv
        tn = np.minimum(t0,t1).max(-1); tf = np.maximum(t0,t1).min(-1)
        return (tn<=tf)&(tf>=1e-4)&(tn<=t_best), tf
    while stack:
        i = stack.pop()
        if fst[i] >= 0:
            hit, tf = slab(i)
            if hit.any():
                n_leaf += 1
                t_best = np.where(hit, np.minimum(t_best, np.maximum(tf,0)), t_best)
            continue
        n_int += 1  # one wide-node iteration tests all children boxes
        for c in wide_children.get(i, []):
            hit, _ = slab(c)
            if hit.any():
                stack.append(c)
    return n_int, n_leaf

def main():
    scene, camera, host = load_mattest()
    from glaze_tpu.accel import bvh as bvh_mod
    tris = np.asarray(scene.bvh.tri)
    v0,e1,e2 = tris[:,0:3],tris[:,3:6],tris[:,6:9]
    tv = np.stack([v0,v0+e1,v0+e2],axis=1)
    good = (np.abs(e1).sum(1)+np.abs(e2).sum(1))>0
    flat = bvh_mod.build_host_octants(tv[good])
    (po,pd),(bo,bd) = gen_rays(scene, camera)
    for arity, c_int in ((4, 1150), (8, 1700)):
        wc, fst, bmn, bmx = build_wide(flat, arity)
        for name, o, d in (("primary", po, pd), ("bounce", bo, bd)):
            ni = nl = 0; cnt = 0
            for t in range(0, len(o)//2048, 16):
                sl = slice(t*2048, (t+1)*2048)
                a, b = walk_wide(wc, fst, bmn, bmx,
                                 o[sl].astype(np.float32),
                                 d[sl].astype(np.float32))
                ni += a; nl += b; cnt += 1
            cyc = ni/cnt*c_int + nl/cnt*2460
            base = {"primary": 120*887+31*2460, "bounce": 1460*887+447*2460}[name]
            print(f"BVH{arity} {name:8s}: int={ni/cnt:7.1f} leaf={nl/cnt:6.1f} "
                  f"est {cyc/1e3:6.0f}k cy/tile vs binary {base/1e3:6.0f}k "
                  f"-> {base/cyc:4.2f}x")

if __name__ == "__main__":
    main()
