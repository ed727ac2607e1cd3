"""Spatial-split BVH (SBVH, Stich et al. 2009) quality sim.

Tree QUALITY is the one traversal lever not on the measured non-win list:
every scheduling-side candidate (wide nodes, sort keys, slot windows,
leaf coalescing...) has been simmed/measured out, but all of them held
the binned-SAH object-split tree fixed. Sponza-class architectural
scenes are SBVH's best case — large wall/floor triangles straddle node
bounds and inflate child overlap, which the row-union walk then pays on
every one of the 128 lanes.

This sim builds (in NumPy, host-side) a reference-quality object-split
binned-SAH tree and an SBVH variant (spatial splits with AABB chopping +
triangle-slab clipping, reference duplication capped), then counts
row-union visits with the validated lockstep harness
(tools/sim_traversal.walk_visits) on the real bench geometry:
primary rays at interactive scale + 1080p, and the Morton-sorted
synthetic bounce mix (the dominant launch phase).

The flat output format {bmin,bmax,first,count,skip,tri_order} already
supports duplicated refs (tri_order repeats a triangle id), so a
promising result needs only a builder change, no kernel work.

Usage: JAX_PLATFORMS=cpu python tools/sim_sbvh.py [max_groups]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NUM_BINS = 16
LEAF_SIZE = 8


def _sa(bmin, bmax):
    d = np.maximum(bmax - bmin, 0.0)
    return 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2]
                  + d[..., 2] * d[..., 0])


def _clip_tri_slab(tv, axis, lo, hi):
    """AABB of triangle `tv` (3,3) clipped to slab lo<=x[axis]<=hi.

    Sutherland-Hodgman on the triangle polygon against the two planes;
    returns (bmin, bmax) or None if the clipped polygon is empty."""
    poly = [tv[i] for i in range(3)]
    for bound, keep_ge in ((lo, True), (hi, False)):
        out = []
        n = len(poly)
        for i in range(n):
            a, b = poly[i], poly[(i + 1) % n]
            da = a[axis] - bound
            db = b[axis] - bound
            ain = da >= 0 if keep_ge else da <= 0
            bin_ = db >= 0 if keep_ge else db <= 0
            if ain:
                out.append(a)
            if ain != bin_:
                t = da / (da - db)
                out.append(a + t * (b - a))
        poly = out
        if not poly:
            return None
    p = np.asarray(poly)
    return p.min(0), p.max(0)


class SBVHBuilder:
    def __init__(self, tri_verts, leaf_size=LEAF_SIZE, alpha=1e-5,
                 max_dup=1.5, spatial=True, clip_tris=True):
        self.tv = tri_verts  # (N, 3, 3)
        self.leaf_size = leaf_size
        self.alpha = alpha
        self.spatial = spatial
        self.clip_tris = clip_tris
        n = len(tri_verts)
        self.max_refs = int(max_dup * n)
        self.extra_refs = self.max_refs - n
        # refs as parallel arrays, appended on duplication
        self.rtri = list(range(n))
        self.rmin = [tri_verts[i].min(0) for i in range(n)]
        self.rmax = [tri_verts[i].max(0) for i in range(n)]
        self.root_sa = _sa(tri_verts.min((0, 1)), tri_verts.max((0, 1)))
        # emitted flat arrays
        self.bmin, self.bmax = [], []
        self.first, self.count, self.skip = [], [], []
        self.order = []
        self.n_spatial = 0

    def build(self):
        n = len(self.rtri)
        ids = np.arange(n)
        self._rec(ids)
        m = len(self.bmin)
        # skip[i] holds node i's DFS subtree size; the skip target is the
        # first node after the subtree (root: m = terminate)
        out_skip = np.arange(m) + np.asarray(self.skip, np.int64)
        return {
            "bmin": np.asarray(self.bmin, np.float32),
            "bmax": np.asarray(self.bmax, np.float32),
            "first": np.asarray(self.first, np.int32),
            "count": np.asarray(self.count, np.int32),
            "skip": out_skip.astype(np.int32),
            "tri_order": np.asarray(self.order, np.uint32),
        }

    def _leaf(self, ids, bmin, bmax):
        self.bmin.append(bmin)
        self.bmax.append(bmax)
        self.first.append(len(self.order))
        self.count.append(len(ids))
        self.skip.append(1)
        self.order.extend(int(self.rtri[i]) for i in ids)
        return 1

    def _rec(self, ids):
        """Emits the subtree, returns its node count."""
        rmin = np.asarray([self.rmin[i] for i in ids])
        rmax = np.asarray([self.rmax[i] for i in ids])
        bmin = rmin.min(0)
        bmax = rmax.max(0)
        if len(ids) <= self.leaf_size:
            return self._leaf(ids, bmin, bmax)

        cen = (rmin + rmax) * 0.5
        best = None  # (cost, kind, axis, payload)

        # --- object split: binned SAH on centroids, all 3 axes
        for axis in range(3):
            clo, chi = cen[:, axis].min(), cen[:, axis].max()
            if chi - clo < 1e-12:
                continue
            b = np.minimum(((cen[:, axis] - clo) / (chi - clo)
                            * NUM_BINS).astype(np.int64), NUM_BINS - 1)
            # per-bin bounds
            counts = np.bincount(b, minlength=NUM_BINS)
            binmin = np.full((NUM_BINS, 3), 1e30)
            binmax = np.full((NUM_BINS, 3), -1e30)
            for k in range(NUM_BINS):
                sel = b == k
                if counts[k]:
                    binmin[k] = rmin[sel].min(0)
                    binmax[k] = rmax[sel].max(0)
            lmin = np.minimum.accumulate(binmin, 0)
            lmax = np.maximum.accumulate(binmax, 0)
            rminacc = np.minimum.accumulate(binmin[::-1], 0)[::-1]
            rmaxacc = np.maximum.accumulate(binmax[::-1], 0)[::-1]
            lcnt = np.cumsum(counts)
            rcnt = len(ids) - lcnt
            for k in range(NUM_BINS - 1):
                if lcnt[k] == 0 or rcnt[k] == 0:
                    continue
                cost = (_sa(lmin[k], lmax[k]) * lcnt[k]
                        + _sa(rminacc[k + 1], rmaxacc[k + 1]) * rcnt[k])
                if best is None or cost < best[0]:
                    # overlap of the two child boxes (drives spatial try)
                    omin = np.maximum(lmin[k], rminacc[k + 1])
                    omax = np.minimum(lmax[k], rmaxacc[k + 1])
                    osa = _sa(omin, omax) if (omax > omin).all() else 0.0
                    best = (cost, "obj", axis, (b <= k), osa)

        # --- spatial split, tried when object-split children overlap
        if (self.spatial and best is not None
                and best[4] / self.root_sa > self.alpha
                and self.extra_refs > 0):
            sbest = None
            for axis in range(3):
                lo, hi = bmin[axis], bmax[axis]
                if hi - lo < 1e-12:
                    continue
                w = (hi - lo) / NUM_BINS
                entry = np.clip(((rmin[:, axis] - lo) / w).astype(np.int64),
                                0, NUM_BINS - 1)
                exit_ = np.clip(((rmax[:, axis] - lo) / w).astype(np.int64),
                                0, NUM_BINS - 1)
                # chopped per-bin bounds
                binmin = np.full((NUM_BINS, 3), 1e30)
                binmax = np.full((NUM_BINS, 3), -1e30)
                for j, i in enumerate(ids):
                    e0, e1 = entry[j], exit_[j]
                    if e0 == e1:
                        binmin[e0] = np.minimum(binmin[e0], rmin[j])
                        binmax[e0] = np.maximum(binmax[e0], rmax[j])
                        continue
                    for k in range(e0, e1 + 1):
                        slo, shi = lo + k * w, lo + (k + 1) * w
                        if self.clip_tris:
                            cb = _clip_tri_slab(self.tv[self.rtri[i]],
                                                axis, max(slo, rmin[j][axis]),
                                                min(shi, rmax[j][axis]))
                            if cb is None:
                                continue
                            cmin = np.maximum(cb[0], rmin[j])
                            cmax = np.minimum(cb[1], rmax[j])
                        else:
                            cmin = rmin[j].copy()
                            cmax = rmax[j].copy()
                            cmin[axis] = max(cmin[axis], slo)
                            cmax[axis] = min(cmax[axis], shi)
                        binmin[k] = np.minimum(binmin[k], cmin)
                        binmax[k] = np.maximum(binmax[k], cmax)
                lminacc = np.minimum.accumulate(binmin, 0)
                lmaxacc = np.maximum.accumulate(binmax, 0)
                rminacc = np.minimum.accumulate(binmin[::-1], 0)[::-1]
                rmaxacc = np.maximum.accumulate(binmax[::-1], 0)[::-1]
                for k in range(NUM_BINS - 1):
                    plane = lo + (k + 1) * w
                    lsel = rmin[:, axis] < plane
                    rsel = rmax[:, axis] > plane
                    onplane = ~lsel & ~rsel  # degenerate: rmin==rmax==plane
                    lcnt = int(lsel.sum() + onplane.sum())
                    rcnt = int(rsel.sum())
                    if lcnt == 0 or rcnt == 0:
                        continue
                    cost = (_sa(lminacc[k], lmaxacc[k]) * lcnt
                            + _sa(rminacc[k + 1], rmaxacc[k + 1]) * rcnt)
                    if sbest is None or cost < sbest[0]:
                        sbest = (cost, axis, plane, k)
            if sbest is not None and sbest[0] < best[0]:
                cost, axis, plane, k = sbest
                ndup = int((np.asarray(
                    [self.rmin[i][axis] for i in ids]) < plane).sum()
                    + (np.asarray(
                        [self.rmax[i][axis] for i in ids]) > plane).sum()
                    - len(ids))
                if ndup <= self.extra_refs:
                    self.extra_refs -= max(ndup, 0)
                    self.n_spatial += 1
                    return self._emit_spatial(ids, rmin, rmax, bmin, bmax,
                                              axis, plane)

        if best is None:
            # all centroids equal: median split
            axis = int(np.argmax(bmax - bmin))
            part = np.argsort(cen[:, axis], kind="stable")
            mid = len(ids) // 2
            lids, rids = ids[part[:mid]], ids[part[mid:]]
            if len(lids) == 0 or len(rids) == 0:
                return self._leaf(ids, bmin, bmax)
        else:
            sel = best[3]
            lids, rids = ids[sel], ids[~sel]
        return self._emit_internal(ids, bmin, bmax, lids, rids)

    def _emit_internal(self, ids, bmin, bmax, lids, rids):
        my = len(self.bmin)
        self.bmin.append(bmin)
        self.bmax.append(bmax)
        self.first.append(-1)
        self.count.append(0)
        self.skip.append(0)  # patched below
        sz = 1 + self._rec(lids)
        sz += self._rec(rids)
        self.skip[my] = sz
        return sz

    def _emit_spatial(self, ids, rmin, rmax, bmin, bmax, axis, plane):
        lids, rids = [], []
        for j, i in enumerate(ids):
            goes_l = rmin[j, axis] < plane
            goes_r = rmax[j, axis] > plane
            if not goes_l and not goes_r:
                goes_l = True  # degenerate on the plane
            if goes_l and goes_r:
                # split the ref: clip each side's box
                tri = self.tv[self.rtri[i]]
                if self.clip_tris:
                    cl = _clip_tri_slab(tri, axis, rmin[j, axis], plane)
                    cr = _clip_tri_slab(tri, axis, plane, rmax[j, axis])
                else:
                    cl = cr = (rmin[j], rmax[j])
                if cl is None and cr is None:  # numeric fallback: keep left
                    cl = (rmin[j], rmax[j])
                if cl is not None:
                    lmax = np.minimum(cl[1], rmax[j])
                    lmax[axis] = min(lmax[axis], plane)
                    self.rmin[i] = np.maximum(cl[0], rmin[j])
                    self.rmax[i] = lmax
                    lids.append(i)
                if cr is not None:
                    newmax = np.minimum(cr[1], rmax[j])
                    newmin = np.maximum(cr[0], rmin[j])
                    newmin[axis] = max(newmin[axis], plane)
                    if cl is None:  # left side empty: ref moves right whole
                        self.rmin[i] = newmin
                        self.rmax[i] = newmax
                        rids.append(i)
                    else:
                        self.rtri.append(self.rtri[i])
                        self.rmin.append(newmin)
                        self.rmax.append(newmax)
                        rids.append(len(self.rtri) - 1)
            elif goes_l:
                lids.append(i)
            else:
                rids.append(i)
        if not lids or not rids:
            return self._leaf(ids, bmin, bmax)
        return self._emit_internal(ids, bmin, bmax,
                                   np.asarray(lids), np.asarray(rids))


def main():
    import time

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from glaze_tpu.accel.bvh import (LEAF_SIZE as PROD_LEAF, build_host,
                                     _octants_from_flat)
    from glaze_tpu.render import integrator as integ
    from glaze_tpu.scene import flatten as F
    from tools.make_sponza import build_scene
    from tools.sim_traversal import gen_rays, walk_visits

    sys.setrecursionlimit(1_000_000)
    max_groups = int(sys.argv[1]) if len(sys.argv) > 1 else 1000

    parsed = build_scene()
    scene, camera, host = F.flatten_scene(parsed)
    tri = np.asarray(scene.bvh.tri)
    tv = np.ascontiguousarray(
        np.stack([tri[:, 0:3], tri[:, 0:3] + tri[:, 3:6],
                  tri[:, 0:3] + tri[:, 6:9]], axis=1), np.float32)
    n = len(tv)
    print(f"{n} triangles")

    # ray sets
    raysets = {}
    for w, h in ((384, 224), (1920, 1088)):
        px, py = integ.pixel_coords(w, h)
        c2w, s2c = integ.camera_matrices(camera, w, h)
        ndc_x = -1.0 + 2.0 * (px + 0.5) / w
        ndc_y = -1.0 + 2.0 * (py + 0.5) / h
        o, d = integ.camera_rays(ndc_x, ndc_y, jnp.asarray(c2w),
                                 jnp.asarray(s2c), True)
        raysets[f"primary {w}x{h}"] = (
            np.stack([np.asarray(c) for c in o], -1),
            np.stack([np.asarray(c) for c in d], -1))
    (_, _), (bo, bd) = gen_rays(scene, camera, 1920, 1088)
    # production bounce sort: [octant3 | origin morton5/axis]
    centre = np.asarray(scene.scene_centre)
    radius = float(np.asarray(scene.scene_radius))
    lo, ext = centre - radius, 2.0 * radius
    q = np.clip(((bo - lo) / ext * 32).astype(np.int64), 0, 31)
    key = np.zeros(len(bo), np.int64)
    for b in range(5):
        for i in range(3):
            key |= ((q[:, i] >> b) & 1) << (3 * b + i)
    octant = ((bd[:, 0] >= 0).astype(np.int64)
              | ((bd[:, 1] >= 0).astype(np.int64) << 1)
              | ((bd[:, 2] >= 0).astype(np.int64) << 2))
    order = np.argsort((octant << 15) | key, kind="stable")
    nb = (len(bo) // 2048) * 2048
    raysets["bounce sorted"] = (bo[order][:nb], bd[order][:nb])

    def measure(name, flat):
        oct_tables = _octants_from_flat(flat, PROD_LEAF)
        m = flat["bmin"].shape[0]
        nrefs = len(flat["tri_order"])
        line = f"{name:28s} nodes {m:6d} refs {nrefs:6d}"
        for rname, (o, d) in raysets.items():
            ni, nl, ng, iters = walk_visits(oct_tables, o, d, group=128,
                                            max_groups=max_groups,
                                            tile=2048, tile_octant=True)
            lock = iters / (ng / 16)
            line += f" | {rname}: {(ni + nl) / ng:6.1f}/row lock {lock:6.1f}"
        print(line, flush=True)

    t0 = time.time()
    measure("native binned-SAH (prod)", build_host(tv, PROD_LEAF))
    print(f"  [{time.time() - t0:.0f}s]")

    for tag, kw in (
        ("py object-SAH (sanity)", dict(spatial=False)),
        ("SBVH a=1e-5 clip", dict(alpha=1e-5, clip_tris=True)),
        ("SBVH a=1e-5 chop", dict(alpha=1e-5, clip_tris=False)),
        ("SBVH a=1e-6 clip dup2x", dict(alpha=1e-6, clip_tris=True,
                                        max_dup=2.0)),
    ):
        t0 = time.time()
        b = SBVHBuilder(tv, PROD_LEAF, **kw)
        flat = b.build()
        print(f"  build {time.time() - t0:.0f}s, spatial splits "
              f"{b.n_spatial}, refs {len(flat['tri_order'])} "
              f"({len(flat['tri_order']) / n:.2f}x)")
        measure(tag, flat)


if __name__ == "__main__":
    main()
