"""Traversal design simulator: counts BVH visits for packet-union walks at
different packet granularities, on the real mattest geometry with realistic
primary and bounce ray distributions.

Usage: python tools/sim_traversal.py [n_rays]

Groups of G rays walk the skip-link tree together (a node is visited if ANY
ray in the group wants it). G=2048 is the round-1 kernel (one pointer per
16x128 tile); G=128 is the per-sublane-row design (16 pointers per tile);
G=1 is the per-ray optimum. Reports internal/leaf visit counts per launch
so kernel designs can be costed as visits x cycles-per-visit.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import numpy as np


def load_mattest():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import glaze_tpu
    from glaze_tpu.scene.flatten import flatten_scene
    from glaze_tpu.render import integrator as integ
    from glaze_tpu.accel import bvh as bvh_mod

    parsed = glaze_tpu.parse("/root/reference/resources/mattest.glaze")
    scene, camera, host = flatten_scene(parsed)
    return scene, camera, host


def gen_rays(scene, camera, width=512, height=512):
    """(primary o/d, bounce o/d) in pixel (tile-swizzled) order."""
    import jax.numpy as jnp
    from glaze_tpu.render import integrator as integ
    from glaze_tpu.accel import closest_hit
    from glaze_tpu.ops import vec

    px, py = integ.pixel_coords(width, height)
    c2w, s2c = integ.camera_matrices(camera, width, height)
    ndc_x = -1.0 + 2.0 * (px + 0.5) / width
    ndc_y = -1.0 + 2.0 * (py + 0.5) / height
    o, d = integ.camera_rays(ndc_x, ndc_y, jnp.asarray(c2w), jnp.asarray(s2c),
                             True)
    o = np.stack([np.asarray(c) for c in o], -1)
    d = np.stack([np.asarray(c) for c in d], -1)

    hit = closest_hit(scene.bvh, jnp.asarray(o), jnp.asarray(d))
    t = np.asarray(hit["t"])
    tri = np.asarray(hit["tri"])
    hitm = tri >= 0
    # bounce: cosine hemisphere around the geometric normal at the hit
    tris = np.asarray(scene.bvh.tri)
    e1 = tris[np.maximum(tri, 0), 3:6]
    e2 = tris[np.maximum(tri, 0), 6:9]
    n = np.cross(e1, e2)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    n *= -np.sign((n * d).sum(-1, keepdims=True))  # face the ray
    rng = np.random.default_rng(7)
    r0 = rng.random(len(o))
    r1 = rng.random(len(o))
    st = np.sqrt(r0)
    phi = 2 * np.pi * r1
    # local frame
    a = np.where(np.abs(n[:, 2:3]) < 0.9, [0, 0, 1.0], [1.0, 0, 0])
    tx = np.cross(a, n)
    tx /= np.maximum(np.linalg.norm(tx, axis=-1, keepdims=True), 1e-20)
    ty = np.cross(n, tx)
    bd = (
        tx * (st * np.cos(phi))[:, None]
        + ty * (st * np.sin(phi))[:, None]
        + n * np.sqrt(1 - r0)[:, None]
    )
    bo = o + d * np.where(hitm, t, 1.0)[:, None]
    return (o, d), (bo[hitm], bd[hitm])


def _walk_one(flat_oct, og, dg, oct_):
    """(internal, leaf) union visits for one group on one octant layout."""
    bmn, bmx = flat_oct["bmin"][oct_], flat_oct["bmax"][oct_]
    fst, skp = flat_oct["first"][oct_], flat_oct["skip"][oct_]
    m = bmn.shape[0]
    inv = np.where(np.abs(dg) < 1e-20, 1e20, 1.0 / np.where(dg == 0, 1, dg))
    t_best = np.full(len(og), np.inf, np.float32)
    ptr = 0
    n_int = n_leaf = 0
    while 0 <= ptr < m:
        t0 = (bmn[ptr] - og) * inv
        t1 = (bmx[ptr] - og) * inv
        tn = np.minimum(t0, t1).max(-1)
        tf = np.maximum(t0, t1).min(-1)
        hit = (tn <= tf) & (tf >= 1e-4) & (tn <= t_best)
        anyh = hit.any()
        leaf = fst[ptr] >= 0
        if anyh and leaf:
            n_leaf += 1
            # approximate leaf t update: use box tf as a stand-in for
            # triangle t (slightly optimistic pruning, identical across
            # designs)
            t_best = np.where(hit, np.minimum(t_best, np.maximum(tf, 0)),
                              t_best)
        elif anyh:
            n_int += 1
        ptr = ptr + 1 if (anyh and not leaf) else skp[ptr]
    return n_int, n_leaf


def _majority_octant(dg):
    return (
        int((dg[:, 0] >= 0).mean() >= 0.5)
        + 2 * int((dg[:, 1] >= 0).mean() >= 0.5)
        + 4 * int((dg[:, 2] >= 0).mean() >= 0.5)
    )


def walk_visits(flat_oct, o, d, group, max_groups=None, tile=2048,
                tile_octant=False):
    """Union visits for groups of `group` rays walking together.

    ``tile_octant``: pick the octant layout from the enclosing `tile`-ray
    parent tile (the kernel's per-grid-step scalar prefetch) instead of the
    group's own majority — models sub-packet rows sharing one VMEM slab.
    Returns (internal, leaf, n_groups, iters) where ``iters`` sums, per
    parent tile, the MAX group visit count (sub-packets run in lockstep;
    the slowest row serializes the tile).
    """
    n = len(o)
    ntiles = n // tile
    per_tile = max(tile // group, 1)
    sample_tiles = range(ntiles)
    if max_groups:
        want = max(max_groups // per_tile, 1)
        stride = max(ntiles // want, 1)
        sample_tiles = range(0, ntiles, stride)
    tot_int = tot_leaf = tot_iter = 0
    ngroups = 0
    for tix in sample_tiles:
        tile_max = 0
        toct = _majority_octant(d[tix * tile:(tix + 1) * tile])
        for sub in range(per_tile):
            s = tix * tile + sub * group
            og, dg = o[s:s + group], d[s:s + group]
            oct_ = toct if tile_octant else _majority_octant(dg)
            ni, nl = _walk_one(flat_oct, og, dg, oct_)
            tot_int += ni
            tot_leaf += nl
            ngroups += 1
            tile_max = max(tile_max, ni + nl)
        tot_iter += tile_max
    return tot_int, tot_leaf, ngroups, tot_iter


def main():
    n_rays = int(sys.argv[1]) if len(sys.argv) > 1 else 512 * 512
    scene, camera, host = load_mattest()
    from glaze_tpu.accel import bvh as bvh_mod

    # rebuild octant tables on the raw leaf-aligned triangles the scene used
    tris = np.asarray(scene.bvh.tri)
    # reconstruct (N, 3, 3) from v0/e1/e2 rows
    v0, e1, e2 = tris[:, 0:3], tris[:, 3:6], tris[:, 6:9]
    tv = np.stack([v0, v0 + e1, v0 + e2], axis=1)
    # drop degenerate padding rows for the build
    good = (np.abs(e1).sum(1) + np.abs(e2).sum(1)) > 0
    flat_oct = bvh_mod.build_host_octants(tv[good])
    m = flat_oct["bmin"].shape[1]
    print(f"mattest: {good.sum()} tris, {m} nodes")

    (po, pd), (bo, bd) = gen_rays(scene, camera)
    print(f"rays: {len(po)} primary, {len(bo)} bounce")

    def sort_key(o, d):
        root_min = flat_oct["bmin"][0][0]
        root_max = flat_oct["bmax"][0][0]
        ext = np.maximum(root_max - root_min, 1e-20)
        q = np.clip(((o - root_min) / ext * 31.0).astype(np.int64), 0, 31)

        def spread(x):
            x = (x | (x << 8)) & 0x100F
            x = (x | (x << 4)) & 0x10C3
            x = (x | (x << 2)) & 0x1249
            return x

        morton = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
        octant = (
            (d[:, 0] >= 0).astype(np.int64)
            | ((d[:, 1] >= 0).astype(np.int64) << 1)
            | ((d[:, 2] >= 0).astype(np.int64) << 2)
        )
        dq = np.clip(((d * 0.5 + 0.5) * 3.999).astype(np.int64), 0, 3)
        dmorton = dq[:, 0] | (dq[:, 1] << 2) | (dq[:, 2] << 4)
        return (octant << 21) | (dmorton << 15) | morton

    sorted_rays = {}
    for name, o, d in (("primary", po, pd), ("bounce", bo, bd)):
        perm = np.argsort(sort_key(o[:n_rays], d[:n_rays]), kind="stable")
        sorted_rays[name] = (o[:n_rays][perm], d[:n_rays][perm])

    for name, o, d in (
        ("primary", po, pd),
        ("bounce", bo, bd),
        ("primary-sorted", *sorted_rays["primary"]),
        ("bounce-sorted", *sorted_rays["bounce"]),
    ):
        o = o[:n_rays].astype(np.float32)
        d = d[:n_rays].astype(np.float32)
        base = None
        for group, tile_oct in ((2048, False), (512, True), (256, True),
                                (128, True), (128, False)):
            ngt = 16 if name == "bounce" else 16  # parent tiles to sample
            max_groups = ngt * max(2048 // group, 1)
            t0 = time.time()
            ti, tl, ng, iters = walk_visits(flat_oct, o, d, group,
                                            max_groups,
                                            tile_octant=tile_oct)
            tiles = ng * group / 2048
            iters_per_tile = iters / tiles
            if base is None:
                base = iters_per_tile
            print(
                f"  {name:8s} G={group:5d}{'T' if tile_oct else ' '}: "
                f"visits/group={(ti + tl) / ng:8.1f} "
                f"(int {ti / ng:7.1f} leaf {tl / ng:7.1f}) "
                f"ITERS/2048-tile={iters_per_tile:8.1f} "
                f"vs G=2048: {base / iters_per_tile:5.2f}x "
                f"[{time.time() - t0:.1f}s]"
            )


if __name__ == "__main__":
    main()
