"""Fat-leaf BVH (MXU drain tree, accel/fat.py) tests.

Covers the host build (leaf coefficient slabs vs scalar Moller-Trumbore),
the XLA fallback walkers vs brute force, and the Pallas kernels in
interpret mode vs the fallback. On-hardware Mosaic behavior is checked
by tools/check_tpu.py (CPU tests never run Mosaic).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from glaze_tpu.accel import build_bvh_fat, closest_hit_fat, any_hit_fat
from glaze_tpu.accel.fat import F, FatBVH, leaf_matrices

from tests.test_bvh import _brute_force, _random_soup


def test_leaf_matrices_match_scalar_mt():
    """The (16, 4T) coefficient slab maps ray features to exactly
    (det, u*det, v*det, t*det) of scalar Moller-Trumbore."""
    t = 8
    tri, rng = _random_soup(t, seed=7)
    v0 = tri[:, 0]
    e1 = tri[:, 1] - v0
    e2 = tri[:, 2] - v0
    rows = np.concatenate([v0, e1, e2], axis=1).astype(np.float32)
    m = leaf_matrices(rows, t).reshape(1, F, 4 * t)[0]

    o = rng.uniform(-5, 5, (32, 3)).astype(np.float64)
    d = rng.normal(size=(32, 3))
    feat = np.zeros((32, F))
    feat[:, 0:3] = np.cross(o, d)
    feat[:, 3:6] = o
    feat[:, 6:9] = d
    feat[:, 9] = 1.0
    out = feat @ m.astype(np.float64)  # (32, 4t)

    for i in range(t):
        p = np.cross(d, e2[i].astype(np.float64))
        det = (e1[i] * p).sum(1)
        tv = o - v0[i]
        ud = (tv * p).sum(1) * det
        q = np.cross(tv, e1[i].astype(np.float64))
        vd = (d * q).sum(1) * det
        td = (e2[i] * q).sum(1) * det
        # slab products equal det-scaled barycentrics (both x det)
        np.testing.assert_allclose(out[:, 0 * t + i], det, rtol=2e-4,
                                   atol=1e-4)
        np.testing.assert_allclose(out[:, 1 * t + i] * det, ud, rtol=2e-4,
                                   atol=1e-3)
        np.testing.assert_allclose(out[:, 2 * t + i] * det, vd, rtol=2e-4,
                                   atol=1e-3)
        np.testing.assert_allclose(out[:, 3 * t + i] * det, td, rtol=2e-4,
                                   atol=1e-3)


def test_fat_closest_matches_brute_force():
    tri, rng = _random_soup(300, seed=11)
    o = rng.uniform(-15, 15, (256, 3)).astype(np.float32)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    bvh, order = build_bvh_fat(tri, leaf_size=16)
    assert isinstance(bvh, FatBVH) and bvh.leaf_size == 16
    res = closest_hit_fat(bvh, jnp.asarray(o), jnp.asarray(d))
    t = np.asarray(res["t"])
    tri_id = np.asarray(res["tri"])
    bt, btri = _brute_force(tri, o, d)
    hit = bt != np.inf
    assert ((bt == np.inf) == (t == np.inf)).all()
    np.testing.assert_allclose(t[hit], bt[hit], rtol=1e-4, atol=1e-5)
    mapped = np.where(tri_id >= 0, order[np.clip(tri_id, 0, len(order) - 1)],
                      -1)
    assert (mapped[hit] == btri[hit]).all()


def test_fat_any_hit_matches_brute_force():
    tri, rng = _random_soup(300, seed=12)
    o = rng.uniform(-15, 15, (256, 3)).astype(np.float32)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    bvh, _ = build_bvh_fat(tri, leaf_size=16)
    bt, _ = _brute_force(tri, o, d, t_min=1e-3)
    hit = np.asarray(any_hit_fat(bvh, jnp.asarray(o), jnp.asarray(d),
                                 jnp.full(256, 1e30, np.float32)))
    assert (hit == (bt != np.inf)).all()
    near = np.where(np.isinf(bt), 1.0, bt * 0.5).astype(np.float32)
    hit_near = np.asarray(any_hit_fat(bvh, jnp.asarray(o), jnp.asarray(d),
                                      jnp.asarray(near)))
    assert not hit_near.any()
    act = jnp.asarray(np.arange(256) % 2 == 0)
    hit_m = np.asarray(any_hit_fat(bvh, jnp.asarray(o), jnp.asarray(d),
                                   jnp.full(256, 1e30, np.float32),
                                   active=act))
    assert not hit_m[1::2].any()


def test_fat_empty_scene():
    bvh, order = build_bvh_fat(np.zeros((0, 3, 3), np.float32))
    res = closest_hit_fat(bvh, jnp.zeros((4, 3)),
                          jnp.asarray([[0, 0, 1.0]] * 4))
    assert (np.asarray(res["tri"]) == -1).all()
    assert order.shape == (0,)


def test_fat_pallas_interpret_matches_fallback():
    """The MXU drain kernels (interpret mode) agree with the XLA walker.
    leaf_size=32 keeps the slab lane dim at 128 (4T) while forcing many
    leaves and multi-drain rounds on a 600-tri soup."""
    from glaze_tpu.accel.traverse_fat import (any_hit_fat_pallas,
                                              closest_hit_fat_pallas)

    tri, rng = _random_soup(600, seed=13)
    o = rng.uniform(-15, 15, (300, 3)).astype(np.float32)
    d = rng.normal(size=(300, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    bvh, _ = build_bvh_fat(tri, leaf_size=32)

    ref = closest_hit_fat(bvh, jnp.asarray(o), jnp.asarray(d))
    got = closest_hit_fat_pallas(bvh, jnp.asarray(o), jnp.asarray(d),
                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(ref["tri"]),
                                  np.asarray(got["tri"]))
    hit = np.asarray(ref["tri"]) >= 0
    np.testing.assert_allclose(np.asarray(got["t"])[hit],
                               np.asarray(ref["t"])[hit],
                               rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got["u"])[hit],
                               np.asarray(ref["u"])[hit],
                               rtol=1e-3, atol=1e-3)

    t_max = np.full(300, 12.0, np.float32)
    act = np.arange(300) % 3 != 0
    ref_a = np.asarray(any_hit_fat(bvh, jnp.asarray(o), jnp.asarray(d),
                                   jnp.asarray(t_max),
                                   active=jnp.asarray(act)))
    got_a = np.asarray(any_hit_fat_pallas(bvh, jnp.asarray(o),
                                          jnp.asarray(d),
                                          jnp.asarray(t_max),
                                          active=jnp.asarray(act),
                                          interpret=True))
    np.testing.assert_array_equal(ref_a, got_a)


def test_fat_scene_renders_like_classic():
    """A scene flattened onto the fat tree accumulates the same radiance
    as the classic tree (GLAZE_FATLEAF switch, scene/flatten.py)."""
    import os

    import __graft_entry__ as graft
    from glaze_tpu.render import integrator as integ

    scene, camera = graft._tiny_scene(16, 16)
    os.environ["GLAZE_FATLEAF"] = "1"
    try:
        scene_f, camera_f = graft._tiny_scene(16, 16)
    finally:
        del os.environ["GLAZE_FATLEAF"]
    assert isinstance(scene_f.bvh, FatBVH)

    c2w, s2c = integ.camera_matrices(camera, 16, 16)
    seeds = jnp.asarray(np.asarray([3, 5], np.uint32))
    offsets = jnp.asarray(np.full((2, 2), 0.5, np.float32))
    kw = dict(width=16, height=16, is_persp=True, direct_only=False, steps=2)
    a = integ.render_steps(scene, integ.init_state(16, 16), seeds, offsets,
                           jnp.asarray(c2w), jnp.asarray(s2c), **kw)
    b = integ.render_steps(scene_f, integ.init_state(16, 16), seeds, offsets,
                           jnp.asarray(c2w), jnp.asarray(s2c), **kw)
    for i in range(3):
        np.testing.assert_allclose(np.asarray(a.accum[i]),
                                   np.asarray(b.accum[i]),
                                   rtol=1e-4, atol=1e-4)


def test_hybrid_scene_renders_like_classic():
    """GLAZE_TREE=hybrid builds a fat closest tree + a classic any-hit
    tree (accel.build_bvh_auto) and accumulates the same radiance."""
    import os

    import __graft_entry__ as graft
    from glaze_tpu.render import integrator as integ

    scene, camera = graft._tiny_scene(16, 16)
    assert scene.bvh_any is None  # CPU default is classic-only
    os.environ["GLAZE_TREE"] = "hybrid"
    try:
        scene_h, camera_h = graft._tiny_scene(16, 16)
    finally:
        del os.environ["GLAZE_TREE"]
    assert isinstance(scene_h.bvh, FatBVH)
    assert scene_h.bvh_any is not None
    assert not isinstance(scene_h.bvh_any, FatBVH)

    c2w, s2c = integ.camera_matrices(camera, 16, 16)
    seeds = jnp.asarray(np.asarray([3, 5], np.uint32))
    offsets = jnp.asarray(np.full((2, 2), 0.5, np.float32))
    kw = dict(width=16, height=16, is_persp=True, direct_only=False, steps=2)
    a = integ.render_steps(scene, integ.init_state(16, 16), seeds, offsets,
                           jnp.asarray(c2w), jnp.asarray(s2c), **kw)
    b = integ.render_steps(scene_h, integ.init_state(16, 16), seeds, offsets,
                           jnp.asarray(c2w), jnp.asarray(s2c), **kw)
    for i in range(3):
        np.testing.assert_allclose(np.asarray(a.accum[i]),
                                   np.asarray(b.accum[i]),
                                   rtol=1e-4, atol=1e-4)
