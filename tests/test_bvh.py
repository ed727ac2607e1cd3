"""BVH build + traversal tests vs brute force, both builders."""

import jax.numpy as jnp
import numpy as np
import pytest

from glaze_tpu.accel import build_bvh, closest_hit, any_hit
from glaze_tpu.accel import bvh as bvh_mod


def _random_soup(n, seed=42):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-10, 10, (n, 1, 3)).astype(np.float32)
    return (c + rng.uniform(-0.5, 0.5, (n, 3, 3))).astype(np.float32), rng


def _brute_force(tri, o, d, t_min=1e-4):
    v0 = tri[:, 0]
    e1 = tri[:, 1] - v0
    e2 = tri[:, 2] - v0
    best = np.full(len(o), np.inf)
    btri = np.full(len(o), -1)
    for i in range(len(tri)):
        p = np.cross(d, e2[i])
        det = (e1[i] * p).sum(1)
        mask = np.abs(det) >= 1e-12
        inv = np.where(mask, 1.0 / np.where(det == 0, 1, det), 0)
        tv = o - v0[i]
        u = (tv * p).sum(1) * inv
        q = np.cross(tv, e1[i])
        v = (d * q).sum(1) * inv
        t = (e2[i] * q).sum(1) * inv
        hit = mask & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > t_min) & (t < best)
        best = np.where(hit, t, best)
        btri = np.where(hit, i, btri)
    return best, btri


@pytest.mark.parametrize("native", [True, False])
def test_closest_hit_matches_brute_force(native):
    tri, rng = _random_soup(300)
    o = rng.uniform(-15, 15, (256, 3)).astype(np.float32)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    import glaze_tpu.native as N

    saved = N.lib
    if not native:
        N.lib = None
    try:
        bvh, order = build_bvh(tri)
    finally:
        N.lib = saved

    res = closest_hit(bvh, jnp.asarray(o), jnp.asarray(d))
    t = np.asarray(res["t"])
    tri_id = np.asarray(res["tri"])
    bt, btri = _brute_force(tri, o, d)
    hit = bt != np.inf
    assert ((bt == np.inf) == (t == np.inf)).all()
    np.testing.assert_allclose(t[hit], bt[hit], rtol=1e-4, atol=1e-5)
    mapped = np.where(tri_id >= 0, order[np.clip(tri_id, 0, len(tri) - 1)], -1)
    assert (mapped[hit] == btri[hit]).all()


def test_any_hit_early_exit_and_range():
    tri, rng = _random_soup(300, seed=1)
    o = rng.uniform(-15, 15, (256, 3)).astype(np.float32)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    bvh, _ = build_bvh(tri)
    bt, _ = _brute_force(tri, o, d, t_min=1e-3)
    hit_inf = np.asarray(any_hit(bvh, jnp.asarray(o), jnp.asarray(d),
                                 jnp.full(256, 1e30, np.float32)))
    assert (hit_inf == (bt != np.inf)).all()
    # restricting t_max below the closest hit yields a miss
    near = np.where(np.isinf(bt), 1.0, bt * 0.5).astype(np.float32)
    hit_near = np.asarray(any_hit(bvh, jnp.asarray(o), jnp.asarray(d),
                                  jnp.asarray(near)))
    assert not hit_near.any()


def test_any_hit_active_mask():
    tri, rng = _random_soup(100, seed=2)
    o = np.zeros((8, 3), np.float32)
    d = np.tile(np.asarray([[1.0, 0, 0]], np.float32), (8, 1))
    bvh, _ = build_bvh(tri)
    active = jnp.asarray([True, False] * 4)
    res = np.asarray(any_hit(bvh, jnp.asarray(o), jnp.asarray(d),
                             jnp.full(8, 1e30, np.float32), active=active))
    assert not res[1::2].any()


def test_empty_scene():
    bvh, order = build_bvh(np.zeros((0, 3, 3), np.float32))
    res = closest_hit(bvh, jnp.zeros((4, 3)), jnp.asarray([[0, 0, 1.0]] * 4))
    assert (np.asarray(res["tri"]) == -1).all()


def test_single_triangle():
    tri = np.asarray([[[0, 0, 5], [1, 0, 5], [0, 1, 5]]], np.float32)
    bvh, _ = build_bvh(tri)
    res = closest_hit(
        bvh,
        jnp.asarray([[0.2, 0.2, 0.0], [5.0, 5.0, 0.0]]),
        jnp.asarray([[0.0, 0.0, 1.0]] * 2),
    )
    t = np.asarray(res["t"])
    assert abs(t[0] - 5.0) < 1e-4 and np.isinf(t[1])


@pytest.mark.parametrize("native", [True, False])
def test_identical_centroids_never_oversize_leaves(native):
    """Duplicated geometry (> leaf_size tris with one centroid) must split
    by index, not emit an oversized leaf: an oversized leaf overflows the
    3-bit count field and misaligns every later padded leaf range."""
    one = np.asarray([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
    tri = np.concatenate([np.repeat(one, 20, axis=0),
                          _random_soup(50)[0]], axis=0)

    import glaze_tpu.native as N

    saved = N.lib
    if not native:
        N.lib = None
    try:
        flat = bvh_mod.build_host(tri)
        assert flat["count"].max() <= bvh_mod.LEAF_SIZE
        oct_tables = bvh_mod.build_host_octants(tri)
        assert oct_tables["count"].max() <= bvh_mod.LEAF_SIZE
        # padded order is exactly n_leaves * leaf_size long
        n_leaves = int((oct_tables["first"][0] >= 0).sum())
        assert oct_tables["tri_order"].shape[0] == n_leaves * bvh_mod.LEAF_SIZE
        bvh, order = build_bvh(tri)
    finally:
        N.lib = saved

    o = np.asarray([[0.25, 0.25, 5.0], [5, 5, 5]], np.float32)
    d = np.asarray([[0, 0, -1.0], [1, 0, 0]], np.float32)
    res = closest_hit(bvh, jnp.asarray(o), jnp.asarray(d))
    bt, _ = _brute_force(tri, o, d)
    t = np.asarray(res["t"])
    hit = bt != np.inf
    assert ((bt == np.inf) == (t == np.inf)).all()
    np.testing.assert_allclose(t[hit], bt[hit], rtol=1e-4, atol=1e-5)


def test_chunked_bvh_matches_single():
    """ChunkedBVH (beyond-VMEM scenes) traces identically to one BVH."""
    from glaze_tpu.accel import (
        ChunkedBVH,
        any_hit_auto,
        build_bvh_chunked,
        closest_hit_auto,
    )

    tri, rng = _random_soup(3000, seed=5)
    o = rng.uniform(-15, 15, (512, 3)).astype(np.float32)
    d = rng.normal(size=(512, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    single, s_order = build_bvh_chunked(tri, max_tris=10_000)
    chunked, c_order = build_bvh_chunked(tri, max_tris=700)
    assert isinstance(chunked, ChunkedBVH) and len(chunked.chunks) >= 4
    assert chunked.n_tris == 3000
    # every chunk's padded rows line up with its offset
    total = 0
    for c, off in zip(chunked.chunks, chunked.offsets):
        assert off == total
        total += c.tri.shape[0]
    assert c_order.shape[0] == total

    hs = closest_hit_auto(single, jnp.asarray(o), jnp.asarray(d))
    hc = closest_hit_auto(chunked, jnp.asarray(o), jnp.asarray(d))
    ts, tc = np.asarray(hs["t"]), np.asarray(hc["t"])
    np.testing.assert_allclose(
        np.where(np.isinf(ts), 1e30, ts),
        np.where(np.isinf(tc), 1e30, tc), rtol=1e-4, atol=1e-5)
    # global tri ids map through each order to the same source triangle
    hit = np.asarray(hs["tri"]) >= 0
    src_s = s_order[np.asarray(hs["tri"])[hit]]
    src_c = c_order[np.asarray(hc["tri"])[hit]]
    assert (src_s == src_c).all()

    # any-hit: chunked == single
    t_max = np.full(512, 8.0, np.float32)
    a_s = np.asarray(any_hit_auto(single, jnp.asarray(o), jnp.asarray(d),
                                  jnp.asarray(t_max)))
    a_c = np.asarray(any_hit_auto(chunked, jnp.asarray(o), jnp.asarray(d),
                                  jnp.asarray(t_max)))
    np.testing.assert_array_equal(a_s, a_c)

    # active mask respected
    act = np.zeros(512, bool)
    a_m = np.asarray(any_hit_auto(chunked, jnp.asarray(o), jnp.asarray(d),
                                  jnp.asarray(t_max), active=jnp.asarray(act)))
    assert not a_m.any()


def test_chunked_scene_renders_like_unchunked():
    """A scene flattened with a chunked BVH accumulates the same radiance."""
    from glaze_tpu.accel import bvh as bvh_mod2
    import glaze_tpu.accel.bvh as B
    import __graft_entry__ as graft
    from glaze_tpu.render import integrator as integ
    import jax

    scene, camera = graft._tiny_scene(16, 16)

    saved = B.CHUNK_MAX_TRIS
    try:
        B.CHUNK_MAX_TRIS = 2  # force chunking of the 6-tri scene
        scene_c, camera_c = graft._tiny_scene(16, 16)
    finally:
        B.CHUNK_MAX_TRIS = saved
    from glaze_tpu.accel import ChunkedBVH

    assert isinstance(scene_c.bvh, ChunkedBVH)

    c2w, s2c = integ.camera_matrices(camera, 16, 16)
    seeds = jnp.asarray(np.asarray([3, 5], np.uint32))
    offsets = jnp.asarray(np.full((2, 2), 0.5, np.float32))
    kw = dict(width=16, height=16, is_persp=True, direct_only=False, steps=2)
    a = integ.render_steps(scene, integ.init_state(16, 16), seeds, offsets,
                           jnp.asarray(c2w), jnp.asarray(s2c), **kw)
    b = integ.render_steps(scene_c, integ.init_state(16, 16), seeds, offsets,
                           jnp.asarray(c2w), jnp.asarray(s2c), **kw)
    for i in range(3):
        np.testing.assert_allclose(np.asarray(a.accum[i]),
                                   np.asarray(b.accum[i]),
                                   rtol=1e-4, atol=1e-5)


def test_disk_cache_round_trip_bit_exact(tmp_path, monkeypatch):
    """A cache-hit build must reproduce the direct build bit-for-bit
    (nodes0 is reconstructed from the octant slab on load)."""
    monkeypatch.setenv("GLAZE_CACHE_DIR", str(tmp_path))
    monkeypatch.setattr(bvh_mod, "CACHE_MIN_TRIS", 0)
    tri, _ = _random_soup(777, seed=9)

    direct, order_a = build_bvh(tri)  # cold: builds + stores
    assert len(list(tmp_path.glob("bvh/*.npz"))) == 1
    hit, order_b = build_bvh(tri)  # warm: loads

    np.testing.assert_array_equal(np.asarray(order_a), np.asarray(order_b))
    for field in ("nodes", "tri", "nodes16", "tri8"):
        np.testing.assert_array_equal(
            np.asarray(getattr(direct, field)),
            np.asarray(getattr(hit, field)), err_msg=field)
    assert (direct.n_nodes, direct.n_tris) == (hit.n_nodes, hit.n_tris)

    # different soup -> different key, no false hit
    tri2, _ = _random_soup(777, seed=10)
    fresh, _ = build_bvh(tri2)
    assert len(list(tmp_path.glob("bvh/*.npz"))) == 2
    assert not np.array_equal(np.asarray(fresh.nodes),
                              np.asarray(direct.nodes))


def test_disk_cache_disabled_by_env(tmp_path, monkeypatch):
    # Point every path a regressed _cache_dir could write to (relative
    # cwd, $HOME/.cache) inside tmp_path, so a broken disable check
    # produces a visible .npz here instead of passing vacuously.
    monkeypatch.setenv("GLAZE_CACHE_DIR", "0")
    monkeypatch.setenv("HOME", str(tmp_path))
    monkeypatch.chdir(tmp_path)
    tri, _ = _random_soup(64, seed=3)
    build_bvh(tri)
    assert list(tmp_path.glob("**/*.npz")) == []

    # and the same env on a fresh soup stays byte-identical to a direct
    # build (disable = no behavior change)
    direct, order = build_bvh(tri)
    assert list(tmp_path.glob("**/*.npz")) == []
