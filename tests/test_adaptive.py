"""Adaptive sample allocation (integrator.tile_error/adaptive_lane_mask,
renderer.draw lane parking).

The reference refines uniformly (WorkScheduler, raytracer.rs:1161-1206);
the adaptive sampler parks display-converged tiles so wall time
concentrates on the ones still carrying noise. Correctness contract:
per-pixel estimates are the reference's ratio estimator over that
pixel's OWN launches — parking happens only at path boundaries, so the
accumulation holds whole-path contributions with matching counts.
"""

import numpy as np
import jax
import pytest

from glaze_tpu.render import integrator as integ
from glaze_tpu.render.renderer import Integrator, RayTraceRenderer


def _sky_heavy_scene():
    """Camera framing mostly sky with a floor strip at the bottom: the
    sky tiles converge almost immediately (miss radiance varies only
    with sub-pixel jitter), the floor tiles keep MC noise."""
    from tools.make_sponza import _sky_tex
    from glaze_tpu.core import (Camera, Light, LightType, Material,
                                MaterialType, Mesh, MeshInstance,
                                PerspectiveCam, Texture, TextureFormat,
                                TextureInfo, Transform, Vertex)
    from glaze_tpu.parser import Meta

    class S:
        def vertices(self):
            vs = []
            for p, uv in (([-8, 0, -8], [0, 0]), ([8, 0, -8], [1, 0]),
                          ([8, 0, 4], [1, 1]), ([-8, 0, 4], [0, 1])):
                vs.append(Vertex(np.asarray(p, np.float32),
                                 np.asarray([0, 1, 0], np.float32),
                                 np.asarray(uv, np.float32)))
            return vs

        def meshes(self):
            return [Mesh(0, [0, 1, 2, 0, 2, 3], 0)]

        def transforms(self):
            return [Transform.identity()]

        def instances(self):
            return [MeshInstance(0, 0)]

        def cameras(self):
            return [Camera.Perspective(PerspectiveCam(
                position=[0, 1.0, 3.0], target=[0, 2.5, -6.0],
                up=[0, 1, 0]))]

        def textures(self):
            return [Texture.default(),
                    Texture(TextureInfo("sky", 256, 128,
                                        TextureFormat.RgbaSrgb),
                            [_sky_tex()])]

        def materials(self):
            return [Material(name="floor", mtype=MaterialType.UBER,
                             roughness_mul=0.4)]

        def lights(self):
            return [
                Light(ltype=LightType.SKY, name="sky", resource_id=1,
                      intensity=1.0),
                Light(ltype=LightType.OMNI, name="key",
                      position=np.asarray([0, 4, 0], np.float32),
                      intensity=8.0),
            ]

        def meta(self):
            return Meta(scene_centre=[0, 1, 0], scene_radius=10.0,
                        exposure=1.0)

    return S()


def test_adaptive_parks_converged_tiles_and_keeps_estimates():
    """Sky tiles park once past min_count with near-zero variance; floor
    tiles keep sampling. Per-pixel estimates match a uniform render
    within MC noise."""
    # 128x64 -> padded 128x64 = 4 packet tiles, swizzle-ordered top to
    # bottom: tile 0/1 are the upper (sky) half, 2/3 the floor half
    r = RayTraceRenderer(_sky_heavy_scene(), width=128, height=64, seed=3,
                         adaptive=True)
    r.adaptive_min = 32.0
    r.draw(32)  # 192 launches; mask refreshes every 32-launch chunk
    cnt = np.asarray(jax.device_get(r._state.count))
    blk = integ.TILE_W * integ.TILE_H
    per_tile = cnt.reshape(-1, blk).max(axis=1)
    err = np.asarray(jax.device_get(integ.tile_error(r._state)))
    assert per_tile.min() < 192, (per_tile, err)  # something parked
    assert per_tile.max() == 192  # something kept sampling
    parked = per_tile < 192
    assert err[parked].max() <= r.adaptive_tau

    # pixel estimates agree with a uniform render within MC noise
    r0 = RayTraceRenderer(_sky_heavy_scene(), width=128, height=64,
                          seed=4, adaptive=False)
    img0 = r0.draw(32).astype(float)
    img = r.get_image().astype(float)
    assert np.abs(img - img0).mean() < 6.0
    # the parked (sky) tiles specifically must still display correctly
    assert np.abs(img[:32] - img0[:32]).mean() < 3.0


def test_adaptive_respects_min_count():
    """No tile may park before min_count launches, however converged."""
    r = RayTraceRenderer(_sky_heavy_scene(), width=128, height=64, seed=5,
                         adaptive=True)  # default min 64
    r.draw(8)  # 48 launches < 64
    cnt = np.asarray(jax.device_get(r._state.count))
    assert cnt.min() == 48 and cnt.max() == 48


def test_adaptive_off_matches_reference_counts():
    r = RayTraceRenderer(_sky_heavy_scene(), width=32, height=16, seed=5,
                         adaptive=False)
    r.draw(4)
    cnt = np.asarray(jax.device_get(r._state.count))
    assert (cnt == 24).all()


def test_lane_active_gating_unit():
    """launch_step with a lane mask: parked lanes add neither count nor
    radiance; active lanes are BIT-IDENTICAL to an unmasked launch."""
    import jax.numpy as jnp
    import __graft_entry__ as graft

    scene, camera = graft._tiny_scene(16, 16)
    c2w, s2c = integ.camera_matrices(camera, 16, 16)
    p = integ.pixel_count(16, 16)
    px, py = integ.pixel_coords(16, 16)
    size = jnp.asarray([16, 16], jnp.float32)
    st0 = integ.init_state(16, 16)
    kw = dict(is_persp=True, direct_only=False)

    full = integ.launch_step(scene, st0, jnp.uint32(7),
                             jnp.asarray([0.5, 0.5], jnp.float32),
                             jnp.asarray(c2w), jnp.asarray(s2c), px, py,
                             size, **kw)
    mask = jnp.arange(p) % 2 == 0
    half = integ.launch_step(scene, st0, jnp.uint32(7),
                             jnp.asarray([0.5, 0.5], jnp.float32),
                             jnp.asarray(c2w), jnp.asarray(s2c), px, py,
                             size, lane_active=mask, **kw)
    m = np.asarray(mask)
    assert (np.asarray(half.count)[~m] == 0).all()
    assert (np.asarray(half.count)[m] == 1).all()
    for c_full, c_half in zip(full.accum, half.accum):
        np.testing.assert_array_equal(np.asarray(c_half)[m],
                                      np.asarray(c_full)[m])
        assert (np.asarray(c_half)[~m] == 0).all()
    np.testing.assert_array_equal(np.asarray(half.sq)[~m], 0.0)
    assert (np.asarray(half.path_no)[~m] == 0).all()
    assert (np.asarray(half.path_no)[m] == 1).all()


def test_adaptive_sharded_matches_unsharded():
    """Adaptive parking under the pixel mesh: identical tile decisions
    and bit-identical accumulation vs the unsharded adaptive draw."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from glaze_tpu.parallel import make_mesh

    mesh = make_mesh(jax.devices()[:8])

    def run(use_mesh):
        r = RayTraceRenderer(_sky_heavy_scene(), width=128, height=64,
                             seed=3, adaptive=True,
                             mesh=mesh if use_mesh else None)
        r.adaptive_min = 32.0
        r.draw(32)
        return (np.asarray(jax.device_get(r._state.count)),
                r.get_image())

    cnt_flat, img_flat = run(False)
    cnt_mesh, img_mesh = run(True)
    np.testing.assert_array_equal(cnt_mesh, cnt_flat)
    np.testing.assert_array_equal(img_mesh, img_flat)
    assert cnt_flat.min() < cnt_flat.max()  # parking actually happened
