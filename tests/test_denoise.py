"""Display-only SVGF-style denoiser (render/denoise.py).

The reference ships no denoiser (its preview visibly flickers at low
spp); ours is a TPU-friendly extra: edge-aware à-trous reconstruction
on the displayed frame only, provably fading to identity as the
unbiased accumulation converges.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from glaze_tpu.render import denoise as dn
from glaze_tpu.render import integrator as integ


def _flat_setup(width=64, height=32, base=0.5, noise=0.25, seed=0):
    """Synthetic accumulation: flat radiance + per-lane MC noise over a
    trivial G-buffer (constant normal/depth/albedo — every neighbour is
    a valid filter partner)."""
    inv_map, pw, ph = dn.lane_to_image(width, height)
    n = pw * ph
    rng = np.random.default_rng(seed)
    noise_rgb = rng.normal(0.0, noise, size=(3, n)).astype(np.float32)
    ones = jnp.ones((n,), jnp.float32)
    zeros = jnp.zeros((n,), jnp.float32)
    gb = {
        "normal": (zeros, zeros, ones),
        "depth": ones,
        "albedo": (ones, ones, ones),
    }
    return inv_map, pw, ph, n, noise_rgb, gb


def _display(vals_rgb, count_val, n, gb, inv_map, pw, ph):
    count = jnp.full((n,), np.float32(count_val))
    accum = tuple(jnp.maximum(jnp.asarray(v), 0.0) * count_val
                  for v in vals_rgb)
    img = dn.denoised_display(accum, count, gb, inv_map,
                              jnp.float32(1.0), pw=pw, ph=ph)
    return np.asarray(img).astype(np.float64)


def test_low_spp_noise_shrinks():
    """At 1 spp the filter recovers the flat truth much better than the
    raw accumulation does."""
    inv_map, pw, ph, n, noise_rgb, gb = _flat_setup()
    base = 0.5
    vals = base + noise_rgb
    from glaze_tpu.ops import texture as tx

    truth = float(np.round(
        np.asarray(tx.linear_to_srgb(jnp.float32(base))) * 255.0))
    dn_img = _display(vals, integ.PT_STEPS, n, gb, inv_map, pw, ph)
    raw = _display(vals, 1e7, n, gb, inv_map, pw, ph)  # fade ~0: identity
    mse_dn = ((dn_img - truth) ** 2).mean()
    mse_raw = ((raw - truth) ** 2).mean()
    assert mse_dn < mse_raw / 4.0, (mse_dn, mse_raw)


def test_fades_to_identity_when_converged():
    """With a large sample count the displayed frame matches the raw
    sRGB conversion to within a couple of u8 steps, even though the
    image still contains 'structure' the sigma could mis-price."""
    inv_map, pw, ph, n, noise_rgb, gb = _flat_setup(noise=0.0)
    # real structure: a sharp step + gradient, no noise
    px, py = integ.pixel_coords_np(64, 32)
    step = (px > 30).astype(np.float32) * 0.6 + 0.15
    grad = py.astype(np.float32) / 64.0
    vals = np.stack([step, grad, step * grad])
    big = integ.PT_STEPS * 4096.0
    out = _display(vals, big, n, gb, inv_map, pw, ph)
    raw = _display(vals, 1e9, n, gb, inv_map, pw, ph)
    assert np.abs(out - raw).max() <= 2.0


def test_normal_and_depth_edges_survive_full_strength():
    """At 1 spp (full filter strength) a radiance edge that coincides
    with a G-buffer edge is preserved: the two sides never mix."""
    width, height = 64, 32
    inv_map, pw, ph = dn.lane_to_image(width, height)
    n = pw * ph
    px, py = integ.pixel_coords_np(width, height)
    left = px < 32
    nx = jnp.asarray(np.where(left, 1.0, 0.0).astype(np.float32))
    nz = jnp.asarray(np.where(left, 0.0, 1.0).astype(np.float32))
    depth = jnp.asarray(np.where(left, 1.0, 3.0).astype(np.float32))
    ones = jnp.ones((n,), jnp.float32)
    gb = {"normal": (nx, jnp.zeros((n,), jnp.float32), nz),
          "depth": depth, "albedo": (ones, ones, ones)}
    vals = np.stack([np.where(left, 0.9, 0.1).astype(np.float32)] * 3)
    out = _display(vals, integ.PT_STEPS, n, gb, inv_map, pw, ph)
    img_left = out[:height, :30]
    img_right = out[:height, 34:width]
    from glaze_tpu.ops import texture as tx

    t_l = float(np.asarray(tx.linear_to_srgb(jnp.float32(0.9)))) * 255.0
    t_r = float(np.asarray(tx.linear_to_srgb(jnp.float32(0.1)))) * 255.0
    assert np.abs(img_left - t_l).max() <= 2.0
    assert np.abs(img_right - t_r).max() <= 2.0


def test_renderer_denoise_toggle_end_to_end():
    """RayTraceRenderer.denoise routes draw_frame + get_image through
    the denoiser: right shapes, and toggling it never touches the
    accumulation state."""
    from golden_scenes import GOLDEN_H, GOLDEN_W, MatRowScene
    from glaze_tpu.render.renderer import Integrator, RayTraceRenderer

    r = RayTraceRenderer(MatRowScene(), width=GOLDEN_W, height=GOLDEN_H,
                         integrator=Integrator.PATH_TRACE, seed=11)
    r.denoise = True
    img = r.draw_frame(return_image=True)
    pw, ph = integ.padded_dims(GOLDEN_W, GOLDEN_H)
    assert np.asarray(img).shape == (ph, pw, 3)
    before = [np.asarray(c).copy() for c in r._state.accum]
    shown = r.get_image()
    assert shown.shape == (GOLDEN_H, GOLDEN_W, 3)
    assert shown.dtype == np.uint8
    for b, c in zip(before, r._state.accum):
        np.testing.assert_array_equal(b, np.asarray(c))
    r.denoise = False
    raw = r.get_image()
    assert raw.shape == shown.shape
    # the filtered frame differs from raw at 1-ish spp (it is doing work)
    assert (shown != raw).any()


def test_denoise_on_sharded_renderer():
    """The display filter runs on a mesh-sharded accumulation too (the
    `glaze-cli --mesh --denoise` path): sharded state in, same denoised
    frame out as the unsharded renderer (sharded==unsharded is already
    bit-exact, so the filtered displays must match too)."""
    from golden_scenes import GOLDEN_H, GOLDEN_W, MatRowScene
    from glaze_tpu.render.renderer import Integrator, RayTraceRenderer

    kw = dict(width=GOLDEN_W, height=GOLDEN_H,
              integrator=Integrator.PATH_TRACE, seed=3)
    rs = RayTraceRenderer(MatRowScene(), mesh="auto", **kw)
    rs.denoise = True
    rs.draw(1)
    img_s = rs.get_image()
    assert img_s.shape == (GOLDEN_H, GOLDEN_W, 3)
    ru = RayTraceRenderer(MatRowScene(), **kw)
    ru.denoise = True
    ru.draw(1)
    np.testing.assert_array_equal(img_s, ru.get_image())


# ---------------------------------------------------------------------------
# temporal reprojection (denoised_display_temporal)


def _temporal_setup(width=64, height=32, depth=5.0):
    """Synthetic temporal scene: a camera-facing wall ``depth`` units
    along every primary ray, so the G-buffer world positions are
    geometrically consistent with the camera used for reprojection."""
    from glaze_tpu.core.camera import Camera, PerspectiveCam

    cam = Camera.Perspective(PerspectiveCam(
        position=[0.0, 0.0, 0.0], target=[0.0, 0.0, -1.0], up=[0, 1, 0]))
    inv_map, pw, ph = dn.lane_to_image(width, height)
    n = pw * ph
    c2w, s2c = integ.camera_matrices(cam, width, height)
    px, py = integ.pixel_coords(width, height)
    ndc_x = -1.0 + 2.0 * (px + 0.5) / width
    ndc_y = -1.0 + 2.0 * (py + 0.5) / height
    o, d = integ.camera_rays(ndc_x, ndc_y, jnp.asarray(c2w),
                             jnp.asarray(s2c), True)
    ones = jnp.ones((n,), jnp.float32)
    t = jnp.float32(depth) * ones
    gb = {
        "normal": tuple(-c for c in d),  # wall faces the camera
        "depth": t,
        "albedo": (ones, ones, ones),
        "wpos": tuple(oc + t * dc for oc, dc in zip(o, d)),
    }
    return cam, gb, inv_map, pw, ph, n


def _hist_from_gb(gb, inv_map, pw, ph, rgb_val, h_val):
    def plane(v):
        return np.asarray(v)[np.asarray(inv_map)].reshape(ph, pw)

    v = jnp.full((ph, pw), np.float32(rgb_val))
    return {
        "rgb": (v, v, v),
        "t": jnp.asarray(plane(gb["depth"])),
        "n": tuple(jnp.asarray(plane(c)) for c in gb["normal"]),
        "h": jnp.full((ph, pw), np.float32(h_val)),
    }


def test_temporal_identity_blends_history_in():
    """Same camera, clean history at full weight, 1-launch noisy
    accumulation: the temporal display lands much closer to the truth
    than the purely spatial one."""
    width, height = 64, 32
    cam, gb, inv_map, pw, ph, n = _temporal_setup(width, height)
    base = 0.5
    rng = np.random.default_rng(7)
    noise = rng.normal(0.0, 0.25, size=(3, n)).astype(np.float32)
    count = jnp.full((n,), np.float32(1.0))
    accum = tuple(jnp.maximum(jnp.asarray(base + noise[i]), 0.0)
                  for i in range(3))
    cap = dn._HIST_CAP_SPP * integ.PT_STEPS
    hist = _hist_from_gb(gb, inv_map, pw, ph, base, cap)
    prev = dn.world_to_screen(cam, width, height)
    img_t, new_hist = dn.denoised_display_temporal(
        accum, count, gb, hist, prev, inv_map, jnp.float32(1.0),
        width=width, height=height, pw=pw, ph=ph, is_persp=True)
    img_s = dn.denoised_display(accum, count, gb, inv_map,
                                jnp.float32(1.0), pw=pw, ph=ph)
    from glaze_tpu.ops import texture as tx

    truth = float(np.round(
        np.asarray(tx.linear_to_srgb(jnp.float32(base))) * 255.0))
    crop = np.s_[:height, :width]
    mse_t = ((np.asarray(img_t, np.float64)[crop] - truth) ** 2).mean()
    mse_s = ((np.asarray(img_s, np.float64)[crop] - truth) ** 2).mean()
    assert mse_t < mse_s / 4.0, (mse_t, mse_s)
    # the history count saturates at the cap
    assert float(new_hist["h"].max()) <= cap + 1e-3


def test_temporal_rejects_mismatched_geometry():
    """History whose stored depth disagrees with the reprojected
    geometry (a disocclusion) is discarded: the temporal frame equals
    the plain spatial one bit-for-bit."""
    width, height = 64, 32
    cam, gb, inv_map, pw, ph, n = _temporal_setup(width, height)
    rng = np.random.default_rng(9)
    noise = rng.normal(0.0, 0.25, size=(3, n)).astype(np.float32)
    count = jnp.full((n,), np.float32(1.0))
    accum = tuple(jnp.maximum(jnp.asarray(0.5 + noise[i]), 0.0)
                  for i in range(3))
    cap = dn._HIST_CAP_SPP * integ.PT_STEPS
    hist = _hist_from_gb(gb, inv_map, pw, ph, 0.9, cap)
    hist["t"] = hist["t"] * 2.0  # depth test must fail everywhere
    prev = dn.world_to_screen(cam, width, height)
    img_t, _ = dn.denoised_display_temporal(
        accum, count, gb, hist, prev, inv_map, jnp.float32(1.0),
        width=width, height=height, pw=pw, ph=ph, is_persp=True)
    img_s = dn.denoised_display(accum, count, gb, inv_map,
                                jnp.float32(1.0), pw=pw, ph=ph)
    np.testing.assert_array_equal(np.asarray(img_t), np.asarray(img_s))


def test_temporal_converges_to_raw():
    """Capped history weight: with a large accumulated count even a
    WRONG history moves the displayed image by at most a couple of u8
    steps (the display still converges to the unbiased result)."""
    width, height = 64, 32
    cam, gb, inv_map, pw, ph, n = _temporal_setup(width, height)
    count = jnp.full((n,), np.float32(1e5))
    accum = tuple(jnp.full((n,), np.float32(0.5)) * count for _ in range(3))
    cap = dn._HIST_CAP_SPP * integ.PT_STEPS
    hist = _hist_from_gb(gb, inv_map, pw, ph, 1.0, cap)  # wrong color
    prev = dn.world_to_screen(cam, width, height)
    img_t, _ = dn.denoised_display_temporal(
        accum, count, gb, hist, prev, inv_map, jnp.float32(1.0),
        width=width, height=height, pw=pw, ph=ph, is_persp=True)
    img_s = dn.denoised_display(accum, count, gb, inv_map,
                                jnp.float32(1.0), pw=pw, ph=ph)
    crop = np.s_[:height, :width]
    diff = np.abs(np.asarray(img_t, np.int32)[crop]
                  - np.asarray(img_s, np.int32)[crop])
    assert diff.max() <= 2, diff.max()


def test_temporal_renderer_drag_end_to_end():
    """RayTraceRenderer with temporal denoise through a camera move:
    history survives the restart and the post-move frame lands closer
    to the converged post-move image than the history-free one."""
    from golden_scenes import GOLDEN_H, GOLDEN_W, MatRowScene
    from glaze_tpu.render.renderer import Integrator, RayTraceRenderer

    kw = dict(width=GOLDEN_W, height=GOLDEN_H,
              integrator=Integrator.PATH_TRACE, seed=5)

    def run(temporal):
        r = RayTraceRenderer(MatRowScene(), **kw)
        r.denoise = True
        r.temporal = temporal
        for _ in range(2 * integ.PT_STEPS):  # build up history at cam A
            r.draw_frame(return_image=True)
        r.camera.look_around(0.02, 0.0)
        r.update_camera(r.camera)  # restart: post-move frame is 1 launch
        img = np.asarray(r.draw_frame(return_image=True), np.float64)
        return img[:GOLDEN_H, :GOLDEN_W], r

    img_t, r_t = run(True)
    img_p, _ = run(False)
    # converged raw truth at the post-move camera
    truth_r = RayTraceRenderer(MatRowScene(), **kw)
    truth_r.camera.look_around(0.02, 0.0)
    truth_r.update_camera(truth_r.camera)
    truth = np.asarray(truth_r.draw(8), np.float64)
    mse_t = ((img_t - truth) ** 2).mean()
    mse_p = ((img_p - truth) ** 2).mean()
    assert mse_t < mse_p, (mse_t, mse_p)
    # scene edits drop the history (old colors would ghost)
    r_t.update_materials_and_lights(list(r_t.host.materials),
                                    list(r_t.host.lights))
    assert r_t._dn_hist is None


def test_first_hit_gbuffer_matches_gbuffer_pass():
    """The drag path builds its G-buffer from the launch's own primary
    trace (launch_step want_first_hit). At center jitter (0.5, 0.5) the
    rays are identical to gbuffer_pass's, so every guide must match to
    float rounding (the sorted launch trace and the unsorted guide
    trace fuse FP ops differently) — pinning that the two trace setups
    never drift apart."""
    from golden_scenes import GOLDEN_H, GOLDEN_W, MatRowScene
    from glaze_tpu.render.renderer import RayTraceRenderer

    r = RayTraceRenderer(MatRowScene(), width=GOLDEN_W, height=GOLDEN_H,
                         seed=3)
    c2w, s2c = integ.camera_matrices(r.camera, GOLDEN_W, GOLDEN_H)
    c2w, s2c = jnp.asarray(c2w), jnp.asarray(s2c)
    ref = dn.gbuffer_pass(r.scene, c2w, s2c, width=GOLDEN_W,
                          height=GOLDEN_H, is_persp=True, alpha_rounds=0)

    px, py, rng_py = integ.sif_lanes(GOLDEN_W, GOLDEN_H, 1)
    size = jnp.asarray([GOLDEN_W, GOLDEN_H], jnp.float32)
    state = integ.init_state(GOLDEN_W, GOLDEN_H)
    _, fh = integ.launch_step(
        r.scene, state, jnp.uint32(7), jnp.asarray([0.5, 0.5], jnp.float32),
        c2w, s2c, px, py, size, is_persp=True, rng_py=rng_py,
        want_first_hit=True)
    got = dn._guides(r.scene, fh["origin"], fh["direction"], fh["missed"],
                     fh["t"], fh["shading_normal"], fh["material_id"],
                     fh["uv"])

    for k in ("normal", "depth", "albedo", "wpos"):
        a, b = ref[k], got[k]
        if not isinstance(a, tuple):
            a, b = (a,), (b,)
        for ca, cb in zip(a, b):
            np.testing.assert_allclose(np.asarray(ca), np.asarray(cb),
                                       rtol=1e-4, atol=1e-4, err_msg=k)
