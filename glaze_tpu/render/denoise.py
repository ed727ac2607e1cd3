"""Edge-aware à-trous denoiser for the progressive preview (SVGF-style).

The reference ships no denoiser — its realtime preview visibly flickers
at low sample counts (/root/reference/README.md: "flickering is expected
during the first few frames"). On TPU the natural companion to a slower
per-chip trace rate is an image-space reconstruction filter: one or two
samples per pixel plus an edge-aware smooth looks converged while the
unbiased accumulation refines underneath.

Design (à la SVGF, Schied et al. 2017, simplified for progressive
accumulation — no temporal reprojection needed because the accumulation
buffer IS the temporal filter):

* A **G-buffer pass** (one primary-visibility trace, re-run only when the
  camera/scene/resolution changes) provides first-hit shading normal,
  hit distance and diffuse albedo per pixel.
* The radiance mean is **demodulated by albedo**, filtered, and
  remodulated — texture detail never blurs.
* An **à-trous wavelet** (5x5 B3-spline taps, dilation 1,2,4,...) runs
  ``iterations`` times with edge-stopping weights on normal similarity,
  relative depth difference, and luminance difference.
* The luminance sigma scales as ``1/sqrt(sample count)`` — exactly the
  Monte-Carlo noise decay — so the filter automatically FADES as the
  accumulation converges: early frames are smoothed hard, converged
  images pass through untouched. The accumulation state itself is never
  filtered; this is a display-only reconstruction and the offline path
  stays unbiased.

Everything is elementwise math + static shifts over a (ph, pw) image —
XLA fuses the whole filter into a handful of kernels; there are no
gathers or scatters beyond one static permutation that un-swizzles the
tile-ordered lane axis into image rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from glaze_tpu import accel
from glaze_tpu.ops import texture as tx
from glaze_tpu.ops import vec
from glaze_tpu.render import bsdf as bsdf_mod
from glaze_tpu.render import integrator as integ
from glaze_tpu.scene import flatten as fl

# depth assigned to miss (sky) lanes: far beyond any scene hit, so the
# depth weight cleanly separates sky from geometry while sky pixels
# still filter among themselves.
_SKY_DEPTH = np.float32(1e8)

# 5-tap B3-spline kernel (the classic à-trous generator).
_H = np.asarray([1.0, 4.0, 6.0, 4.0, 1.0], np.float32) / 16.0


@functools.lru_cache(maxsize=8)
def lane_to_image(width: int, height: int):
    """Static permutation mapping the tile-swizzled lane axis to flat
    padded-image order: ``img = lanes[inv].reshape(ph, pw)``. Pure row
    gather on device (scatters serialize on TPU, gathers don't)."""
    px, py = integ.pixel_coords_np(width, height)
    pw, ph = integ.padded_dims(width, height)
    flat = (py.astype(np.int64) * pw + px).astype(np.int32)
    inv = np.empty(pw * ph, np.int32)
    inv[flat] = np.arange(flat.size, dtype=np.int32)
    return jnp.asarray(inv), pw, ph


@functools.partial(
    jax.jit, static_argnames=("width", "height", "is_persp", "alpha_rounds"))
def gbuffer_pass(scene, cam2world, screen2cam, *, width, height, is_persp,
                 alpha_rounds=0):
    """First-hit guide buffers, per lane: shading normal (3,), hit
    distance, diffuse albedo (3,). One primary trace — identical ray
    setup to the integrator's camera step, so guides align with the
    accumulated image exactly. Re-run only on camera/scene changes."""
    px, py = integ.pixel_coords(width, height)
    ndc_x = -1.0 + 2.0 * (px + 0.5) / width
    ndc_y = -1.0 + 2.0 * (py + 0.5) / height
    origin, direction = integ.camera_rays(ndc_x, ndc_y, cam2world,
                                          screen2cam, is_persp)
    if alpha_rounds > 0:
        hit = integ.trace_alpha(scene, origin, direction,
                                alpha_rounds=alpha_rounds)
    else:
        hit = accel.closest_hit_soa_auto(scene.bvh, origin, direction)
    missed = hit["tri"] < 0

    surf = integ._interpolate_hit(scene, hit)
    return _guides(scene, origin, direction, missed, hit["t"],
                   surf["shading_normal"], surf["material_id"], surf["uv"])


def _guides(scene, origin, direction, missed, t, shading_normal,
            material_id, uv):
    """Guide buffers from first-hit attributes (shared by gbuffer_pass
    and the drag path, which reuses the launch's own primary trace)."""
    # sky lanes: normal = ray direction (smooth across the dome), huge
    # depth (never mixes with geometry).
    n = vec.where(missed, direction, shading_normal)
    z = jnp.where(missed, _SKY_DEPTH, t)

    # diffuse albedo (texture x multiplier) for diffuse-lobed families;
    # specular families (mirror/glass/metal) reflect the environment, so
    # their pixel color is not separable from the surface tint — pass
    # them through undemodulated (albedo 1).
    texid = scene.mat_tex[material_id][:, fl.MT_DIFFUSE]
    r, g, b = tx.sample_rgb_v(scene.atlas, texid, uv[0], uv[1])
    s = scene.mat_scalars[material_id]
    r = r * s[:, fl.MS_DIFFUSE_R]
    g = g * s[:, fl.MS_DIFFUSE_G]
    b = b * s[:, fl.MS_DIFFUSE_B]
    family = s[:, fl.MS_BSDF].astype(jnp.int32)
    diffuse_lobed = ((family == bsdf_mod.FAMILY_LAMBERT)
                     | (family == bsdf_mod.FAMILY_FROSTED)
                     | (family == bsdf_mod.FAMILY_UBER))
    keep = missed | ~diffuse_lobed
    one = jnp.ones_like(r)
    albedo = (jnp.where(keep, one, r), jnp.where(keep, one, g),
              jnp.where(keep, one, b))
    # first-hit world position (sky lanes land at _SKY_DEPTH along the
    # ray): the temporal path reprojects it into the previous camera.
    wpos = tuple(o + z * dd for o, dd in zip(origin, direction))
    return {"normal": n, "depth": z, "albedo": albedo, "wpos": wpos}


def _atrous(chans, lum, nx, ny, nz, z, sigma_l, *, iterations,
            sigma_n=32.0, sigma_z=0.08):
    """Edge-aware à-trous over (ph, pw) planes.

    chans: list of demodulated radiance planes (filtered).
    Guides (lum/normal/depth) stay FIXED across iterations — classic
    à-trous re-filters luminance too, but with progressive accumulation
    the guide noise already decays as 1/sqrt(n) and fixed guides keep
    the filter strictly fading toward identity."""
    ph, pw = lum.shape
    for it in range(iterations):
        step = 1 << it
        pad = 2 * step
        # pad every plane ONCE per iteration; each tap is then a static
        # slice (everything stays fusable elementwise math).
        padded = [jnp.pad(a, pad, mode="edge")
                  for a in (nx, ny, nz, z, lum, *chans)]

        def tap(dy, dx):
            o = (pad + dy * step, pad + dx * step)
            return [jax.lax.dynamic_slice(p, o, (ph, pw)) for p in padded]

        num = [jnp.zeros_like(chans[0]) for _ in chans]
        den = jnp.zeros_like(chans[0])
        for dy in range(-2, 3):
            for dx in range(-2, 3):
                h = jnp.float32(_H[dy + 2] * _H[dx + 2])
                qnx, qny, qnz, qz, qlum, *qc = tap(dy, dx)
                # normal similarity
                w_n = jnp.maximum(nx * qnx + ny * qny + nz * qnz,
                                  0.0) ** sigma_n
                # relative depth difference
                w_z = jnp.exp(-jnp.abs(z - qz)
                              / (sigma_z * jnp.minimum(z, qz) + 1e-4))
                # luminance difference, sigma ~ MC noise level
                w_l = jnp.exp(-jnp.abs(lum - qlum)
                              / jnp.maximum(sigma_l, 1e-6))
                w = h * w_n * w_z * w_l
                for i in range(len(chans)):
                    num[i] = num[i] + w * qc[i]
                den = den + w
        chans = [n / jnp.maximum(den, 1e-8) for n in num]
    return chans


def _local_sigma(lum, k):
    """Per-pixel luminance edge-stop from LOCAL 3x3 variance (the SVGF
    recipe): where the neighborhood is flat-but-noisy the sigma is the
    noise amplitude and the filter smooths; where it is smooth (or the
    accumulation has converged — MC noise decays as 1/sqrt(n), so the
    spatial variance does too) sigma collapses and the filter passes
    the image through. Smooth gradients survive because their local
    variance is the (tiny) gradient step, not the noise floor."""
    ph, pw = lum.shape
    p = jnp.pad(lum, 1, mode="edge")
    mu = jnp.zeros_like(lum)
    mu2 = jnp.zeros_like(lum)
    for dy in range(3):
        for dx in range(3):
            q = jax.lax.dynamic_slice(p, (dy, dx), (ph, pw))
            mu = mu + q
            mu2 = mu2 + q * q
    mu = mu / 9.0
    var = jnp.maximum(mu2 / 9.0 - mu * mu, 0.0)
    return k * jnp.sqrt(var)


def _display_linear(accum, count, gb, inv_map, *, pw, ph, iterations, sif,
                    sigma_l_scale, launches_per_spp):
    """Shared core: accumulation -> filtered MODULATED linear planes
    (pre-exposure, pre-sRGB). Returns (rgb_lin list, cnt plane)."""
    accum, count = integ._fold_sif(accum, count, sif)
    cnt = jnp.maximum(count, 1.0)

    def plane(v):
        return v[inv_map].reshape(ph, pw)

    # linear radiance mean, demodulated by first-hit albedo
    alb = [jnp.maximum(plane(a), 0.02) for a in gb["albedo"]]
    rgb = [plane(accum[i] / cnt) / alb[i] for i in range(3)]
    nx, ny, nz = (plane(gb["normal"][i]) for i in range(3))
    zd = plane(gb["depth"])
    lum = 0.2126 * rgb[0] + 0.7152 * rgb[1] + 0.0722 * rgb[2]
    # local variance tracks noise in flat regions but bottoms out on real
    # luminance structure (shadow/highlight edges); the explicit
    # 1/sqrt(samples) factor makes the filter provably fade to identity
    # as the accumulation converges (PT_STEPS launches = 1 spp).
    fade = jnp.minimum(1.0, jnp.sqrt(np.float32(launches_per_spp)
                                     / plane(cnt)))
    sigma_l = _local_sigma(lum, jnp.float32(sigma_l_scale)) * fade

    filtered = _atrous(rgb, lum, nx, ny, nz, zd, sigma_l,
                       iterations=iterations)
    # output blend by the same fade: even where the edge-stopping sigma
    # mis-prices real structure, the displayed image converges to the
    # raw (unbiased) accumulation as samples accrue — the filter can
    # only ever hurt a vanishing fraction of the converged result.
    rgb = [r + fade * (f - r) for r, f in zip(rgb, filtered)]
    return [r * a for r, a in zip(rgb, alb)], plane(cnt)


def _to_srgb_u8(rgb_lin, exposure):
    chans = [
        jnp.round(
            tx.linear_to_srgb(jnp.clip(c * exposure, 0.0, 1.0)) * 255.0
        ).astype(jnp.uint8)
        for c in rgb_lin
    ]
    return jnp.stack(chans, axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("pw", "ph", "iterations", "sif", "launches_per_spp"))
def denoised_display(accum, count, gb, inv_map, exposure, *, pw, ph,
                     iterations=4, sif=1, sigma_l_scale=3.0,
                     launches_per_spp=integ.PT_STEPS):
    """Accumulation state -> denoised (ph, pw, 3) sRGB u8 image.

    ``sigma_l_scale`` multiplies the local-variance luminance sigma
    (higher = smoother, lower = more faithful). ``launches_per_spp`` is
    the integrator's steps_per_sample (count is per-launch; the fade is
    calibrated in SAMPLES)."""
    lin, _ = _display_linear(accum, count, gb, inv_map, pw=pw, ph=ph,
                             iterations=iterations, sif=sif,
                             sigma_l_scale=sigma_l_scale,
                             launches_per_spp=launches_per_spp)
    return _to_srgb_u8(lin, exposure)


# ---------------------------------------------------------------------------
# Temporal reprojection (the other half of SVGF): during camera motion the
# accumulation restarts every frame at ~1 launch of samples; warping the
# previous DISPLAYED frame into the new camera and blending it in where
# depth/normal agree keeps drags visually stable. Display-only, like the
# spatial filter: the history weight is capped, so once the camera rests
# the blend fades as 1/count and the shown image converges to the raw
# unbiased accumulation.

# history effective-count cap, in SAMPLES: the history can never outweigh
# more than this many freshly-accumulated spp (SVGF's alpha=0.2 ~ 4-8).
_HIST_CAP_SPP = 8.0


def world_to_screen(camera, width: int, height: int):
    """Host-side (view, proj, position) for reprojection — the forward
    transforms whose inverses are integ.camera_matrices."""
    view = camera.look_at_rh().astype(np.float32)
    proj = camera.projection(width, height).copy()
    proj[1, 1] *= -1.0  # same Vulkan clip-space flip as camera_matrices
    return (jnp.asarray(view), jnp.asarray(proj.astype(np.float32)),
            jnp.asarray(np.asarray(camera.position(), np.float32)))


def init_history(width: int, height: int):
    """Zero history: h=0 everywhere, so the first temporal frame blends
    nothing and is identical to the plain denoised display."""
    _, pw, ph = lane_to_image(width, height)
    z = jnp.zeros((ph, pw), jnp.float32)
    return {"rgb": (z, z, z), "t": z, "n": (z, z, z), "h": z}


def _reproject(hist, gb_planes, prev, *, width, height, pw, ph, is_persp):
    """Bilinear-gather the history at each pixel's reprojected location.

    Returns (hist_rgb, hist_h, valid): history color (modulated linear),
    its effective launch count, and a geometric-consistency mask (in
    bounds, in front, depth within 5%, normals within ~25 deg)."""
    view, proj, prev_pos = prev
    wx, wy, wz = gb_planes["wpos"]
    # view-space position of the current first hit under the PREV camera
    vx = view[0, 0] * wx + view[0, 1] * wy + view[0, 2] * wz + view[0, 3]
    vy = view[1, 0] * wx + view[1, 1] * wy + view[1, 2] * wz + view[1, 3]
    vz = view[2, 0] * wx + view[2, 1] * wy + view[2, 2] * wz + view[2, 3]
    if is_persp:
        cx = proj[0, 0] * vx + proj[0, 1] * vy + proj[0, 2] * vz + proj[0, 3]
        cy = proj[1, 0] * vx + proj[1, 1] * vy + proj[1, 2] * vz + proj[1, 3]
        cw = proj[3, 0] * vx + proj[3, 1] * vy + proj[3, 2] * vz + proj[3, 3]
        in_front = cw > 1e-6
        w = jnp.where(in_front, cw, 1.0)
        ndc_x, ndc_y = cx / w, cy / w
        # distance the PREV frame's gbuffer would have recorded
        exp_t = jnp.sqrt((wx - prev_pos[0]) ** 2 + (wy - prev_pos[1]) ** 2
                         + (wz - prev_pos[2]) ** 2)
    else:
        # ortho rays start at cam2world @ (ndc, 0, 1): ndc IS view-space
        # xy, depth is the distance along the (unit) view direction
        ndc_x, ndc_y = vx, vy
        exp_t = -vz
        in_front = exp_t > 0.0
    fx = (ndc_x + 1.0) * 0.5 * width - 0.5
    fy = (ndc_y + 1.0) * 0.5 * height - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx_ = fx - x0
    ty_ = fy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    # all 4 taps must land on REAL pixels (the padded region holds junk)
    inb = ((x0i >= 0) & (x0i + 1 <= width - 1)
           & (y0i >= 0) & (y0i + 1 <= height - 1))

    # one stacked gather per tap: (8, ph*pw) planes, flat indices
    stack = jnp.stack([*hist["rgb"], hist["t"], *hist["n"], hist["h"]],
                      axis=0).reshape(8, ph * pw)

    def tap(xi, yi):
        idx = jnp.clip(yi, 0, ph - 1) * pw + jnp.clip(xi, 0, pw - 1)
        return jnp.take(stack, idx.reshape(-1), axis=1).reshape(8, ph, pw)

    w00 = (1 - tx_) * (1 - ty_)
    w10 = tx_ * (1 - ty_)
    w01 = (1 - tx_) * ty_
    w11 = tx_ * ty_
    g = (tap(x0i, y0i) * w00 + tap(x0i + 1, y0i) * w10
         + tap(x0i, y0i + 1) * w01 + tap(x0i + 1, y0i + 1) * w11)
    hist_rgb = (g[0], g[1], g[2])
    hist_t, hnx, hny, hnz, hist_h = g[3], g[4], g[5], g[6], g[7]

    nx, ny, nz = gb_planes["normal"]
    depth_ok = jnp.abs(hist_t - exp_t) <= 0.05 * exp_t + 1e-3
    normal_ok = (hnx * nx + hny * ny + hnz * nz) > 0.9
    valid = inb & in_front & depth_ok & normal_ok & (hist_h > 0.0)
    return hist_rgb, hist_h, valid


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "pw", "ph", "is_persp",
                     "iterations", "sif", "launches_per_spp"))
def denoised_display_temporal(accum, count, gb, hist, prev, inv_map,
                              exposure, *, width, height, pw, ph, is_persp,
                              iterations=4, sif=1, sigma_l_scale=3.0,
                              launches_per_spp=integ.PT_STEPS):
    """Temporal + spatial display: blend the reprojected previous
    displayed frame into the current filtered one where geometry agrees.
    Returns ((ph, pw, 3) u8 image, new history)."""
    lin, cnt = _display_linear(accum, count, gb, inv_map, pw=pw, ph=ph,
                               iterations=iterations, sif=sif,
                               sigma_l_scale=sigma_l_scale,
                               launches_per_spp=launches_per_spp)

    def plane(v):
        return v[inv_map].reshape(ph, pw)

    gb_planes = {
        "wpos": tuple(plane(c) for c in gb["wpos"]),
        "normal": tuple(plane(c) for c in gb["normal"]),
    }
    hist_rgb, hist_h, valid = _reproject(
        hist, gb_planes, prev, width=width, height=height, pw=pw, ph=ph,
        is_persp=is_persp)
    # blend by effective counts (both in launches); the cap bounds the
    # history's weight so the display converges to the raw accumulation
    cap = np.float32(_HIST_CAP_SPP * launches_per_spp)
    h = jnp.where(valid, jnp.minimum(hist_h, cap), 0.0)
    w_h = h / (h + cnt)
    out = [c + w_h * (hr - c) for c, hr in zip(lin, hist_rgb)]
    new_hist = {
        "rgb": tuple(out),
        "t": plane(gb["depth"]),
        "n": gb_planes["normal"],
        "h": jnp.minimum(h + cnt, cap),
    }
    return _to_srgb_u8(out, exposure), new_hist


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "is_persp", "direct_only", "steps",
                     "alpha_rounds", "sif", "iterations",
                     "launches_per_spp", "coherent", "sampler"),
)
def render_steps_denoised(scene, state, seeds, offsets, cam2world,
                          screen2cam, exposure, gb, inv_map, *, width,
                          height, is_persp, direct_only, steps,
                          alpha_rounds=0, sif=1, iterations=4,
                          launches_per_spp=integ.PT_STEPS, coherent=None,
                          sampler="pcg", sampler_seed=None):
    """render_steps + the denoised display fused into ONE executable
    (the interactive path pays a single dispatch per frame, like
    render_steps_with_image). Returns (state, (ph, pw, 3) u8)."""
    state = integ.render_steps(
        scene, state, seeds, offsets, cam2world, screen2cam,
        width=width, height=height, is_persp=is_persp,
        direct_only=direct_only, steps=steps, alpha_rounds=alpha_rounds,
        sif=sif, coherent=coherent, sampler=sampler,
        sampler_seed=sampler_seed,
    )
    pw, ph = integ.padded_dims(width, height)
    img = denoised_display(state.accum, state.count, gb, inv_map, exposure,
                           pw=pw, ph=ph, iterations=iterations, sif=sif,
                           launches_per_spp=launches_per_spp)
    return state, img


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "is_persp", "direct_only", "steps",
                     "alpha_rounds", "sif", "iterations",
                     "launches_per_spp", "coherent", "sampler"),
)
def render_steps_denoised_temporal(scene, state, hist, seeds, offsets,
                                   cam2world, screen2cam, exposure, gb,
                                   prev, inv_map, *, width, height,
                                   is_persp, direct_only, steps,
                                   alpha_rounds=0, sif=1, iterations=4,
                                   launches_per_spp=integ.PT_STEPS,
                                   coherent=None, sampler="pcg",
                                   sampler_seed=None):
    """render_steps + temporal+spatial denoised display in ONE executable.
    Returns (state, new history, (ph, pw, 3) u8)."""
    state = integ.render_steps(
        scene, state, seeds, offsets, cam2world, screen2cam,
        width=width, height=height, is_persp=is_persp,
        direct_only=direct_only, steps=steps, alpha_rounds=alpha_rounds,
        sif=sif, coherent=coherent, sampler=sampler,
        sampler_seed=sampler_seed,
    )
    pw, ph = integ.padded_dims(width, height)
    img, hist = denoised_display_temporal(
        state.accum, state.count, gb, hist, prev, inv_map, exposure,
        width=width, height=height, pw=pw, ph=ph, is_persp=is_persp,
        iterations=iterations, sif=sif, launches_per_spp=launches_per_spp)
    return state, hist, img


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "is_persp", "direct_only", "steps",
                     "alpha_rounds", "sif", "iterations",
                     "launches_per_spp", "coherent", "sampler"),
)
def render_steps_denoised_temporal_gb(scene, state, hist, seeds, offsets,
                                      cam2world, screen2cam, exposure,
                                      prev, inv_map, *, width, height,
                                      is_persp, direct_only, steps,
                                      alpha_rounds=0, sif=1, iterations=4,
                                      launches_per_spp=integ.PT_STEPS,
                                      coherent=None, sampler="pcg",
                                      sampler_seed=None):
    """The camera-moved (drag) frame: G-buffer + launch + temporal
    display in ONE executable, ONE primary trace. The caller restarts
    accumulation on camera moves, so the launch's first step traces
    camera rays — its hit attributes ARE the G-buffer (at that step's
    sub-pixel jitter; SVGF uses the jittered frame G-buffer the same
    way), and the separate gbuffer_pass trace that would double the
    drag cost is skipped. Returns (state, new history, (ph, pw, 3) u8,
    gbuffer) — the caller caches the G-buffer for following still
    frames."""
    if sif == 1:
        # step 0 outside the scan, with its first-hit attributes kept
        px, py, rng_py = integ.sif_lanes(width, height, sif)
        size = jnp.asarray([width, height], jnp.float32)
        state, fh = integ.launch_step(
            scene, state, seeds[0], offsets[0], cam2world, screen2cam,
            px, py, size, is_persp=is_persp, direct_only=direct_only,
            alpha_rounds=alpha_rounds, rng_py=rng_py,
            want_first_hit=True, coherent=coherent, sampler=sampler,
            sampler_seed=sampler_seed)
        gb = _guides(scene, fh["origin"], fh["direction"], fh["missed"],
                     fh["t"], fh["shading_normal"], fh["material_id"],
                     fh["uv"])
        if steps > 1:
            state = integ.render_steps(
                scene, state, seeds[1:], offsets[1:], cam2world,
                screen2cam, width=width, height=height, is_persp=is_persp,
                direct_only=direct_only, steps=steps - 1,
                alpha_rounds=alpha_rounds, sif=sif, coherent=coherent,
                sampler=sampler, sampler_seed=sampler_seed)
    else:
        # sif>1 lanes are sif copies per pixel; guides stay per-pixel,
        # so keep the dedicated (jitter-free) guide trace there.
        gb = gbuffer_pass(scene, cam2world, screen2cam, width=width,
                          height=height, is_persp=is_persp,
                          alpha_rounds=alpha_rounds)
        state = integ.render_steps(
            scene, state, seeds, offsets, cam2world, screen2cam,
            width=width, height=height, is_persp=is_persp,
            direct_only=direct_only, steps=steps, alpha_rounds=alpha_rounds,
            sif=sif, coherent=coherent, sampler=sampler,
            sampler_seed=sampler_seed,
        )
    pw, ph = integ.padded_dims(width, height)
    img, hist = denoised_display_temporal(
        state.accum, state.count, gb, hist, prev, inv_map, exposure,
        width=width, height=height, pw=pw, ph=ph, is_persp=is_persp,
        iterations=iterations, sif=sif, launches_per_spp=launches_per_spp)
    return state, hist, img, gb
