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
    # sky lanes: normal = ray direction (smooth across the dome), huge
    # depth (never mixes with geometry).
    n = vec.where(missed, direction, surf["shading_normal"])
    z = jnp.where(missed, _SKY_DEPTH, hit["t"])

    # diffuse albedo (texture x multiplier) for diffuse-lobed families;
    # specular families (mirror/glass/metal) reflect the environment, so
    # their pixel color is not separable from the surface tint — pass
    # them through undemodulated (albedo 1).
    mat_id = surf["material_id"]
    texid = scene.mat_tex[mat_id][:, fl.MT_DIFFUSE]
    r, g, b = tx.sample_rgb_v(scene.atlas, texid, surf["uv"][0],
                              surf["uv"][1])
    s = scene.mat_scalars[mat_id]
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
    return {"normal": n, "depth": z, "albedo": albedo}


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

    chans = [
        jnp.round(
            tx.linear_to_srgb(jnp.clip(rgb[i] * alb[i] * exposure, 0.0, 1.0))
            * 255.0
        ).astype(jnp.uint8)
        for i in range(3)
    ]
    return jnp.stack(chans, axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "is_persp", "direct_only", "steps",
                     "alpha_rounds", "sif", "iterations",
                     "launches_per_spp"),
)
def render_steps_denoised(scene, state, seeds, offsets, cam2world,
                          screen2cam, exposure, gb, inv_map, *, width,
                          height, is_persp, direct_only, steps,
                          alpha_rounds=0, sif=1, iterations=4,
                          launches_per_spp=integ.PT_STEPS):
    """render_steps + the denoised display fused into ONE executable
    (the interactive path pays a single dispatch per frame, like
    render_steps_with_image). Returns (state, (ph, pw, 3) u8)."""
    state = integ.render_steps(
        scene, state, seeds, offsets, cam2world, screen2cam,
        width=width, height=height, is_persp=is_persp,
        direct_only=direct_only, steps=steps, alpha_rounds=alpha_rounds,
        sif=sif,
    )
    pw, ph = integ.padded_dims(width, height)
    img = denoised_display(state.accum, state.count, gb, inv_map, exposure,
                           pw=pw, ph=ph, iterations=iterations, sif=sif,
                           launches_per_spp=launches_per_spp)
    return state, img
