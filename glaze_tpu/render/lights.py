"""Next-event-estimation light sampling, all four light types.

TPU port of the light callable shaders (``light_*_sample_visible.rcall``).
Every sampler runs masked over the whole ray batch and the result is
selected by the picked light's type, replacing the SBT callable dispatch
(light.rs:100-119).

Documented deviations from the reference (bug fixes):
* AREA: pdf uses the true world-space triangle area (the reference's GLSL
  ``cross(...).length()`` returns the component count 3, i.e. every
  triangle has "area" 1.5) and wiW points surface->light (the reference
  has the sign flipped, light_area_sample_visible.rcall:53).
* SKY: CDF inversion indexes the tables exactly (the reference samples the
  conditional CDF image with unnormalized texture() coordinates) and
  re-weights by the value count (pbrt) rather than the CDF count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from glaze_tpu.ops import spectra
from glaze_tpu.ops import texture as tx

PI = jnp.float32(3.1415926)
TWO_PI = jnp.float32(6.2831853)
INV_PI = jnp.float32(0.3183099)
INV_2PI = jnp.float32(0.1591549)

TYPE_OMNI = 0
TYPE_SUN = 1
TYPE_AREA = 2
TYPE_SKY = 3


def _omni(scene, light_idx, position):
    pos = scene.light_pos[light_idx]
    color = scene.light_color[light_idx]
    intensity = scene.light_intensity[light_idx]
    delta = pos - position
    d2 = jnp.sum(delta * delta, axis=-1)
    dist = jnp.sqrt(d2)
    wiw = delta / jnp.maximum(dist, 1e-20)[..., None]
    emission = color * (intensity / jnp.maximum(d2, 1e-20))[..., None]
    pdf = jnp.ones_like(dist)
    return wiw, dist, emission, pdf


def _sun(scene, light_idx, position):
    color = scene.light_color[light_idx]
    intensity = scene.light_intensity[light_idx]
    wiw = -scene.light_dir[light_idx]
    dist = jnp.broadcast_to(2.0 * scene.scene_radius + 1.0, light_idx.shape)
    emission = color * intensity[..., None]
    pdf = jnp.ones_like(dist)
    return wiw, dist, emission, pdf


def _area(scene, light_idx, position, rand3):
    first = scene.light_tri_first[light_idx]
    count = jnp.maximum(scene.light_tri_count[light_idx], 1)
    intensity = scene.light_intensity[light_idx]
    mat_id = scene.light_material[light_idx]

    tri_id = first + jnp.minimum(
        (rand3[..., 0] * count.astype(jnp.float32)).astype(jnp.int32), count - 1
    )
    tri_id = jnp.clip(tri_id, 0, scene.tri_pos_orig.shape[0] - 1)
    tri = scene.tri_pos_orig[tri_id]  # (R, 3, 3) world space
    v0, v1, v2 = tri[..., 0, :], tri[..., 1, :], tri[..., 2, :]
    cr = jnp.cross(v1 - v0, v2 - v0)
    area = 0.5 * jnp.linalg.norm(cr, axis=-1)

    sqr_u = jnp.sqrt(rand3[..., 1])
    bu = 1.0 - sqr_u
    bv = rand3[..., 2] * sqr_u
    point = bu[..., None] * v0 + bv[..., None] * v1 + (1.0 - bu - bv)[..., None] * v2

    delta = point - position
    d2 = jnp.sum(delta * delta, axis=-1)
    dist = jnp.sqrt(d2)
    wiw = delta / jnp.maximum(dist, 1e-20)[..., None]

    diffuse_mul = scene.mat_diffuse_mul[mat_id]
    emission = spectra.from_surface_color(diffuse_mul) * (
        intensity / jnp.maximum(d2, 1e-20)
    )[..., None]
    pdf = 1.0 / (count.astype(jnp.float32) * jnp.maximum(area, 1e-20))
    return wiw, dist, emission, pdf


def _searchsorted_rows(cdf_rows, row_idx, rand):
    """Per-ray binary search in cdf_rows[row_idx]: largest i with
    cdf[i] <= rand. One gathered element per step (log2 steps), avoiding a
    full row gather per ray."""
    import math

    n = cdf_rows.shape[-1]
    steps = max(int(math.ceil(math.log2(n + 1))), 1)
    lo = jnp.zeros_like(rand, dtype=jnp.int32)
    hi = jnp.full_like(lo, n)

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) // 2
        val = cdf_rows[row_idx, jnp.clip(mid, 0, n - 1)]
        le = val <= rand
        lo = jnp.where(le & (mid < hi), jnp.minimum(mid + 1, hi), lo)
        hi = jnp.where(le, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return jnp.clip(lo - 1, 0, n - 2)


def _sample_distribution_1d(cdf, values, integral, rand):
    """pbrt Distribution1D::SampleContinuous over a shared (n+1,) CDF."""
    n = values.shape[-1]
    offset = jnp.clip(jnp.searchsorted(cdf, rand, side="right") - 1, 0, n - 1)
    cur = cdf[offset]
    nxt = cdf[offset + 1]
    du = jnp.where(nxt - cur > 0.0, (rand - cur) / (nxt - cur), rand - cur)
    pdf = values[offset] / integral
    return (offset.astype(jnp.float32) + du) / n, offset, pdf


def _sky(scene, light_idx, position, rand3):
    # marginal over rows (v), then conditional over columns (u)
    v, row, v_pdf = _sample_distribution_1d(
        scene.sky_marginal_cdf,
        scene.sky_marginal_val,
        scene.sky_marginal_integral,
        rand3[..., 1],
    )
    w = scene.sky_cond_val.shape[-1]
    offset = _searchsorted_rows(scene.sky_cond_cdf, row, rand3[..., 0])
    cur = scene.sky_cond_cdf[row, offset]
    nxt = scene.sky_cond_cdf[row, offset + 1]
    du = jnp.where(nxt - cur > 0.0, (rand3[..., 0] - cur) / (nxt - cur), rand3[..., 0] - cur)
    u = (offset.astype(jnp.float32) + du) / w
    u_pdf = scene.sky_cond_val[row, offset] / scene.sky_cond_integral[row]

    theta = v * PI
    sint = jnp.sin(theta)
    phi = u * TWO_PI
    pdf = jnp.where(
        (u_pdf * v_pdf > 0.0) & (sint != 0.0),
        u_pdf * v_pdf / (2.0 * PI * PI * sint),
        0.0,
    )
    wi_local = jnp.stack(
        [sint * jnp.cos(phi), sint * jnp.sin(phi), jnp.cos(theta)], axis=-1
    )
    wiw = jnp.einsum("ij,...j->...i", scene.sky_obj2world, wi_local)
    wiw = wiw / jnp.maximum(jnp.linalg.norm(wiw, axis=-1, keepdims=True), 1e-20)
    dist = jnp.broadcast_to(2.0 * scene.scene_radius + 1.0, pdf.shape)
    uv = jnp.stack([u, v], axis=-1)
    texel = tx.sample_rgb(scene.atlas, jnp.broadcast_to(scene.sky_tex, pdf.shape), uv)
    emission = spectra.from_illuminant_color(texel * scene.sky_intensity)
    return wiw, dist, emission, pdf


def sample_light(scene, light_idx, position, rand3):
    """Samples the picked light toward ``position``.

    Returns (wiW (R,3), distance (R,), emission (R,16), pdf (R,)) —
    the SampledLight struct of raytrace_commons.glsl:52-60.
    """
    ltype = scene.light_type[light_idx]
    o = _omni(scene, light_idx, position)
    s = _sun(scene, light_idx, position)
    a = _area(scene, light_idx, position, rand3)
    k = _sky(scene, light_idx, position, rand3)

    def sel(extract):
        res = extract(o)
        for t, r in ((TYPE_SUN, s), (TYPE_AREA, a), (TYPE_SKY, k)):
            cond = ltype == t
            cur = extract(r)
            if cur.ndim > cond.ndim:
                cond = cond[..., None]
            res = jnp.where(cond, cur, res)
        return res

    wiw = sel(lambda r: r[0])
    dist = sel(lambda r: r[1])
    emission = sel(lambda r: r[2])
    pdf = sel(lambda r: r[3])
    return wiw, dist, emission, pdf
