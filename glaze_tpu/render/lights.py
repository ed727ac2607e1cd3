"""Next-event-estimation light sampling, all four light types, SoA.

TPU port of the light callable shaders (``light_*_sample_visible.rcall``).
Every sampler runs masked over the whole ray batch and the result is
selected by the picked light's type, replacing the SBT callable dispatch
(light.rs:100-119). Only the light types present in the scene (static
``scene.light_kinds``) are evaluated.

Layout: positions/directions are (x, y, z) tuples of (R,); emissions are
(16, R) spectra. Per-light scalars come from ONE ``light_scalars`` row
gather (five separate 1D gathers fused into multi-ms serial TPU ops);
sky alias lookups use consolidated (N, 4) row tables for the same reason.

Documented deviations from the reference (bug fixes):
* AREA: pdf uses the true world-space triangle area (the reference's GLSL
  ``cross(...).length()`` returns the component count 3, i.e. every
  triangle's "area" is 1.5) and wiW points surface->light
  (light_area_sample_visible.rcall:53 has it reversed).
* SKY: CDF inversion indexes the tables exactly (the reference samples its
  conditional CDF image with unnormalized texture() coords,
  light_sky_sample_visible.rcall:73-99) and re-weights by the value count
  (pbrt) rather than the CDF count.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from glaze_tpu.ops import spectra
from glaze_tpu.ops import texture as tx
from glaze_tpu.ops import vec
from glaze_tpu.scene.flatten import MS_DIFFUSE_B, MS_DIFFUSE_G, MS_DIFFUSE_R

PI = np.float32(3.1415926)
TWO_PI = np.float32(6.2831853)

TYPE_OMNI = 0
TYPE_SUN = 1
TYPE_AREA = 2
TYPE_SKY = 3

# light_scalars columns
LS_TYPE = 0
LS_INTENSITY = 1
LS_TRI_FIRST = 2
LS_TRI_COUNT = 3
LS_MATERIAL = 4


def _omni(scene, light_idx, ls, position, ex):
    p3 = scene.light_pos[light_idx]  # (C, 3) row gather at chain width
    pos = (ex(p3[:, 0]), ex(p3[:, 1]), ex(p3[:, 2]))
    color = scene.light_color[light_idx].T  # (16, C)
    intensity = ls[:, LS_INTENSITY]
    delta = vec.sub(pos, position)
    d2 = vec.dot(delta, delta)
    dist = jnp.sqrt(d2)
    wiw = vec.scale(delta, 1.0 / jnp.maximum(dist, 1e-20))
    emission = ex(color) * (ex(intensity) / jnp.maximum(d2, 1e-20))
    pdf = jnp.ones_like(dist)
    return wiw, dist, emission, pdf


def _sun(scene, light_idx, ls, position, ex):
    color = scene.light_color[light_idx].T
    intensity = ls[:, LS_INTENSITY]
    d3 = scene.light_dir[light_idx]
    wiw = (ex(-d3[:, 0]), ex(-d3[:, 1]), ex(-d3[:, 2]))
    dist = jnp.broadcast_to(2.0 * scene.scene_radius + 1.0,
                            position[0].shape)
    emission = ex(color * intensity)
    pdf = jnp.ones_like(dist)
    return wiw, dist, emission, pdf


def _area(scene, light_idx, ls, position, r3, ex):
    first = ls[:, LS_TRI_FIRST].astype(jnp.int32)
    count = jnp.maximum(ls[:, LS_TRI_COUNT].astype(jnp.int32), 1)
    intensity = ls[:, LS_INTENSITY]
    mat_id = ls[:, LS_MATERIAL].astype(jnp.int32)

    tri_id = first + jnp.minimum(
        (r3[0] * count.astype(jnp.float32)).astype(jnp.int32), count - 1
    )
    tri_id = jnp.clip(tri_id, 0, scene.tri_pos_orig.shape[0] - 1)
    t9 = scene.tri_pos_orig[tri_id]  # (R, 9) row gather
    v0 = (t9[:, 0], t9[:, 1], t9[:, 2])
    v1 = (t9[:, 3], t9[:, 4], t9[:, 5])
    v2 = (t9[:, 6], t9[:, 7], t9[:, 8])
    area = 0.5 * vec.length(vec.cross(vec.sub(v1, v0), vec.sub(v2, v0)))

    sqr_u = jnp.sqrt(r3[1])
    bu = 1.0 - sqr_u
    bv = r3[2] * sqr_u
    bw = 1.0 - bu - bv
    point = vec.add(vec.add(vec.scale(v0, bu), vec.scale(v1, bv)),
                    vec.scale(v2, bw))

    delta = vec.sub((ex(point[0]), ex(point[1]), ex(point[2])), position)
    d2 = vec.dot(delta, delta)
    dist = jnp.sqrt(d2)
    wiw = vec.scale(delta, 1.0 / jnp.maximum(dist, 1e-20))

    dm = scene.mat_scalars[mat_id]  # (C, 8) row gather at chain width
    emission = ex(spectra.from_surface_color_t(
        dm[:, MS_DIFFUSE_R], dm[:, MS_DIFFUSE_G], dm[:, MS_DIFFUSE_B]
    )) * (ex(intensity) / jnp.maximum(d2, 1e-20))
    pdf = ex(1.0 / (count.astype(jnp.float32) * jnp.maximum(area, 1e-20)))
    return wiw, dist, emission, pdf


def _alias_pick_rows(rows, rand, base, n_f):
    """O(1) alias-method draw from consolidated (N, 4) rows
    [prob, alias, value, extra].

    ``base``: row offset into the table; ``n_f``: bin count (float).
    Returns (picked bin, continuous position in [0,1), the FIRST row
    gathered — callers re-gather at the picked bin for its value).
    The fractional part is reused exactly for both the accept test and the
    intra-bin position (piecewise-constant pdf, so this is unbiased).
    """
    rn = rand * n_f
    j = jnp.clip(rn.astype(jnp.int32), 0, n_f.astype(jnp.int32) - 1)
    frac = rn - j.astype(jnp.float32)
    r0 = rows[base + j]  # (R, 4) row gather
    p = r0[:, 0]
    alias = r0[:, 1].astype(jnp.int32)
    accept = frac < p
    jf = jnp.where(accept, j, alias)
    pos = jnp.where(
        accept,
        frac / jnp.maximum(p, 1e-20),
        (frac - p) / jnp.maximum(1.0 - p, 1e-20),
    )
    u = (jf.astype(jnp.float32) + jnp.clip(pos, 0.0, 0.999999)) / n_f
    return jf, u


def _sky(scene, light_idx, position, r3, ex):
    # marginal over rows (v), then conditional over columns (u) — alias
    # tables instead of the reference's binary-search CDF inversion
    h = scene.sky_marg_rows.shape[0]
    h_f = jnp.float32(h)
    zero = jnp.zeros_like(r3[1], dtype=jnp.int32)
    row, v = _alias_pick_rows(scene.sky_marg_rows, r3[1], zero, h_f)
    r_marg = scene.sky_marg_rows[row]  # picked row: [_, _, val, cond_int]
    v_pdf = r_marg[:, 2] / scene.sky_marginal_integral
    cond_integral = r_marg[:, 3]

    w_f = scene.sky_cond_n.astype(jnp.float32)
    base = row * scene.sky_cond_n
    col, u = _alias_pick_rows(scene.sky_cond_rows, r3[0], base, w_f)
    u_pdf = scene.sky_cond_rows[base + col][:, 2] / cond_integral

    theta = v * PI
    sint = jnp.sin(theta)
    phi = u * TWO_PI
    pdf = jnp.where(
        (u_pdf * v_pdf > 0.0) & (sint != 0.0),
        u_pdf * v_pdf / (2.0 * PI * PI * sint),
        0.0,
    )
    wl = (sint * jnp.cos(phi), sint * jnp.sin(phi), jnp.cos(theta))
    m = scene.sky_obj2world
    wiw = vec.normalize((
        m[0, 0] * wl[0] + m[0, 1] * wl[1] + m[0, 2] * wl[2],
        m[1, 0] * wl[0] + m[1, 1] * wl[1] + m[1, 2] * wl[2],
        m[2, 0] * wl[0] + m[2, 1] * wl[1] + m[2, 2] * wl[2],
    ))
    dist = jnp.broadcast_to(2.0 * scene.scene_radius + 1.0,
                            position[0].shape)
    tex = jnp.broadcast_to(scene.sky_tex, pdf.shape)
    r, g, b = tx.sample_rgb_v(scene.atlas, tex, u, v)
    s = scene.sky_intensity
    emission = ex(spectra.from_illuminant_color_t(r * s, g * s, b * s))
    return (ex(wiw[0]), ex(wiw[1]), ex(wiw[2])), dist, emission, ex(pdf)


def sample_light(scene, light_idx, position, r3, expand=None):
    """Samples the picked light toward ``position`` (a (x,y,z) tuple).

    Returns (wiW tuple, distance (R,), emission (16, R), pdf (R,)) —
    the SampledLight struct of raytrace_commons.glsl:52-60.
    ``r3``: tuple of three uniforms at CHAIN width C, which is the lane
    count R unless coherent sampling shares chains across lanes (then
    C < R and ``expand`` maps chain-width arrays to lane width). All
    draw-driven table gathers run at chain width — under coherent modes
    that collapses them from one row per lane to one per chain, ~20 ns
    per row on TPU regardless of width — and results are expanded by a
    static block broadcast only where per-lane data mixes in. Only the
    light types in ``scene.light_kinds`` (static) are evaluated — the
    wavefront analogue of the SBT running exactly one light callable
    per ray."""
    ex = expand if expand is not None else (lambda a: a)
    ls = scene.light_scalars[light_idx]  # (C, 8) row gather
    fns = {
        TYPE_OMNI: lambda: _omni(scene, light_idx, ls, position, ex),
        TYPE_SUN: lambda: _sun(scene, light_idx, ls, position, ex),
        TYPE_AREA: lambda: _area(scene, light_idx, ls, position, r3, ex),
        TYPE_SKY: lambda: _sky(scene, light_idx, position, r3, ex),
    }
    present = list(scene.light_kinds) or [TYPE_OMNI]
    ltype = ls[:, LS_TYPE].astype(jnp.int32)
    wiw, dist, emission, pdf = fns[present[0]]()
    for t in present[1:]:
        r = fns[t]()
        sel = ex(ltype == t)
        wiw = vec.where(sel, r[0], wiw)
        dist = jnp.where(sel, r[1], dist)
        emission = jnp.where(sel, r[2], emission)
        pdf = jnp.where(sel, r[3], pdf)
    return wiw, dist, emission, pdf