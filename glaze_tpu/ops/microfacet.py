"""Heitz GGX microfacet model (JAX port of lib/src/shaders/microfacets.glsl).

D, Lambda, G, G1, visible-normal sampling with the analytic isotropic P22
(Heitz & d'Eon supplemental algorithm 3), and the anisotropy remap. The pdf
deliberately keeps the reference's G1(wh) term (microfacets.glsl:96-101,
including its firefly-avoidance comment) so sample weights match.

All functions are batched: direction args are (..., 3), alphas (..., 2).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

PI = np.float32(3.1415926)
TWO_PI = np.float32(6.2831853)


def _checknan(x):
    return jnp.where(jnp.isnan(x), jnp.float32(0.0), x)


def _checkinf(x):
    return jnp.where(jnp.isinf(x), jnp.float32(0.0), x)


def to_anisotropic(a, anisotropy):
    """(alpha_x, alpha_y) from scalar roughness (microfacets.glsl:123-126)."""
    a = jnp.asarray(a, jnp.float32)
    return jnp.stack([a * (1.0 + anisotropy), a * (1.0 - anisotropy)], axis=-1)


def ggx_d(wh, a):
    """GGX normal distribution (microfacets.glsl:59-71)."""
    cost = wh[..., 2]
    cos2t = cost * cost
    cos4t = cos2t * cos2t
    sin2t = jnp.maximum(0.0, 1.0 - cos2t)
    tan2t = sin2t / cos2t
    cos2p = wh[..., 0] * wh[..., 0] / sin2t
    sin2p = wh[..., 1] * wh[..., 1] / sin2t
    ax, ay = a[..., 0], a[..., 1]
    eplus1 = 1.0 + (cos2p / (ax * ax) + sin2p / (ay * ay)) * tan2t
    d = 1.0 / (PI * ax * ay * cos4t * eplus1 * eplus1)
    return jnp.where(jnp.isinf(tan2t), jnp.float32(0.0), d)


def ggx_lambda(v, a):
    """Smith Lambda (microfacets.glsl:73-84)."""
    cost = v[..., 2]
    cos2t = cost * cost
    sin2t = jnp.maximum(0.0, 1.0 - cos2t)
    tan2t = sin2t / cos2t
    cos2p = jnp.maximum(0.0, v[..., 0] * v[..., 0] / sin2t)
    sin2p = jnp.maximum(0.0, v[..., 1] * v[..., 1] / sin2t)
    ax, ay = a[..., 0], a[..., 1]
    alpha2 = cos2p * ax * ax + sin2p * ay * ay
    lam = (-1.0 + jnp.sqrt(1.0 + tan2t * alpha2)) * 0.5
    return jnp.where(jnp.isinf(tan2t), jnp.float32(0.0), lam)


def ggx_g(wo, wi, a):
    return 1.0 / (1.0 + ggx_lambda(wo, a) + ggx_lambda(wi, a))


def ggx_g1(v, a):
    return 1.0 / (1.0 + ggx_lambda(v, a))


def ggx_pdf(d, a, wo, wh):
    """Sampling pdf. Keeps the reference's G1(wh) quirk
    (microfacets.glsl:96-101)."""
    dot_wowh = jnp.sum(wo * wh, axis=-1)
    return d * ggx_g1(wh, a) * jnp.abs(dot_wowh) / jnp.abs(wh[..., 2])


def _sample_p22(cost, rand, eps=1e-6):
    """Isotropic alpha=1 visible-slope sampling (microfacets.glsl:25-57)."""
    r0, r1 = rand[..., 0], rand[..., 1]
    # normal-incidence special case
    r = jnp.sqrt(r0 / (1.0 - r0))
    phi = TWO_PI * r1
    special = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)

    cos2t = cost * cost
    sin2t = jnp.maximum(0.0, 1.0 - cos2t)
    tan2t = _checkinf(sin2t / cos2t)
    tant = jnp.sqrt(tan2t)
    a2 = 1.0 / jnp.maximum(tan2t, 1e-20)
    g1 = 2.0 / (1.0 + jnp.sqrt(1.0 + 1.0 / a2))
    A = 2.0 * r0 / g1 - 1.0
    B = tant
    invA2m1 = 1.0 / (A * A - 1.0)
    sqrt_term = jnp.sqrt(jnp.maximum(0.0, B * B * invA2m1 * invA2m1 - (A * A - B * B) * invA2m1))
    sx1 = B * invA2m1 - sqrt_term
    sx2 = B * invA2m1 + sqrt_term
    sx = jnp.where((A < 0.0) | (sx2 > 1.0 / jnp.maximum(tant, 1e-20)), sx1, sx2)
    stepval = (r1 >= 0.5).astype(jnp.float32)
    s = 1.0 - 2.0 * stepval  # mix(1, -1, step)
    u = jnp.where(stepval > 0.5, 2.0 * (0.5 - r1), 2.0 * (r1 - 0.5))
    # rational fit of the inverse slope CDF
    z = (u * (u * (u * -0.3657289 + 0.7902350) - 0.4249658) + 0.0001529) / (
        u * (u * (u * (u * 0.1695078 - 0.3972035) - 0.2325005) + 1.0) - 0.5398259
    )
    sy = s * z * jnp.sqrt(1.0 + sx * sx)
    general = jnp.stack([sx, sy], axis=-1)
    return jnp.where((cost > 0.999)[..., None], special, general)


def ggx_sample_wh(wo, rand, a):
    """Visible-normal sampling (microfacets.glsl:104-121): stretch, sample
    P22, rotate, unstretch. ``rand``: (..., 2); returns unnormalized wh."""
    flip = jnp.sign(wo[..., 2:3])
    wi = flip * wo
    ax, ay = a[..., 0], a[..., 1]
    stretched = jnp.stack([wi[..., 0] * ax, wi[..., 1] * ay, wi[..., 2]], axis=-1)
    stretched = stretched / jnp.linalg.norm(stretched, axis=-1, keepdims=True)
    cost = stretched[..., 2]
    slope = _sample_p22(cost, rand)
    cos2t = cost * cost
    sin2t = jnp.maximum(0.0, 1.0 - cos2t)
    # NOTE: sqrt loses the sign of cos/sin phi; kept to match the reference.
    cosp = jnp.sqrt(stretched[..., 0] * stretched[..., 0] / sin2t)
    sinp = jnp.sqrt(stretched[..., 1] * stretched[..., 1] / sin2t)
    sx = cosp * slope[..., 0] - sinp * slope[..., 1]
    sy = sinp * slope[..., 0] + cosp * slope[..., 1]
    wh = jnp.stack([-ax * sx, -ay * sy, jnp.ones_like(sx)], axis=-1)
    wh = wh / jnp.linalg.norm(wh, axis=-1, keepdims=True)
    return flip * wh


# ---------------------------------------------------------------------------
# SoA layout: directions are (x, y, z) tuples of (R,), alpha is (ax, ay).
# ---------------------------------------------------------------------------


def ggx_d_v(wh, ax, ay):
    cost = wh[2]
    cos2t = cost * cost
    cos4t = cos2t * cos2t
    sin2t = jnp.maximum(0.0, 1.0 - cos2t)
    tan2t = sin2t / cos2t
    cos2p = wh[0] * wh[0] / sin2t
    sin2p = wh[1] * wh[1] / sin2t
    eplus1 = 1.0 + (cos2p / (ax * ax) + sin2p / (ay * ay)) * tan2t
    d = 1.0 / (PI * ax * ay * cos4t * eplus1 * eplus1)
    return jnp.where(jnp.isinf(tan2t), jnp.float32(0.0), d)


def ggx_lambda_v(v, ax, ay):
    cost = v[2]
    cos2t = cost * cost
    sin2t = jnp.maximum(0.0, 1.0 - cos2t)
    tan2t = sin2t / cos2t
    cos2p = jnp.maximum(0.0, v[0] * v[0] / sin2t)
    sin2p = jnp.maximum(0.0, v[1] * v[1] / sin2t)
    alpha2 = cos2p * ax * ax + sin2p * ay * ay
    lam = (-1.0 + jnp.sqrt(1.0 + tan2t * alpha2)) * 0.5
    return jnp.where(jnp.isinf(tan2t), jnp.float32(0.0), lam)


def ggx_g_v(wo, wi, ax, ay):
    return 1.0 / (1.0 + ggx_lambda_v(wo, ax, ay) + ggx_lambda_v(wi, ax, ay))


def ggx_g1_v(v, ax, ay):
    return 1.0 / (1.0 + ggx_lambda_v(v, ax, ay))


def ggx_pdf_v(d, ax, ay, wo, wh):
    """Keeps the reference's G1(wh) quirk (microfacets.glsl:96-101)."""
    dot_wowh = wo[0] * wh[0] + wo[1] * wh[1] + wo[2] * wh[2]
    return d * ggx_g1_v(wh, ax, ay) * jnp.abs(dot_wowh) / jnp.abs(wh[2])


def _sample_p22_v(cost, r0, r1):
    """SoA isotropic visible-slope sampling -> (sx, sy) tuple of (R,)."""
    r = jnp.sqrt(r0 / (1.0 - r0))
    phi = TWO_PI * r1
    special_x = r * jnp.cos(phi)
    special_y = r * jnp.sin(phi)

    cos2t = cost * cost
    sin2t = jnp.maximum(0.0, 1.0 - cos2t)
    tan2t = _checkinf(sin2t / cos2t)
    tant = jnp.sqrt(tan2t)
    a2 = 1.0 / jnp.maximum(tan2t, 1e-20)
    g1 = 2.0 / (1.0 + jnp.sqrt(1.0 + 1.0 / a2))
    A = 2.0 * r0 / g1 - 1.0
    B = tant
    invA2m1 = 1.0 / (A * A - 1.0)
    sqrt_term = jnp.sqrt(
        jnp.maximum(0.0, B * B * invA2m1 * invA2m1 - (A * A - B * B) * invA2m1)
    )
    sx1 = B * invA2m1 - sqrt_term
    sx2 = B * invA2m1 + sqrt_term
    sx = jnp.where((A < 0.0) | (sx2 > 1.0 / jnp.maximum(tant, 1e-20)), sx1, sx2)
    stepval = (r1 >= 0.5).astype(jnp.float32)
    s = 1.0 - 2.0 * stepval
    u = jnp.where(stepval > 0.5, 2.0 * (0.5 - r1), 2.0 * (r1 - 0.5))
    z = (u * (u * (u * -0.3657289 + 0.7902350) - 0.4249658) + 0.0001529) / (
        u * (u * (u * (u * 0.1695078 - 0.3972035) - 0.2325005) + 1.0) - 0.5398259
    )
    sy = s * z * jnp.sqrt(1.0 + sx * sx)
    special = cost > 0.999
    return (
        jnp.where(special, special_x, sx),
        jnp.where(special, special_y, sy),
    )


def ggx_sample_wh_v(wo, r0, r1, ax, ay):
    """SoA visible-normal sampling; returns a normalized (x, y, z) tuple."""
    from glaze_tpu.ops import vec

    flip = jnp.sign(wo[2])
    wi = vec.scale(wo, flip)
    stretched = vec.normalize((wi[0] * ax, wi[1] * ay, wi[2]))
    cost = stretched[2]
    sx0, sy0 = _sample_p22_v(cost, r0, r1)
    cos2t = cost * cost
    sin2t = jnp.maximum(0.0, 1.0 - cos2t)
    # NOTE: sqrt loses the sign of cos/sin phi; kept to match the reference.
    cosp = jnp.sqrt(stretched[0] * stretched[0] / sin2t)
    sinp = jnp.sqrt(stretched[1] * stretched[1] / sin2t)
    sx = cosp * sx0 - sinp * sy0
    sy = sinp * sx0 + cosp * sy0
    wh = vec.normalize((-ax * sx, -ay * sy, jnp.ones_like(sx)))
    return vec.scale(wh, flip)
