"""Fresnel reflectance (JAX port of lib/src/shaders/fresnel.glsl)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

DEFAULT_IOR = np.float32(1.000293)  # constants.glsl:8


def fresnel_conductor(cosin, ior, ior2abs2):
    """Spectral conductor Fresnel (fresnel.glsl:7-18).

    ``cosin``: (...,) cosine at the interface; ``ior``: (..., 16) spectral
    eta; ``ior2abs2``: (..., 16) precomputed eta^2 + k^2 (the reference
    precomputes this on upload, scene.rs:1834-1836).
    """
    cosin = jnp.asarray(cosin, jnp.float32)[..., None]
    cosin2 = cosin * cosin
    etacosin2 = ior * (cosin * 2.0)
    etacosin2plus = etacosin2 + cosin2
    etacosin2plusplus = etacosin2 + 1.0
    rperpsq = (ior2abs2 - etacosin2plus) / (ior2abs2 + etacosin2plus)
    tmp = ior2abs2 * cosin2
    rparsq = (tmp - etacosin2plusplus) / (tmp + etacosin2plusplus)
    return (rperpsq + rparsq) * 0.5


def fresnel_conductor_t(cosin, ior, ior2abs2):
    """Transposed layout: cosin (R,), ior/ior2abs2 (16, R) -> (16, R)."""
    cosin2 = cosin * cosin
    etacosin2 = ior * (cosin * 2.0)
    etacosin2plus = etacosin2 + cosin2
    etacosin2plusplus = etacosin2 + 1.0
    rperpsq = (ior2abs2 - etacosin2plus) / (ior2abs2 + etacosin2plus)
    tmp = ior2abs2 * cosin2
    rparsq = (tmp - etacosin2plusplus) / (tmp + etacosin2plusplus)
    return (rperpsq + rparsq) * 0.5


def fresnel_dielectric(costi, etai, etat):
    """Scalar dielectric Fresnel (fresnel.glsl:20-37), batched.

    Returns 1.0 on total internal reflection.
    """
    costi = jnp.asarray(costi, jnp.float32)
    sin2ti = jnp.maximum(0.0, 1.0 - costi * costi)
    sin2tt = (etai * etai) / (etat * etat) * sin2ti
    costt = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2tt))
    etatcostt = etat * costt
    etatcosti = etat * costi
    etaicosti = etai * costi
    etaicostt = etai * costt
    rparl = (etatcosti - etaicostt) / (etatcosti + etaicostt)
    rperp = (etaicosti - etatcostt) / (etaicosti + etatcostt)
    f = (rparl * rparl + rperp * rperp) * 0.5
    return jnp.where(sin2tt >= 1.0, jnp.float32(1.0), f)
