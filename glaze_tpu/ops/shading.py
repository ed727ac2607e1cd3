"""Shading-space orthonormal bases (JAX port of shading_space.glsl).

A shading space is the (s, t, n) orthonormal frame built from the surface
dpdu and shading normal; BSDFs work in this frame with n = +z.
Represented as a (..., 3, 3) array whose ROWS are s, t, n.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize(v, eps=0.0):
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(n, jnp.float32(1e-20) if eps == 0.0 else eps)


def new_shading_space(dpdu, normal):
    """(s, t, n) from dpdu Gram-Schmidt'd against the normal
    (shading_space.glsl:11-16). Returns (..., 3, 3) rows [s, t, n]."""
    s = normalize(dpdu - normal * jnp.sum(normal * dpdu, axis=-1, keepdims=True))
    t = jnp.cross(normal, s)
    return jnp.stack([s, t, normal], axis=-2)


def to_shading_space(w, frame):
    """World -> shading (shading_space.glsl:27-31): normalized dot products."""
    return normalize(jnp.einsum("...ij,...j->...i", frame, w))


def to_world_space(v, frame):
    """Shading -> world (shading_space.glsl:18-25), normalized.

    out = s*v.x + t*v.y + n*v.z = frame^T @ v with rows [s, t, n].
    """
    return normalize(jnp.einsum("...ji,...j->...i", frame, v))


def to_world_space_raw(v, frame):
    """Shading -> world without normalization (frame^T @ v)."""
    return jnp.einsum("...ji,...j->...i", frame, v)
