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


# ---------------------------------------------------------------------------
# SoA layout: a frame is an (s, t, n) tuple of (x, y, z) tuples of (R,).
# ---------------------------------------------------------------------------


def new_shading_space_v(dpdu, normal):
    from glaze_tpu.ops import vec

    s = vec.normalize(vec.sub(dpdu, vec.scale(normal, vec.dot(normal, dpdu))))
    t = vec.cross(normal, s)
    return (s, t, normal)


def to_shading_space_v(w, frame):
    from glaze_tpu.ops import vec

    s, t, n = frame
    return vec.normalize((vec.dot(w, s), vec.dot(w, t), vec.dot(w, n)))


def to_world_space_v(v, frame):
    from glaze_tpu.ops import vec

    s, t, n = frame
    out = (
        s[0] * v[0] + t[0] * v[1] + n[0] * v[2],
        s[1] * v[0] + t[1] * v[1] + n[1] * v[2],
        s[2] * v[0] + t[2] * v[1] + n[2] * v[2],
    )
    return vec.normalize(out)
