"""Structure-of-arrays 3-vectors: tuples of (R,) components.

TPU VPU lanes run along the ray axis; an (R, 3) array wastes 125/128 lanes
of every vreg (measured ~40x slowdown on elementwise math). All hot-path
geometry therefore uses ``(x, y, z)`` tuples of (R,) float32 arrays.
"""

from __future__ import annotations

import jax.numpy as jnp


def v3(x, y, z):
    return (x, y, z)


def splat(c, shape):
    """Constant vector broadcast to (R,) components."""
    return tuple(jnp.full(shape, v, jnp.float32) for v in c)


def from_rows(a):
    """(R, 3) -> tuple of (R,). Boundary conversion only."""
    return (a[..., 0], a[..., 1], a[..., 2])


def to_rows(v):
    """tuple of (R,) -> (R, 3). Boundary conversion only."""
    return jnp.stack(v, axis=-1)


def add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def neg(a):
    return (-a[0], -a[1], -a[2])


def scale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def mul(a, b):
    return (a[0] * b[0], a[1] * b[1], a[2] * b[2])


def dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def length(a):
    return jnp.sqrt(dot(a, a))


def normalize(a, eps=1e-20):
    inv = 1.0 / jnp.maximum(length(a), eps)
    return scale(a, inv)


def where(mask, a, b):
    return tuple(jnp.where(mask, ai, bi) for ai, bi in zip(a, b))


def sign(s):
    return jnp.sign(s)


def reflect(i, n):
    """GLSL reflect: i - 2 dot(n,i) n."""
    d = dot(n, i)
    return sub(i, scale(n, 2.0 * d))


def refract(i, n, eta):
    """GLSL refract; returns the zero vector on total internal reflection."""
    ndi = dot(n, i)
    k = 1.0 - eta * eta * (1.0 - ndi * ndi)
    ok = k >= 0.0
    coef = eta * ndi + jnp.sqrt(jnp.maximum(k, 0.0))
    r = sub(scale(i, eta), scale(n, coef))
    zero = jnp.zeros_like(r[0])
    return where(ok, r, (zero, zero, zero))
