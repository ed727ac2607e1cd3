"""Spectral algebra on device: (..., 16) float32 arrays.

JAX port of the reference's spectral pipeline
(``lib/src/shaders/spectrum.glsl``, ``lib/src/geometry/spectrum.rs``):
Smits-style RGB->spectrum with separate reflectance/illuminant bases,
CIE XYZ integration, luminance, and the XYZ->linear-RGB matrix. The tables
are shared with the CPU core (:mod:`glaze_tpu.core.spectrum`) so host and
device agree bit-for-bit.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from glaze_tpu.core import spectrum as _cpu

SAMPLES = _cpu.SAMPLES
INVY_SUM = np.float32(_cpu.INVY_SUM)

CIE_X = np.asarray(_cpu.CIE_X)
CIE_Y = np.asarray(_cpu.CIE_Y)
CIE_Z = np.asarray(_cpu.CIE_Z)
SURFACE_BASIS = np.asarray(_cpu.SURFACE_BASIS)  # (7, 16): white,c,m,y,r,g,b
ILLUMINANT_BASIS = np.asarray(_cpu.ILLUMINANT_BASIS)
SURFACE_SCALE = np.float32(_cpu.SURFACE_SCALE)
ILLUMINANT_SCALE = np.float32(_cpu.ILLUMINANT_SCALE)

# XYZ -> linear sRGB (spectrum.glsl:74-81)
XYZ_TO_RGB = np.asarray(
    np.array(
        [
            [3.240479, -1.537150, -0.498535],
            [-0.969256, 1.875991, 0.041556],
            [0.055648, -0.204043, 1.057311],
        ],
        dtype=np.float32,
    )
)


def black(shape=()):
    return jnp.zeros(shape + (SAMPLES,), jnp.float32)


def one(shape=()):
    return jnp.ones(shape + (SAMPLES,), jnp.float32)


def uniform(f):
    """spectrum_uniform: broadcast a scalar (...,) to a flat spectrum (..., 16)."""
    return jnp.broadcast_to(jnp.asarray(f, jnp.float32)[..., None],
                            jnp.shape(f) + (SAMPLES,))


def from_rgb(rgb, is_light: bool):
    """Smits RGB->spectrum (spectrum.glsl:155-221), batched over (..., 3).

    The min(r,g,b) channel picks the basis decomposition branch; result is
    clamped to [0, 1] like the reference.
    """
    rgb = jnp.asarray(rgb, jnp.float32)
    basis = ILLUMINANT_BASIS if is_light else SURFACE_BASIS
    white, cyan, magenta, yellow, red, green, blue = (basis[i] for i in range(7))
    r, g, b = rgb[..., 0:1], rgb[..., 1:2], rgb[..., 2:3]

    m1 = (r <= g) & (r <= b)
    m1a = g <= b
    branch1 = r * white + jnp.where(
        m1a, (g - r) * cyan + (b - g) * blue, (b - r) * cyan + (g - b) * green
    )
    m2 = (g <= r) & (g <= b)
    m2a = r <= b
    branch2 = g * white + jnp.where(
        m2a, (r - g) * magenta + (b - r) * blue, (b - g) * magenta + (r - b) * red
    )
    m3a = r <= g
    branch3 = b * white + jnp.where(
        m3a, (r - b) * yellow + (g - r) * green, (g - b) * yellow + (r - g) * red
    )
    res = jnp.where(m1, branch1, jnp.where(m2, branch2, branch3))
    scale = ILLUMINANT_SCALE if is_light else SURFACE_SCALE
    return jnp.clip(res * scale, 0.0, 1.0)


def from_surface_color(rgb):
    return from_rgb(rgb, is_light=False)


def from_illuminant_color(rgb):
    return from_rgb(rgb, is_light=True)


def to_xyz(sp):
    """(..., 16) -> (..., 3) XYZ; note: NOT scaled by 100 (spectrum.glsl:50-72)."""
    x = jnp.sum(sp * CIE_X, axis=-1)
    y = jnp.sum(sp * CIE_Y, axis=-1)
    z = jnp.sum(sp * CIE_Z, axis=-1)
    return jnp.stack([x, y, z], axis=-1) * INVY_SUM


def luminance(sp):
    """Y integral in [0, ...) (spectrum.glsl:39-48); unclamped like GLSL."""
    return jnp.sum(sp * CIE_Y, axis=-1) * INVY_SUM


def to_rgb(sp):
    """(..., 16) -> (..., 3) linear RGB (spectrum.glsl:83-86)."""
    return to_xyz(sp) @ XYZ_TO_RGB.T


# ---------------------------------------------------------------------------
# Transposed (16, R) layout — the TPU-native form: spectral bins on the
# sublane axis, rays on the 128-wide lane axis. All hot-path shading uses
# these; the (..., 16) forms above remain for host-side/test use.
# ---------------------------------------------------------------------------


def black_t(r):
    return jnp.zeros((SAMPLES, r), jnp.float32)


def one_t(r):
    return jnp.ones((SAMPLES, r), jnp.float32)


def uniform_t(f):
    """(R,) scalar field -> flat spectrum (16, R)."""
    return jnp.broadcast_to(f[None, :], (SAMPLES,) + f.shape)


def from_rgb_t(r, g, b, is_light: bool):
    """Smits RGB->spectrum on (R,) channels -> (16, R)."""
    basis = ILLUMINANT_BASIS if is_light else SURFACE_BASIS
    col = lambda i: basis[i][:, None]  # (16, 1)
    white, cyan, magenta, yellow, red, green, blue = (col(i) for i in range(7))

    m1 = (r <= g) & (r <= b)
    m1a = g <= b
    branch1 = r * white + jnp.where(
        m1a, (g - r) * cyan + (b - g) * blue, (b - r) * cyan + (g - b) * green
    )
    m2 = (g <= r) & (g <= b)
    m2a = r <= b
    branch2 = g * white + jnp.where(
        m2a, (r - g) * magenta + (b - r) * blue, (b - g) * magenta + (r - b) * red
    )
    m3a = r <= g
    branch3 = b * white + jnp.where(
        m3a, (r - b) * yellow + (g - r) * green, (g - b) * yellow + (r - g) * red
    )
    res = jnp.where(m1, branch1, jnp.where(m2, branch2, branch3))
    scale = ILLUMINANT_SCALE if is_light else SURFACE_SCALE
    return jnp.clip(res * scale, 0.0, 1.0)


def from_surface_color_t(r, g, b):
    return from_rgb_t(r, g, b, is_light=False)


def from_illuminant_color_t(r, g, b):
    return from_rgb_t(r, g, b, is_light=True)


def to_xyz_t(sp):
    """(16, R) -> 3x(R,)."""
    x = jnp.sum(sp * CIE_X[:, None], axis=0)
    y = jnp.sum(sp * CIE_Y[:, None], axis=0)
    z = jnp.sum(sp * CIE_Z[:, None], axis=0)
    return x * INVY_SUM, y * INVY_SUM, z * INVY_SUM


def luminance_t(sp):
    """(16, R) -> (R,), unclamped like GLSL."""
    return jnp.sum(sp * CIE_Y[:, None], axis=0) * INVY_SUM


def to_rgb_t(sp):
    """(16, R) -> 3x(R,) linear RGB."""
    x, y, z = to_xyz_t(sp)
    m = XYZ_TO_RGB
    r = m[0, 0] * x + m[0, 1] * y + m[0, 2] * z
    g = m[1, 0] * x + m[1, 1] * y + m[1, 2] * z
    b = m[2, 0] * x + m[2, 1] * y + m[2, 2] * z
    return r, g, b
