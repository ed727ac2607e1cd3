"""Owen-scrambled Sobol (0,2)-sequence, vectorized for the wavefront.

The reference samples every dimension with a plain PCG hash chain
(``lib/src/shaders/random.glsl:7-12``) — pure white noise. Replacing the
dimensions that matter most (the per-pixel sub-pixel jitter, and
optionally the per-bounce 2D decisions) with a low-discrepancy sequence
is a classic multi-x lever on MSE-at-fixed-time: the estimator's mean is
unchanged (every Owen-scrambled Sobol point is uniformly distributed
marginally), only the JOINT distribution of a pixel's successive samples
changes — N stratified samples cover the domain with O(log N / N) star
discrepancy instead of O(sqrt(1/N)) random dispersion.

Construction (Burley, "Practical Hash-based Owen Scrambling", JCGT
2020): the i-th point of pixel p in dimension pair d is

    j   = nested_uniform_scramble(i,  seed(p, d, "shuffle"))
    x   = sobol_dim1(j)   --  van der Corput, reversed bits
    y   = sobol_dim2(j)   --  Pascal-matrix Sobol direction numbers
    u,v = nested_uniform_scramble(x|y, seed(p, d, axis))  *  2^-32

where ``nested_uniform_scramble`` is a base-2 Owen scramble implemented
as a Laine-Karras style hash permutation on reversed bits: flipping
decisions at every level of the binary tree depend only on the path to
the root, which preserves all (0,2) stratification guarantees while
decorrelating pixels (each pixel gets an independently shuffled,
independently scrambled sequence — no structured aliasing between
neighbors).

Everything is elementwise uint32 math over (P,) lanes — no tables, no
gathers — so the whole sampler fuses into the launch like the PCG chain
it replaces. Sobol dim 2 is the only matrix dimension used: higher path
dimensions are "padded" with independently seeded 2D pairs per
(bounce, slot), the standard practice (pbrt's sobol02 / Stratified
padding) that keeps the per-draw cost flat however deep the path gets.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Sobol direction numbers, dimension 2 (primitive polynomial x+1):
# v[0] = 1000...0b, v[k] = v[k-1] ^ (v[k-1] >> 1) — the Pascal matrix
# mod 2. numpy constants (not jnp) keep the module backend-pure.
_V2 = np.empty(32, np.uint32)
_V2[0] = np.uint32(0x80000000)
for _k in range(1, 32):
    _V2[_k] = _V2[_k - 1] ^ (_V2[_k - 1] >> np.uint32(1))
_V2.setflags(write=False)


def reverse_bits(x):
    """Bit-reverse each uint32 lane (O(log n) swaps)."""
    x = x.astype(jnp.uint32)
    x = ((x & jnp.uint32(0x55555555)) << 1) | ((x >> 1) & jnp.uint32(0x55555555))
    x = ((x & jnp.uint32(0x33333333)) << 2) | ((x >> 2) & jnp.uint32(0x33333333))
    x = ((x & jnp.uint32(0x0F0F0F0F)) << 4) | ((x >> 4) & jnp.uint32(0x0F0F0F0F))
    x = ((x & jnp.uint32(0x00FF00FF)) << 8) | ((x >> 8) & jnp.uint32(0x00FF00FF))
    return (x << 16) | (x >> 16)


def _laine_karras(x, seed):
    """Hash permutation whose bit k depends only on bits 0..k-1 (after
    the caller's bit reversal: on the MORE significant bits) — i.e. a
    valid per-level Owen flip (Laine & Karras 2011 via Burley 2020)."""
    x = x + seed
    x = x ^ (x * jnp.uint32(0x6C50B47C))
    x = x ^ (x * jnp.uint32(0xB82F1E52))
    x = x ^ (x * jnp.uint32(0xC7AFE638))
    x = x ^ (x * jnp.uint32(0x8D22F6E6))
    return x


def nested_uniform_scramble(x, seed):
    """Base-2 Owen scramble of a uint32 (bits = binary-tree path)."""
    return reverse_bits(_laine_karras(reverse_bits(x), seed))


def _hash(x):
    """Finalizer-quality uint32 hash (for deriving independent seeds)."""
    x = x.astype(jnp.uint32) if hasattr(x, "astype") else jnp.uint32(x)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def seed_keys(pixel_key, domain):
    """(shuffle, owen_u, owen_v) seeds for one sample domain of a pixel.

    ``pixel_key``: uint32 lane array identifying the pixel (and the
    render — mix the renderer's base seed in before calling);
    ``domain``: int or uint32 array distinguishing sample dimensions
    (0 = jitter, 1 + 9*bounce + slot = path decisions — per-lane
    arrays support lanes at different bounce depths in one launch)."""
    d = (jnp.uint32(domain) if isinstance(domain, (int, np.integer))
         else domain.astype(jnp.uint32))
    base = _hash(pixel_key ^ (jnp.uint32(0x9E3779B9) * (d + jnp.uint32(1))))
    return base, _hash(base ^ jnp.uint32(0x85EBCA6B)), \
        _hash(base ^ jnp.uint32(0xC2B2AE35))


_INV32 = np.float32(2.3283064365386963e-10)  # 2^-32
# uint32 * 2^-32 in float32 ROUNDS: lanes >= 0xFFFFFF80 land on exactly
# 1.0, violating the [0, 1) contract (the ld jitter would bleed into the
# neighboring pixel and 1.0 draws reach light/BSDF sampling). Clamp to
# one-minus-epsilon as pbrt does.
_ONE_MINUS_EPS = np.float32(np.nextafter(np.float32(1.0), np.float32(0.0)))


def _to_unit(x):
    return jnp.minimum(x.astype(jnp.float32) * _INV32, _ONE_MINUS_EPS)


def sobol02(index, pixel_key, domain: int):
    """The ``index``-th 2D sample of ``pixel_key``'s ``domain`` stream.

    Returns (u, v) float32 in [0, 1). ``index`` uint32 (per lane);
    pixels with different keys get independently shuffled+scrambled
    sequences; one pixel's stream over index = 0, 1, 2, ... is a
    (0,2)-sequence: every prefix of 2^k samples is stratified on every
    elementary interval — in particular the first 4 samples land in
    different quadrants, the first 16 in different 4x4 cells, etc."""
    s_shuf, s_u, s_v = seed_keys(pixel_key, domain)
    j = nested_uniform_scramble(index.astype(jnp.uint32), s_shuf)
    x = reverse_bits(j)  # Sobol dim 1 (van der Corput)
    y = jnp.zeros_like(j)
    for k in range(32):  # Sobol dim 2: XOR direction numbers by index bits
        y = y ^ jnp.where((j >> k) & 1, jnp.uint32(_V2[k]), jnp.uint32(0))
    u = nested_uniform_scramble(x, s_u)
    v = nested_uniform_scramble(y, s_v)
    return _to_unit(u), _to_unit(v)


def sobol1(index, pixel_key, domain: int):
    """1D stream: Owen-scrambled van der Corput (for single draws like
    the light pick or the Russian-roulette roll)."""
    s_shuf, s_u, _ = seed_keys(pixel_key, domain)
    j = nested_uniform_scramble(index.astype(jnp.uint32), s_shuf)
    u = nested_uniform_scramble(reverse_bits(j), s_u)
    return _to_unit(u)
