"""Counter-free PCG-style hash RNG, vectorized.

Reproduces the reference's RNG chain (``lib/src/shaders/random.glsl:7-58``):
a PCG output-permutation hash over a mutable uint32 state, seeded per
(frame seed, pixel) and advanced once per draw. Uniform floats use the
mantissa trick: OR random mantissa bits into the exponent of 1.0 and
subtract 1.0, yielding [0, 1).

All functions are shape-polymorphic: ``state`` can be any uint32 array and
every call advances each lane independently, exactly like one GPU thread's
``inout uint`` state.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# numpy scalars, NOT jnp: a module-level jnp constant commits device
# buffers at import time, which initializes the JAX backend and breaks
# jax.distributed.initialize() ordering for multi-host runs (it must be
# called before any backend use). Mixed numpy-scalar/jnp-array uint32
# ops preserve dtype, so these behave identically inside traces.
MANTISSA_MASK = np.uint32(0x007FFFFF)
FLOAT_ONE = np.uint32(0x3F800000)


def hash_u32(seed):
    """PCG hash (random.glsl:7-12)."""
    seed = seed.astype(jnp.uint32)
    state = seed * jnp.uint32(747796405) + jnp.uint32(2891336453)
    word = ((state >> ((state >> jnp.uint32(28)) + jnp.uint32(4))) ^ state) * jnp.uint32(277803737)
    return (word >> jnp.uint32(22)) ^ word


def srand_f32x3(a, b, c):
    """Seed from three floats (random.glsl:36-42): hash(x ^ hash(y ^ hash(z)))."""
    x = _float_bits(a)
    y = _float_bits(b)
    z = _float_bits(c)
    return hash_u32(x ^ hash_u32(y ^ hash_u32(z)))


def _float_bits(v):
    return jnp.asarray(v, jnp.float32).view(jnp.uint32)


def next_u32(state):
    """Advance the state; returns (new_state, random uint32)."""
    new = hash_u32(state)
    return new, new


def next_f32(state):
    """Advance the state; returns (new_state, uniform float32 in [0, 1))."""
    state, bits = next_u32(state)
    flt = (FLOAT_ONE | (bits & MANTISSA_MASK)).view(jnp.float32)
    return state, flt - jnp.float32(1.0)


def next_f32x2(state):
    state, a = next_f32(state)
    state, b = next_f32(state)
    return state, jnp.stack([a, b], axis=-1)


def next_f32x3(state):
    state, a = next_f32(state)
    state, b = next_f32(state)
    state, c = next_f32(state)
    return state, jnp.stack([a, b, c], axis=-1)
