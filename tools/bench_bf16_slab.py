"""Prices the bf16 AABB slab-test family (VERDICT r3 #4a).

The one reduced-precision experiment the round-3 ledger did NOT run:
the r3 DEFAULT-precision test was on the Möller-Trumbore dot inside the
fat-leaf drain (lost hits weakened t-caps), not on the WALK's slab
test. A conservative bf16 slab (bounds widened outward by directed
rounding; simulated visit inflation < 1% because node boxes overlap
far more than 3 ulps) is hit-exact, so the only question is THROUGHPUT:
does Mosaic execute bf16 elementwise VPU math at 2x f32 rate on this
chip? This microbenchmark answers exactly that with the production
slab-test op mix (6 mul + 6 sub + 6 min/max + 2 min/max + compares)
over resident VMEM blocks, timed at both dtypes.

Decision rule (PERF_LOG): the walk phase is a fraction of the closest
kernel (the drain dominates — leaf-size sweep r3); adopt bf16 slabs
only if the per-element rate is >= ~1.7x f32, else the family closes.

Run (TPU): python tools/bench_bf16_slab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS_F32 = 256     # (256, 128) f32 rays resident in VMEM
ITERS = 2048       # slab tests per kernel call per element
LANES = 128


def _make_kernel(dtype):
    import numpy as _np

    one = _np.dtype(dtype).type(1.0) if dtype != jnp.bfloat16 else None

    def kernel(o_ref, i_ref, n_ref, out_ref):
        ox = o_ref[:]
        ix = i_ref[:]
        one_ = jnp.ones((), dtype)
        t_cap = ox * one_  # register-resident running cap

        def body(k, carry):
            t_cap, acc = carry
            # per-iteration node "fields" from the small node table so
            # the loop cannot be hoisted: 6 scalars per visit
            row = n_ref[pl.ds(k % 64, 1), :]
            b = jnp.broadcast_to(row, ox.shape).astype(dtype)
            # production slab-test mix (_slab): 3 axes x (2 sub, 2 mul,
            # min+max), then 2 reduces + compares. Axis data reuses the
            # same registers the way the kernel's (8,128) blocks do.
            t0x = (b - ox) * ix
            t1x = (b + ox) * ix
            t0y = (b - ox * one_) * ix
            t1y = (b + ox * one_) * ix
            t0z = (b - ix) * ox
            t1z = (b + ix) * ox
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.minimum(t0z, t1z))
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.maximum(t0z, t1z))
            # boolean compares on PACKED bf16 don't lower in Mosaic
            # (arith.cmpf on vector<8x128x2xbf16> fails); keep min/max
            # in-dtype and do the two compares in f32 — the op mix
            # stays representative
            hit = (tn.astype(jnp.float32) <= tf.astype(jnp.float32)) \
                & (tf.astype(jnp.float32) >= 0)
            acc = acc + hit.astype(dtype)
            t_cap = jnp.where(hit, jnp.minimum(t_cap, tf), t_cap)
            return t_cap, acc

        t_cap, acc = jax.lax.fori_loop(
            0, ITERS, body, (t_cap, jnp.zeros_like(ox)))
        out_ref[:] = acc + t_cap

    return kernel


def run(dtype, rows):
    shape = (rows, LANES)
    o = jnp.asarray(np.random.default_rng(0).random(shape), dtype)
    i = jnp.asarray(np.random.default_rng(1).random(shape) + 0.5, dtype)
    nodes = jnp.asarray(np.random.default_rng(2).random((64, LANES)),
                        jnp.float32)

    fn = jax.jit(lambda o, i, n: pl.pallas_call(
        _make_kernel(dtype),
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(o, i, n))

    # warm + fresh inputs per timed call (the tunnel dedupes identical
    # executions)
    rng = np.random.default_rng(int.from_bytes(os.urandom(4), "little"))

    def once():
        eps = jnp.asarray(float(rng.random()) * 1e-3, dtype)
        t0 = time.perf_counter()
        out = fn(o + eps, i, nodes)
        np.asarray(jax.device_get(out[:1]))
        return time.perf_counter() - t0

    once()
    best = min(once() for _ in range(5))
    tests = rows * LANES * ITERS
    return best, tests / best / 1e9


def main():
    print(f"device: {jax.devices()[0]}")
    f32_t, f32_rate = run(jnp.float32, ROWS_F32)
    bf_t, bf_rate = run(jnp.bfloat16, ROWS_F32)
    # also bf16 at 2x rows = same BYTES as the f32 block
    bf2_t, bf2_rate = run(jnp.bfloat16, ROWS_F32 * 2)
    print(f"f32  ({ROWS_F32}x128): {f32_t*1e3:7.2f} ms  "
          f"{f32_rate:6.2f} Gtest/s")
    print(f"bf16 ({ROWS_F32}x128): {bf_t*1e3:7.2f} ms  "
          f"{bf_rate:6.2f} Gtest/s  ({bf_rate/f32_rate:.2f}x)")
    print(f"bf16 ({ROWS_F32*2}x128): {bf2_t*1e3:7.2f} ms  "
          f"{bf2_rate:6.2f} Gtest/s  ({bf2_rate/f32_rate:.2f}x)")
    verdict = ("ADOPT-CANDIDATE (wire conservative bf16 slabs)"
               if max(bf_rate, bf2_rate) >= 1.7 * f32_rate
               else "CLOSED: bf16 VPU math does not deliver ~2x here")
    print(verdict)


if __name__ == "__main__":
    main()
