"""Microbench: the fat-drain dot_general's cost vs shape and precision.

Times ONLY a chain of (F, W) @ (F, 128) dot_generals (the fat drain's
contraction, traverse_fat._pair) inside one Pallas kernel, W = 4*T*BATCH
lanes, with the resolve reduced to a single accumulate (so the dot
dominates). Answers, on hardware:

  1. does a wider dot (BATCH leaf slabs per call) amortize fixed cost —
     i.e. is cyc/(row,leaf) lower at W=2048 than at W=512?
  2. how do HIGHEST (6 bf16 passes) / DEFAULT (1 pass) really scale?
  3. a manual 3-pass hi/lo split at DEFAULT precision vs HIGHEST.

Usage: python tools/bench_dot.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

F = 16
CLOCK_GHZ = 0.94  # v5e


def run_case(T, batch, precision, split3, reps=4096):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W = 4 * T * batch
    dn = (((0,), (0,)), ((), ()))
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "default": jax.lax.Precision.DEFAULT}[precision]

    def kernel(mat_ref, feat_ref, out_ref):
        acc0 = jnp.zeros((8, 128), jnp.float32)

        def body(k, acc):
            # NON-LINEAR data dependence: dot(mat, f(acc)) cannot be
            # strength-reduced to hoisted dots (an affine f CAN — the
            # first version of this bench measured a hoisted loop)
            f = jnp.where(feat_ref[:] > acc[0, 0], feat_ref[:],
                          -feat_ref[:])
            if split3:
                mh = mat_ref[:].astype(jnp.bfloat16)
                ml = (mat_ref[:] - mh.astype(jnp.float32)).astype(
                    jnp.bfloat16)
                fh = f.astype(jnp.bfloat16)
                fl = (f - fh.astype(jnp.float32)).astype(jnp.bfloat16)
                out = jax.lax.dot_general(
                    mh, fh, dn, precision=jax.lax.Precision.DEFAULT,
                    preferred_element_type=jnp.float32)
                out += jax.lax.dot_general(
                    mh, fl, dn, precision=jax.lax.Precision.DEFAULT,
                    preferred_element_type=jnp.float32)
                out += jax.lax.dot_general(
                    ml, fh, dn, precision=jax.lax.Precision.DEFAULT,
                    preferred_element_type=jnp.float32)
            else:
                out = jax.lax.dot_general(
                    mat_ref[:], f, dn, precision=prec,
                    preferred_element_type=jnp.float32)
            # minimal resolve: fold the output into the carry
            return acc + jnp.sum(out.reshape(-1, 8, 128), axis=0)

        out_ref[:] = jax.lax.fori_loop(0, reps, body, acc0)

    mat = np.random.default_rng(0).normal(size=(F, W)).astype(np.float32)
    feat = np.random.default_rng(1).normal(size=(F, 128)).astype(np.float32)

    fn = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )
    fn = jax.jit(fn)
    import jax as _j
    o = fn(jnp.asarray(mat), jnp.asarray(feat))
    _j.block_until_ready(o)
    best = float("inf")
    for k in range(3):
        m2 = jnp.asarray(mat + np.float32(1e-6 * (k + 1)))
        t0 = time.perf_counter()
        o = fn(m2, jnp.asarray(feat))
        _j.block_until_ready(o)
        best = min(best, time.perf_counter() - t0)
    cyc_dot = best * CLOCK_GHZ * 1e9 / reps
    pairs = batch
    print(f"T={T} batch={batch} prec={precision}"
          f"{' split3' if split3 else ''}: {best*1e3:.2f} ms/"
          f"{reps} dots -> {cyc_dot:.0f} cyc/dot, "
          f"{cyc_dot/pairs:.0f} cyc/(row,leaf)")


def main():
    for T, batch in [(128, 1), (128, 2), (128, 4), (64, 1), (64, 4),
                     (64, 8)]:
        for precision in ("highest", "default"):
            run_case(T, batch, precision, False)
        run_case(T, batch, "default", True)




def run_resolve_case(T, reps=4096, div_free=False):
    """Times dot + the FULL closest-hit resolve of traverse_fat._pair."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W = 4 * T
    dn = (((0,), (0,)), ((), ()))
    DET_EPS = 1e-12
    T_MIN = 1e-4

    def kernel(mat_ref, feat_ref, t_ref, tri_ref, u_ref, v_ref):
        t_ref[:] = jnp.full((8, 128), 1e30, jnp.float32)
        tri_ref[:] = jnp.full((8, 128), -1, jnp.int32)
        u_ref[:] = jnp.zeros((8, 128), jnp.float32)
        v_ref[:] = jnp.zeros((8, 128), jnp.float32)
        iota_t = jax.lax.broadcasted_iota(jnp.int32, (T, 128), 0)

        def body(k, carry):
            f = feat_ref[:] + carry
            out = jax.lax.dot_general(
                mat_ref[:], f, dn, precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            det = out[0 * T:1 * T]
            ud = out[1 * T:2 * T]
            vd = out[2 * T:3 * T]
            td = out[3 * T:4 * T]
            ok = jnp.abs(det) >= DET_EPS
            inv = jnp.where(ok, 1.0 / jnp.where(det == 0.0, 1.0, det), 0.0)
            t = td * inv
            base_valid = (ok & (ud * det >= 0.0) & (vd * det >= 0.0)
                          & ((ud + vd) * det <= det * det))
            tb = t_ref[0:1, :]
            valid = base_valid & (t > T_MIN) & (t < tb)
            tt = jnp.where(valid, t, jnp.inf)
            tmin = jnp.min(tt, axis=0, keepdims=True)
            widx = jnp.min(jnp.where(tt <= tmin, iota_t, T), axis=0,
                           keepdims=True)
            onehot = iota_t == widx
            uw = jnp.sum(jnp.where(onehot, ud * inv, 0.0), axis=0,
                         keepdims=True)
            vw = jnp.sum(jnp.where(onehot, vd * inv, 0.0), axis=0,
                         keepdims=True)
            better = tmin < tb
            t_ref[0:1, :] = jnp.where(better, tmin, tb)
            tri_ref[0:1, :] = jnp.where(better, widx, tri_ref[0:1, :])
            u_ref[0:1, :] = jnp.where(better, uw, u_ref[0:1, :])
            v_ref[0:1, :] = jnp.where(better, vw, v_ref[0:1, :])
            return carry + tmin[0, 0] * 1e-30

        jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    mat = np.random.default_rng(0).normal(size=(F, W)).astype(np.float32)
    feat = np.random.default_rng(1).normal(size=(F, 128)).astype(np.float32)
    fn = jax.jit(pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_shape=[jax.ShapeDtypeStruct((8, 128), jnp.float32),
                   jax.ShapeDtypeStruct((8, 128), jnp.int32),
                   jax.ShapeDtypeStruct((8, 128), jnp.float32),
                   jax.ShapeDtypeStruct((8, 128), jnp.float32)],
    ))
    o = fn(jnp.asarray(mat), jnp.asarray(feat))
    jax.block_until_ready(o)
    best = float("inf")
    for k in range(3):
        m2 = jnp.asarray(mat + np.float32(1e-6 * (k + 1)))
        t0 = time.perf_counter()
        o = fn(m2, jnp.asarray(feat))
        jax.block_until_ready(o)
        best = min(best, time.perf_counter() - t0)
    cyc = best * CLOCK_GHZ * 1e9 / reps
    print(f"T={T} FULL-RESOLVE: {best*1e3:.2f} ms/{reps} pairs -> "
          f"{cyc:.0f} cyc/(row,leaf)")


if __name__ == "__main__":
    if os.environ.get("BENCH_RESOLVE"):
        run_resolve_case(128)
        run_resolve_case(64)
    else:
        main()
