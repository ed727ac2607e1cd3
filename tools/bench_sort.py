"""Measures the on-chip cost of the ray-reordering machinery:
argsort of R int32 keys, row-gather permutation of an (R, 16) payload,
and row-scatter back. Timed as a chained lax.scan inside ONE executable
(the axon tunnel dedupes repeated identical dispatches).

Usage: python tools/bench_sort.py [R] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from glaze_tpu.utils import enable_compilation_cache

enable_compilation_cache()

R = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8


def timed(name, fn, *args):
    """The tunnel dedupes identical dispatches, so the timed call gets
    freshly-perturbed inputs (compile is warmed with the originals)."""
    fn_j = jax.jit(fn)
    out = jax.block_until_ready(fn_j(*args))  # compile
    perturbed = tuple(
        jax.tree.map(lambda x: x + np.asarray(1, x.dtype), a) for a in args
    )
    t0 = time.time()
    out = jax.block_until_ready(fn_j(*perturbed))
    dt = (time.time() - t0) / ITERS * 1000
    print(f"{name:28s}: {dt:8.2f} ms/iter")
    return out


def chain_argsort(keys):
    def body(k, _):
        p = jnp.argsort(k)
        # derive new keys from the output (prevents dedup/CSE)
        return (k + p.astype(jnp.int32)) & 0x3FFFFF, None

    out, _ = jax.lax.scan(body, keys, None, length=ITERS)
    return out


def chain_sort_pairs(keys, vals):
    def body(c, _):
        k, v = c
        k2, v2 = jax.lax.sort_key_val(k, v)
        return ((k2 + v2) & 0x3FFFFF, v2 + 1), None

    out, _ = jax.lax.scan(body, (keys, vals), None, length=ITERS)
    return out


def chain_gather(table, perm):
    def body(c, _):
        t, p = c
        g = t[p]  # (R, 16) row gather
        return (g + 1.0, (p + 1) % R), None

    out, _ = jax.lax.scan(body, (table, perm), None, length=ITERS)
    return out


def chain_scatter(table, perm):
    def body(c, _):
        t, p = c
        s = jnp.zeros_like(t).at[p].set(t)
        return (s + 1.0, (p + 1) % R), None

    out, _ = jax.lax.scan(body, (table, perm), None, length=ITERS)
    return out


def chain_gather1d(arrs, perm):
    """Permuting 12 separate (R,) arrays (the no-packing alternative)."""
    def body(c, _):
        xs, p = c
        xs = tuple(x[p] for x in xs)
        return (tuple(x + 1.0 for x in xs), (p + 1) % R), None

    out, _ = jax.lax.scan(body, (arrs, perm), None, length=ITERS)
    return out


def main():
    print(f"R={R}, iters={ITERS}, devices={jax.devices()}")
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 1 << 22, R, dtype=np.int32))
    vals = jnp.asarray(np.arange(R, dtype=np.int32))
    table = jnp.asarray(rng.random((R, 16), np.float32))
    perm = jnp.asarray(rng.permutation(R).astype(np.int32))
    arrs = tuple(jnp.asarray(rng.random(R, np.float32)) for _ in range(12))

    timed("argsort int32", chain_argsort, keys)
    timed("sort_key_val int32/int32", chain_sort_pairs, keys, vals)
    timed("row-gather (R,16)", chain_gather, table, perm)
    timed("row-scatter (R,16)", chain_scatter, table, perm)
    timed("12x 1d gather (R,)", chain_gather1d, arrs, perm)


if __name__ == "__main__":
    main()
