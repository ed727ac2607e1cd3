"""Which table shapes gather fast on TPU? (262144,) indices into a ~200k
table shaped (T,), (T,1), (T,2), (T,8), plus the x[idx, c] element form."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from glaze_tpu.utils import enable_compilation_cache
enable_compilation_cache()

R, T = 262144, 196608
rng = np.random.default_rng(0)
idx0 = jnp.asarray(rng.integers(0, T, R, dtype=np.int32))

def timed(name, fn, *args):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    pert = tuple(a + np.asarray(1, a.dtype) if a.dtype != jnp.int32 else
                 (a + 1) % T for a in args)
    t0 = time.perf_counter()
    jax.block_until_ready(f(*pert))
    dt = (time.perf_counter() - t0) / 8 * 1000
    print(f"{name:22s}: {dt:8.2f} ms/gather")

def chain(fn):
    def run(table, idx):
        def body(c, _):
            i, acc = c
            g = fn(table, i)
            return ((i + g.astype(jnp.int32).reshape(-1)[:R] + 1) % T,
                    acc + 1), None
        (i, acc), _ = jax.lax.scan(body, (idx, jnp.int32(0)), None, length=8)
        return i
    return run

t1 = jnp.asarray(rng.random(T, np.float32))
t2 = t1.reshape(T, 1)
t3 = jnp.asarray(rng.random((T, 2), np.float32))
t8 = jnp.asarray(rng.random((T, 8), np.float32))

timed("(T,) 1d", chain(lambda t, i: t[i]), t1, idx0)
timed("(T,1) row", chain(lambda t, i: t[i]), t2, idx0)
timed("(T,2) row", chain(lambda t, i: t[i]), t3, idx0)
timed("(T,8) row", chain(lambda t, i: t[i]), t8, idx0)
timed("(T,8) element [i,3]", chain(lambda t, i: t[i, 3]), t8, idx0)
# small-table forms (materials/lights)
S = 8
s1 = jnp.asarray(rng.random(S, np.float32))
s2 = s1.reshape(S, 1)
idxs = idx0 % S
timed("(8,) small 1d", chain(lambda t, i: t[i % S]), s1, idx0)
timed("(8,1) small row", chain(lambda t, i: t[i % S]), s2, idx0)
