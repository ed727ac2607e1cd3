"""Probe: does block_until_ready actually wait through the axon tunnel?

Observed 2026-08-18 (after the tunnel outage): bench.py's timed launches
report ~0.2-0.7 ms for a 1080p path-tracing launch that demonstrably
takes ~1.6 s (the interactive-fps path, which fetches pixels to host,
still shows the real rate). Hypothesis: the restarted tunnel completes
`block_until_ready` futures without waiting for remote execution, so
any wall-clock timing that never moves bytes to the host is fiction.

This probe times the same fused launch four ways on a small frame:
  A. block_until_ready(state.count)            (bench.py's old method)
  B. device_get of a 1-element slice           (forces a host transfer)
  C. device_get after an ALREADY-BLOCKED state (transfer-only cost, the
     round-trip overhead to subtract from B)
  D. repeat B with IDENTICAL seeds             (tunnel dedup check)
Prints one line per method; run on hardware only.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from glaze_tpu.render import integrator as integ
from glaze_tpu.render.renderer import RayTraceRenderer
from tools.make_sponza import build_scene

W, H = 960, 540
STEPS = 2

rng = np.random.default_rng(int.from_bytes(os.urandom(8), "little"))

parsed = build_scene()
r = RayTraceRenderer(parsed, width=W, height=H, seed=3)
c2w, s2c = integ.camera_matrices(r.camera, W, H)
c2w, s2c = jnp.asarray(c2w), jnp.asarray(s2c)
kw = dict(width=W, height=H, is_persp=True, direct_only=False,
          steps=STEPS, alpha_rounds=r._alpha_rounds)


def run(state, seeds, offs):
    return integ.render_steps(r.scene, state, seeds, offs, c2w, s2c, **kw)


def fresh_inputs():
    seeds = jnp.asarray(rng.integers(0, 2**32, STEPS, dtype=np.uint32))
    offs = jnp.asarray(rng.random((STEPS, 2), np.float32))
    return seeds, offs


state = integ.init_state(W, H)
state = run(state, *fresh_inputs())  # compile + warm
np.asarray(jax.device_get(state.count[:1]))

# A: block_until_ready only
t0 = time.perf_counter()
sA = run(state, *fresh_inputs())
jax.block_until_ready(sA.count)
tA = time.perf_counter() - t0
print(f"A block_until_ready:        {tA*1e3:9.1f} ms", flush=True)

# B: force a tiny host transfer
t0 = time.perf_counter()
sB = run(state, *fresh_inputs())
np.asarray(jax.device_get(sB.count[:1]))
tB = time.perf_counter() - t0
print(f"B device_get 1 elem:        {tB*1e3:9.1f} ms", flush=True)

# C: transfer-only round trip on an already-materialized array
jax.block_until_ready(sB.count)
np.asarray(jax.device_get(sB.count[:1]))
t0 = time.perf_counter()
np.asarray(jax.device_get(sB.count[1:2]))
tC = time.perf_counter() - t0
print(f"C transfer-only RTT:        {tC*1e3:9.1f} ms", flush=True)

# D: identical inputs twice (dedup check) — both with host transfer
seeds, offs = fresh_inputs()
sD = run(state, seeds, offs)
np.asarray(jax.device_get(sD.count[:1]))
t0 = time.perf_counter()
sD2 = run(state, seeds, offs)
np.asarray(jax.device_get(sD2.count[:1]))
tD = time.perf_counter() - t0
print(f"D repeat same inputs:       {tD*1e3:9.1f} ms", flush=True)

print(f"\nverdict: block_waits={'YES' if tA > 0.5 * tB else 'NO'} "
      f"dedup={'YES' if tD < 0.5 * tB else 'NO'} "
      f"(real launch ~{(tB - tC)/STEPS*1e3:.0f} ms)")
