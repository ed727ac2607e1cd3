"""Benchmark: path-tracing throughput in Mrays/s on the default device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): 200 Mrays/s/chip on Sponza-class scenes.
Until a Sponza asset is available in-image, the workload is mattest.glaze
(the reference's shipped scene, 138k world-space triangles) at 512x512 —
BASELINE config #3 geometry.

Methodology: one warm-up render_steps call (compile), then timed calls of
a 12-launch fused scan with fresh per-launch seeds (distinct inputs; the
TPU tunnel dedupes identical executions, so repeat-same-args timing lies).
A launch = one path-tracing bounce for every pixel (camera ray or bounce
ray + NEE shadow ray); the Mrays metric counts primary/bounce rays like
the reference's traceRayEXT launches.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_MRAYS = 200.0  # BASELINE.json target, Mrays/s/chip
STEPS = 12
REPEATS = 3


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from glaze_tpu.parser import parse
    from glaze_tpu.render import integrator as integ
    from glaze_tpu.render.renderer import RayTraceRenderer
    from glaze_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    scene_path = "/root/reference/resources/mattest.glaze"
    width = height = 512
    if not os.path.exists(scene_path):
        print(json.dumps({"metric": "mrays_per_sec", "value": 0.0,
                          "unit": "Mrays/s", "vs_baseline": 0.0,
                          "error": "scene missing"}))
        return

    parsed = parse(scene_path)
    r = RayTraceRenderer(parsed, width=width, height=height, seed=3)
    p = integ.pixel_count(width, height)
    c2w, s2c = integ.camera_matrices(r.camera, width, height)
    c2w, s2c = jnp.asarray(c2w), jnp.asarray(s2c)
    kw = dict(width=width, height=height, is_persp=True, direct_only=False,
              steps=STEPS)
    rng = np.random.default_rng(7)

    def run(state):
        seeds = jnp.asarray(rng.integers(0, 2**32, STEPS, dtype=np.uint32))
        offs = jnp.asarray(rng.random((STEPS, 2), np.float32))
        return integ.render_steps(r.scene, state, seeds, offs, c2w, s2c, **kw)

    state = integ.init_state(width, height)
    state = run(state)  # compile + warm
    jax.block_until_ready(state.count)

    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        state = run(state)
        jax.block_until_ready(state.count)
        best = min(best, time.perf_counter() - t0)

    rays = p * STEPS
    mrays = rays / best / 1e6
    print(json.dumps({
        "metric": "mrays_per_sec",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
    }))


if __name__ == "__main__":
    main()
