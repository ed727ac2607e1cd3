"""Benchmark: path-tracing throughput in Mrays/s on the default device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): 200 Mrays/s/chip on Sponza-class scenes.
Until a Sponza asset is available in-image, the workload is mattest.glaze
(the reference's shipped scene, 138k world-space triangles) at 512x512,
the BASELINE config #3 geometry.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_MRAYS = 200.0  # BASELINE.json target, Mrays/s/chip


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from glaze_tpu.parser import parse
    from glaze_tpu.render import integrator as integ
    from glaze_tpu.render.renderer import Integrator, RayTraceRenderer
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
    r = RayTraceRenderer(parsed, width=width, height=height,
                         integrator=Integrator.PATH_TRACE, seed=3)

    # warmup: compile + one chunk
    r.draw(1)
    jax.block_until_ready(r._state.accum)

    spp = 8
    steps = spp * Integrator.PATH_TRACE.steps_per_sample
    t0 = time.perf_counter()
    r.draw(spp)
    jax.block_until_ready(r._state.accum)
    dt = time.perf_counter() - t0

    # one launch = one ray per pixel (primary or bounce) + up to one shadow
    # ray; count primary/bounce rays only (the reference's Mrays metric
    # counts traceRayEXT launches per pixel the same way)
    rays = width * height * steps
    mrays = rays / dt / 1e6
    print(json.dumps({
        "metric": "mrays_per_sec",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
    }))


if __name__ == "__main__":
    main()
