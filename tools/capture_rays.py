"""Captures the REAL per-phase ray buffers of a bench-scene launch so the
traversal sims (tools/sim_fatleaf.py) run against the true workload instead
of synthetic mattest schedules (VERDICT r2 "What's weak" #5).

Runs N warm launches on the default device to reach a steady-state bounce
mix, then one instrumented launch whose trace-phase inputs (PRE octant
sort) are returned as jit outputs via integrator._capture_sink.

Usage: python tools/capture_rays.py [out.npz] [--res WxH] [--warm N]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def capture(width=1920, height=1080, warm_steps=4, seed=3):
    import jax
    import jax.numpy as jnp

    from glaze_tpu.render import integrator as integ
    from glaze_tpu.render.renderer import RayTraceRenderer
    from glaze_tpu.utils import enable_compilation_cache
    from tools.make_sponza import build_scene

    enable_compilation_cache()
    parsed = build_scene()
    r = RayTraceRenderer(parsed, width=width, height=height, seed=seed)
    c2w, s2c = integ.camera_matrices(r.camera, width, height)
    c2w, s2c = jnp.asarray(c2w), jnp.asarray(s2c)
    px, py = integ.pixel_coords(width, height)
    size = jnp.asarray([width, height], jnp.float32)
    rng = np.random.default_rng(seed)

    kw = dict(is_persp=True, direct_only=False,
              alpha_rounds=r._alpha_rounds)

    state = integ.init_state(width, height)
    seeds = jnp.asarray(rng.integers(0, 2**32, warm_steps, dtype=np.uint32))
    offs = jnp.asarray(rng.random((warm_steps, 2), np.float32))
    state = integ.render_steps(
        r.scene, state, seeds, offs, c2w, s2c, width=width, height=height,
        steps=warm_steps, **kw)
    jax.block_until_ready(state.count)

    phase_names = []  # filled at TRACE time (deterministic order)

    def step_capture(scene, st, seed, offset):
        sink = []
        integ._capture_sink = sink
        try:
            new_st = integ.launch_step(scene, st, seed, offset, c2w, s2c,
                                       px, py, size, **kw)
        finally:
            integ._capture_sink = None
        del phase_names[:]
        phase_names.extend(rec.pop("phase") for rec in sink)
        return new_st, sink

    fn = jax.jit(step_capture)
    _, sink = fn(r.scene, state,
                 jnp.uint32(rng.integers(0, 2**32)),
                 jnp.asarray(rng.random(2, np.float32)))
    jax.block_until_ready(sink)

    out = {}
    for i, rec in enumerate(sink):
        tag = f"{i:02d}_{phase_names[i]}"
        for k, v in rec.items():
            if isinstance(v, tuple):
                out[f"{tag}.{k}"] = np.stack(
                    [np.asarray(jax.device_get(c)) for c in v], -1)
            else:
                out[f"{tag}.{k}"] = np.asarray(jax.device_get(v))
    return out


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_rays.npz"
    width, height = 1920, 1080
    warm = 4
    seed = 3
    for a in sys.argv[2:]:
        if a.startswith("--res"):
            width, height = map(int, a.split("=")[1].split("x"))
        elif a.startswith("--warm"):
            warm = int(a.split("=")[1])
        elif a.startswith("--seed"):
            seed = int(a.split("=")[1])
    data = capture(width, height, warm, seed)
    np.savez_compressed(out_path, **data)
    for k, v in sorted(data.items()):
        print(k, v.shape, v.dtype)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
