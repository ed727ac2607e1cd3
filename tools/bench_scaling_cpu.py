"""Multi-device scaling evidence for the sharded render path.

The TPU fleet here is one chip, so pod-scale throughput can't be
measured directly; this harness runs the REAL pixel-sharded render
program (parallel/mesh.py render_steps_sharded — the exact executable
the bench's sharded mode times on hardware) on a virtual CPU mesh at
1/2/4/8 devices and reports per-launch wall time. What it demonstrates
is a property of the PROGRAM, not of CPUs: GSPMD partitions the launch
without serializing — per-device work shrinks ~linearly with the mesh
and no hidden cross-device dependency grows with device count. The
workload is embarrassingly parallel (collectives only at image
assembly), so single-chip Mrays/s x N is the pod expectation
(docs/PERF_LOG.md "structural ceiling" section).

Default mode is WEAK scaling: the image height grows with the mesh so
per-device work is constant — flat launch_s across 1/2/4/8 devices IS
the linear-scaling property (N devices render N x the pixels in the
same wall time). --strong keeps the frame fixed instead (per-device
work shrinks; small frames under-utilize, so weak is the honest probe).

Usage:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python tools/bench_scaling_cpu.py [--res 256x64] [--steps 1]

Prints one JSON line: {"devices": [...], "launch_s": [...],
"weak_efficiency": [...]} (or strong-scaling speedup/efficiency keys).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", default="256x64",
                    help="base frame; weak mode scales height x devices")
    ap.add_argument("--steps", type=int, default=1)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--strong", action="store_true",
                    help="fixed frame across mesh sizes")
    args = ap.parse_args(argv)

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=8")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from glaze_tpu.parallel import mesh as pmesh
    from glaze_tpu.render import integrator as integ
    from glaze_tpu.render.renderer import RayTraceRenderer
    from tools.make_sponza import build_scene

    w, h0 = (int(v) for v in args.res.split("x"))
    r = RayTraceRenderer(build_scene(), width=w, height=h0, seed=3)
    rng = np.random.default_rng(7)

    devs = jax.devices()
    sizes = [n for n in (1, 2, 4, 8) if n <= len(devs)]
    mode = "strong" if args.strong else "weak"
    out = {"devices": sizes, "launch_s": [], "res": args.res, "mode": mode}
    for n in sizes:
        h = h0 if args.strong else h0 * n
        c2w, s2c = integ.camera_matrices(r.camera, w, h)
        c2w, s2c = jnp.asarray(c2w), jnp.asarray(s2c)
        kw = dict(width=w, height=h, is_persp=True, direct_only=False,
                  steps=args.steps, alpha_rounds=r._alpha_rounds)
        m = pmesh.make_mesh(devs[:n])
        scene_sh = pmesh.place_replicated(r.scene, m)
        state = integ.init_state(w, h)

        def run(st):
            seeds = jnp.asarray(
                rng.integers(0, 2**32, args.steps, dtype=np.uint32))
            offs = jnp.asarray(rng.random((args.steps, 2), np.float32))
            return pmesh.render_steps_sharded(
                scene_sh, st, seeds, offs, c2w, s2c, m, **kw)

        state = run(state)  # compile + warm
        jax.block_until_ready(state.count)
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            state = run(state)
            jax.block_until_ready(state.count)
            best = min(best, time.perf_counter() - t0)
        out["launch_s"].append(round(best / args.steps, 3))

    t1 = out["launch_s"][0]
    if args.strong:
        out["speedup"] = [round(t1 / t, 2) for t in out["launch_s"]]
        out["parallel_efficiency"] = [
            round(t1 / (t * n), 2) for n, t in zip(sizes, out["launch_s"])]
    else:
        # constant per-device work: efficiency = t(1) / t(n)
        out["weak_efficiency"] = [
            round(t1 / t, 2) for t in out["launch_s"]]
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
