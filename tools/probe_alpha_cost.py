"""Decomposes the alpha-tested-transparency cost on the bench scene.

First hardware run with curtains: launch 678 ms (no alpha, coherent) ->
1454 ms (alpha_rounds=4) and the opaque/alpha tree split did NOT move
it (1480 ms). This probe times each leg on captured launch buffers to
find where the ~800 ms actually goes:
  closest: opaque-only | +alpha leg (1 round) | +alpha leg (4 rounds)
  NEE:     opaque any-hit | +alpha probe (1..4 rounds)
  empty-call floor: alpha-tree closest with every lane culled (cap -1)

Run (TPU): python tools/probe_alpha_cost.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

WIDTH, HEIGHT = 1920, 1080


def main():
    from glaze_tpu import accel
    from glaze_tpu.render import integrator as integ
    from glaze_tpu.render.renderer import RayTraceRenderer
    from tools.make_sponza import build_scene

    r = RayTraceRenderer(build_scene(), width=WIDTH, height=HEIGHT, seed=3)
    assert r.scene.bvh_alpha is not None
    c2w, s2c = integ.camera_matrices(r.camera, WIDTH, HEIGHT)
    c2w, s2c = jnp.asarray(c2w), jnp.asarray(s2c)
    rng = np.random.default_rng(int.from_bytes(os.urandom(8), "little"))
    kw = dict(width=WIDTH, height=HEIGHT, is_persp=True, direct_only=False,
              steps=2, alpha_rounds=4, coherent=1)
    state = integ.init_state(WIDTH, HEIGHT)
    seeds = jnp.asarray(rng.integers(0, 2**32, 2, dtype=np.uint32))
    offs = jnp.asarray(rng.random((2, 2), np.float32))
    state = integ.render_steps(r.scene, state, seeds, offs, c2w, s2c, **kw)
    jax.block_until_ready(state.count)

    px, py, rng_py = integ.sif_lanes(WIDTH, HEIGHT, 1)
    size = jnp.asarray([WIDTH, HEIGHT], jnp.float32)
    names = []

    def step_capture(scene, st, seed, offset):
        sink = []
        integ._capture_sink = sink
        try:
            integ.launch_step(scene, st, seed, offset, c2w, s2c, px, py,
                              size, is_persp=True, direct_only=False,
                              alpha_rounds=4, rng_py=rng_py, coherent=1)
        finally:
            integ._capture_sink = None
        del names[:]
        names.extend(rec.pop("phase") for rec in sink)
        return sink

    sink = jax.jit(step_capture)(
        r.scene, state, jnp.uint32(rng.integers(0, 2**32)),
        jnp.asarray(rng.random(2, np.float32)))
    jax.block_until_ready(sink)
    bufs = dict(zip(names, sink))
    bo, bs = bufs["closest"], bufs["anyhit_nee"]
    p = int(bo["o"][0].shape[0])

    def sync(x):
        return np.asarray(jax.device_get(x[:1]))

    def timed(fn, label):
        sync(fn(1e-5 * float(rng.random())))
        t = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(fn(1e-5 * float(rng.random())))
            t = min(t, time.perf_counter() - t0)
        print(f"{label:44s} {t * 1e3:8.1f} ms  ({p / t / 1e6:6.2f} Mrays/s)",
              flush=True)
        return t

    o, d = bo["o"], bo["d"]
    # -- closest legs -----------------------------------------------------
    timed(lambda e: integ.trace_alpha_sorted(
        r.scene, tuple(c + e for c in o), d, alpha_rounds=4)["t"],
        "closest: production (split, 4 rounds)")
    timed(lambda e: integ.trace_alpha_sorted(
        r.scene, tuple(c + e for c in o), d, alpha_rounds=1)["t"],
        "closest: split, 1 round")
    timed(lambda e: integ.trace_alpha_sorted(
        r.scene, tuple(c + e for c in o), d, alpha_rounds=0)["t"],
        "closest: FULL tree, no alpha (r3 baseline)")

    def opaque_only(e):
        hit = accel.closest_hit_soa_auto(
            r.scene.bvh_opaque, tuple(c + e for c in o), d)
        return hit["t"]

    timed(opaque_only, "closest: opaque tree only, unsorted")

    def alpha_leg(e):
        return integ._alpha_tree_closest(
            r.scene, tuple(c + e for c in o), d,
            jnp.full((p,), np.inf, jnp.float32), 4)["t"]

    timed(alpha_leg, "alpha tree: closest + 4 rounds, all lanes")

    def alpha_leg1(e):
        return integ._alpha_tree_closest(
            r.scene, tuple(c + e for c in o), d,
            jnp.full((p,), np.inf, jnp.float32), 1)["t"]

    timed(alpha_leg1, "alpha tree: closest + 1 round, all lanes")

    def alpha_culled(e):
        return integ._alpha_tree_closest(
            r.scene, tuple(c + e for c in o), d,
            jnp.full((p,), -1.0, jnp.float32), 4)["t"]

    timed(alpha_culled, "alpha tree: 4 rounds, ALL lanes culled (floor)")

    # -- NEE legs ---------------------------------------------------------
    timed(lambda e: integ._occlusion_sorted(
        r.scene, tuple(c + e for c in bs["o"]), bs["d"], bs["tmax"],
        bs["active"], 4).astype(jnp.float32),
        "NEE: production occlusion (split, 4 rounds)")
    timed(lambda e: integ._occlusion_sorted(
        r.scene, tuple(c + e for c in bs["o"]), bs["d"], bs["tmax"],
        bs["active"], 1).astype(jnp.float32),
        "NEE: occlusion, 1 round")
    timed(lambda e: integ._any_hit_sorted(
        r.scene, tuple(c + e for c in bs["o"]), bs["d"], bs["tmax"],
        bs["active"]).astype(jnp.float32),
        "NEE: FULL-tree any-hit (r3 baseline, alpha-blind)")
    frac = float(jnp.mean(bs["active"].astype(jnp.float32)))
    print(f"shadow_active_frac {frac:.3f}; lanes {p}")


if __name__ == "__main__":
    main()
