"""Localize the sharded-vs-unsharded single-chip gap (bench.py r3:
0.687 vs 1.16 Mrays/s on n=1 — GSPMD should be free at mesh size 1).

Times three variants on the bench scene at reduced resolution:
  a) unsharded render_steps (the headline path)
  b) render_steps_sharded as bench.py calls it (device_put every call)
  c) the sharded jit executable with pre-placed inputs (no per-call puts)

Usage: python tools/bench_sharded_gap.py [--res 960x540] [--steps 2]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from glaze_tpu.parallel import mesh as pmesh
    from glaze_tpu.render import integrator as integ
    from glaze_tpu.render.renderer import RayTraceRenderer
    from glaze_tpu.utils import enable_compilation_cache
    from tools.make_sponza import build_scene

    enable_compilation_cache()
    W, H, STEPS = 960, 540, 2
    for a in sys.argv[1:]:
        if a.startswith("--res"):
            W, H = (int(v) for v in a.split("=")[1].split("x"))
        elif a.startswith("--steps"):
            STEPS = int(a.split("=")[1])

    r = RayTraceRenderer(build_scene(), width=W, height=H, seed=3)
    c2w, s2c = integ.camera_matrices(r.camera, W, H)
    c2w, s2c = jnp.asarray(c2w), jnp.asarray(s2c)
    kw = dict(width=W, height=H, is_persp=True, direct_only=False,
              steps=STEPS, alpha_rounds=r._alpha_rounds)
    rng = np.random.default_rng(int.from_bytes(os.urandom(8), "little"))
    p = integ.pixel_count(W, H)

    def seeds():
        return (jnp.asarray(rng.integers(0, 2**32, STEPS, dtype=np.uint32)),
                jnp.asarray(rng.random((STEPS, 2), np.float32)))

    def timeit(label, fn, reps=3):
        st = fn()
        jax.block_until_ready(st.count)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            st = fn()
            jax.block_until_ready(st.count)
            best = min(best, time.perf_counter() - t0)
        print(f"{label}: {best*1e3:.1f} ms "
              f"({p*STEPS/best/1e6:.2f} Mrays/s)", flush=True)
        return best

    state = integ.init_state(W, H)

    def run_unsharded():
        s, o = seeds()
        return integ.render_steps(r.scene, state, s, o, c2w, s2c, **kw)

    timeit("unsharded", run_unsharded)

    m = pmesh.make_mesh()

    # the sharded impls DONATE the state — rebind it every call
    st_box = [integ.init_state(W, H)]

    def run_sharded_bencher():
        s, o = seeds()
        st_box[0] = pmesh.render_steps_sharded(r.scene, st_box[0], s, o,
                                               c2w, s2c, m, **kw)
        return st_box[0]

    timeit("sharded (per-call scene device_put)", run_sharded_bencher)

    scene_once = pmesh.place_replicated(r.scene, m)
    st_box[0] = pmesh.shard_state(integ.init_state(W, H), m)

    def run_sharded_put_once():
        s, o = seeds()
        st_box[0] = pmesh.render_steps_sharded(scene_once, st_box[0], s, o,
                                               c2w, s2c, m, **kw)
        return st_box[0]

    timeit("sharded (place_replicated once)", run_sharded_put_once)

    # pre-placed: do the puts once, call the jit directly
    px, py = integ.pixel_coords(W, H)
    pix_sh = NamedSharding(m, P(pmesh.AXIS))
    repl = NamedSharding(m, P())
    pxs = jax.device_put(px, pix_sh)
    pys = jax.device_put(py, pix_sh)
    st_box[0] = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(m, pmesh._pixel_spec(x))),
        state)
    sc_sh = jax.tree.map(lambda x: jax.device_put(x, repl), r.scene)

    state_specs = jax.tree.map(pmesh._pixel_spec, state)
    impl = pmesh._pix_impl(m, state_specs, kw["width"], kw["height"],
                           kw["is_persp"], kw["direct_only"], kw["steps"],
                           kw["alpha_rounds"])

    def run_sharded_preplaced():
        s, o = seeds()
        st_box[0] = impl(sc_sh, st_box[0], s, o, c2w, s2c, pxs, pys)
        return st_box[0]

    timeit("sharded (pre-placed)", run_sharded_preplaced)


if __name__ == "__main__":
    main()
