"""Per-phase on-chip timing: closest-hit (primary + bounce-like), any-hit,
and the full fused launch scan, on mattest at 512x512.

Dedup-safe: every timed call gets freshly perturbed rays/seeds.

Usage: python tools/bench_phases.py [phases...]   (default: all)
  phases: closest_primary closest_bounce anyhit launch
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

WIDTH = HEIGHT = 512
REPEATS = 3


def timed(name, make_args, fn, n_rays):
    out = jax.block_until_ready(fn(*make_args()))  # compile/warm
    best = float("inf")
    for _ in range(REPEATS):
        args = make_args()
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:18s}: {best * 1e3:9.2f} ms   "
          f"{n_rays / best / 1e6:9.2f} Mrays/s")
    return out


def main():
    want = set(sys.argv[1:]) or {"closest_primary", "closest_bounce",
                                 "anyhit", "launch"}
    from glaze_tpu.parser import parse
    from glaze_tpu.render import integrator as integ
    from glaze_tpu import accel
    from glaze_tpu.render.renderer import RayTraceRenderer

    scene_name = os.environ.get("GLAZE_BENCH_SCENE", "mattest")
    if scene_name == "sponza":
        from tools.make_sponza import build_scene

        parsed = build_scene()
    else:
        parsed = parse("/root/reference/resources/mattest.glaze")
    r = RayTraceRenderer(parsed, width=WIDTH, height=HEIGHT, seed=3)
    scene = r.scene
    p = integ.pixel_count(WIDTH, HEIGHT)
    c2w, s2c = integ.camera_matrices(r.camera, WIDTH, HEIGHT)
    px, py = integ.pixel_coords(WIDTH, HEIGHT)
    ndc_x = -1.0 + 2.0 * (px + 0.5) / WIDTH
    ndc_y = -1.0 + 2.0 * (py + 0.5) / HEIGHT
    o, d = integ.camera_rays(ndc_x, ndc_y, jnp.asarray(c2w),
                             jnp.asarray(s2c), True)
    o = tuple(np.asarray(c) for c in o)
    d = tuple(np.asarray(c) for c in d)

    # bounce-like rays: cosine hemisphere at primary hit points (host calc)
    hit = accel.closest_hit_soa_auto(scene.bvh, tuple(map(jnp.asarray, o)),
                                     tuple(map(jnp.asarray, d)))
    t = np.asarray(hit["t"])
    tri = np.asarray(hit["tri"])
    tris = np.asarray(scene.bvh.tri)
    e1 = tris[np.maximum(tri, 0), 3:6]
    e2 = tris[np.maximum(tri, 0), 6:9]
    n = np.cross(e1, e2)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    dm = np.stack(d, -1)
    n *= -np.sign((n * dm).sum(-1, keepdims=True))
    rng = np.random.default_rng(7)
    r0, r1 = rng.random(p), rng.random(p)
    st = np.sqrt(r0)
    phi = 2 * np.pi * r1
    a = np.where(np.abs(n[:, 2:3]) < 0.9, [0, 0, 1.0], [1.0, 0, 0])
    tx_ = np.cross(a, n)
    tx_ /= np.maximum(np.linalg.norm(tx_, axis=-1, keepdims=True), 1e-20)
    ty = np.cross(n, tx_)
    bd = (tx_ * (st * np.cos(phi))[:, None] + ty * (st * np.sin(phi))[:, None]
          + n * np.sqrt(1 - r0)[:, None])
    om = np.stack(o, -1)
    bo = om + dm * np.where(tri >= 0, t, 1.0)[:, None]
    bo = np.where(tri[:, None] >= 0, bo, om)
    bd = np.where(tri[:, None] >= 0, bd, dm)

    jitter = [0]
    _dev_cache = {}

    @jax.jit
    def _add(t3, eps):
        return tuple(c + eps for c in t3)

    def perturb(arr3):
        """Device-resident perturbation: only a scalar crosses the tunnel
        per call (host->device of the full rays measured ~100ms)."""
        key = id(arr3)
        if key not in _dev_cache:
            _dev_cache[key] = tuple(
                jax.device_put(jnp.asarray(arr3[:, i])) for i in range(3)
            )
        jitter[0] += 1
        return _add(_dev_cache[key], jnp.float32(1e-5 * jitter[0]))

    if "closest_primary" in want:
        timed("closest primary",
              lambda: (scene.bvh, perturb(om), perturb(dm)),
              lambda b, oo, dd: accel.closest_hit_soa_auto(b, oo, dd)["t"], p)
    if "closest_bounce" in want:
        timed("closest bounce",
              lambda: (scene.bvh, perturb(bo), perturb(bd)),
              lambda b, oo, dd: accel.closest_hit_soa_auto(b, oo, dd)["t"], p)
    if "anyhit" in want:
        timed("anyhit bounce",
              lambda: (scene.bvh, perturb(bo), perturb(bd)),
              lambda b, oo, dd: accel.any_hit_soa_auto(b, oo, dd, 100.0), p)
    if "launch" in want:
        steps = 12
        rngj = np.random.default_rng(11)
        kw = dict(width=WIDTH, height=HEIGHT, is_persp=True,
                  direct_only=False, steps=steps,
                  alpha_rounds=r._alpha_rounds)
        state = integ.init_state(WIDTH, HEIGHT)

        def margs():
            seeds = jnp.asarray(rngj.integers(0, 2**32, steps,
                                              dtype=np.uint32))
            offs = jnp.asarray(rngj.random((steps, 2), np.float32))
            return (scene, state, seeds, offs, jnp.asarray(c2w),
                    jnp.asarray(s2c))

        out = timed(f"launch x{steps}",
                    margs,
                    lambda *a: integ.render_steps(*a, **kw).count,
                    p * steps)
        print(f"  (alpha_rounds={r._alpha_rounds}, per-launch = "
              f"see ms/{steps})")


if __name__ == "__main__":
    main()
