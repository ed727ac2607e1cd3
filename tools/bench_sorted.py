"""Ceiling measurement: how much does ray ordering win the traversal
kernels, with the sort done for FREE on the host?

Runs mattest 512^2 bounce rays through closest/any-hit three ways:
  pixel   : pixel order (what launch_step traces today)
  octant  : stable sort by direction octant only
  morton  : sort by (octant<<15 | origin morton) - full coherence key

The delta pixel->morton bounds what an in-kernel (bitonic) pre-sort
could recover. Usage: python tools/bench_sorted.py
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


def main():
    from glaze_tpu.parser import parse
    from glaze_tpu.render import integrator as integ
    from glaze_tpu import accel
    from glaze_tpu.accel import traverse_pallas as tp
    from glaze_tpu.render.renderer import RayTraceRenderer

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
    om = np.stack([np.asarray(c) for c in o], -1)
    dm = np.stack([np.asarray(c) for c in d], -1)

    hit = accel.closest_hit_soa_auto(scene.bvh, tuple(jnp.asarray(om[:, i]) for i in range(3)),
                                     tuple(jnp.asarray(dm[:, i]) for i in range(3)))
    t = np.asarray(hit["t"])
    tri = np.asarray(hit["tri"])
    tris = np.asarray(scene.bvh.tri)
    e1 = tris[np.maximum(tri, 0), 3:6]
    e2 = tris[np.maximum(tri, 0), 6:9]
    n = np.cross(e1, e2)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
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
    bo = om + dm * np.where(tri >= 0, t, 1.0)[:, None]
    bo = np.where(tri[:, None] >= 0, bo, om)
    bd = np.where(tri[:, None] >= 0, bd, dm)

    key = np.asarray(tp.sort_rays_key(scene.bvh, jnp.asarray(bo),
                                      jnp.asarray(bd)))
    octant = key >> 17  # 3 octant bits only (>>15 would keep dom-axis)
    orders = {
        "pixel": np.arange(p),
        "octant": np.argsort(octant, kind="stable"),
        "morton": np.argsort(key, kind="stable"),
    }

    jitter = [0]

    @jax.jit
    def _add(t3, eps):
        return tuple(c + eps for c in t3)

    for name, perm in orders.items():
        os_ = bo[perm]
        ds_ = bd[perm]
        dev_o = tuple(jax.device_put(jnp.asarray(os_[:, i])) for i in range(3))
        dev_d = tuple(jax.device_put(jnp.asarray(ds_[:, i])) for i in range(3))

        def margs():
            jitter[0] += 1
            eps = jnp.float32(1e-5 * jitter[0])
            return _add(dev_o, eps), _add(dev_d, eps)

        oo, dd = margs()
        jax.block_until_ready(
            accel.closest_hit_soa_auto(scene.bvh, oo, dd)["t"])
        best_c = float("inf")
        for _ in range(3):
            oo, dd = margs()
            jax.block_until_ready((oo[0], dd[0]))
            t0 = time.perf_counter()
            jax.block_until_ready(
                accel.closest_hit_soa_auto(scene.bvh, oo, dd)["t"])
            best_c = min(best_c, time.perf_counter() - t0)
        oo, dd = margs()
        jax.block_until_ready(
            accel.any_hit_soa_auto(scene.bvh, oo, dd, 100.0))
        best_a = float("inf")
        for _ in range(3):
            oo, dd = margs()
            jax.block_until_ready((oo[0], dd[0]))
            t0 = time.perf_counter()
            jax.block_until_ready(
                accel.any_hit_soa_auto(scene.bvh, oo, dd, 100.0))
            best_a = min(best_a, time.perf_counter() - t0)
        print(f"{name:7s}: closest {best_c*1e3:8.2f} ms ({p/best_c/1e6:6.2f} "
              f"Mrays/s)   anyhit {best_a*1e3:8.2f} ms ({p/best_a/1e6:6.2f} "
              f"Mrays/s)")


if __name__ == "__main__":
    main()
