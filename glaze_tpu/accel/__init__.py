"""Acceleration structures: SAH BVH build + JAX traversal kernels.

TPU replacement for the reference's hardware BLAS/TLAS
(``lib/src/vulkan/acceleration.rs``): instances are flattened to world-space
triangles at upload time (the instancing *feature* — per-instance transforms
— is preserved by the flattener), a binned-SAH BVH with a threaded skip-link
layout is built natively, and traversal runs as a batched JAX kernel.
"""

from glaze_tpu.accel.bvh import BVH, build_bvh, closest_hit, any_hit


def _on_tpu() -> bool:
    import jax

    return jax.default_backend() not in ("cpu", "METAL")


def closest_hit_auto(bvh, origin, direction, t_max=None):
    """Pallas packet kernel on TPU, XLA loop elsewhere (CPU tests)."""
    if _on_tpu():
        from glaze_tpu.accel.traverse_pallas import closest_hit_pallas

        return closest_hit_pallas(bvh, origin, direction, t_max)
    return closest_hit(bvh, origin, direction, t_max)


def any_hit_auto(bvh, origin, direction, t_max, t_min=1e-3, active=None):
    if _on_tpu():
        from glaze_tpu.accel.traverse_pallas import any_hit_pallas

        return any_hit_pallas(bvh, origin, direction, t_max, t_min=t_min,
                              active=active)
    return any_hit(bvh, origin, direction, t_max, t_min=t_min, active=active)


def closest_hit_soa_auto(bvh, origin3, direction3, t_max=None):
    """SoA dispatch: Pallas on TPU, stacked XLA loop on CPU."""
    if _on_tpu():
        from glaze_tpu.accel.traverse_pallas import closest_hit_soa

        return closest_hit_soa(bvh, origin3, direction3, t_max)
    import jax.numpy as jnp

    return closest_hit(bvh, jnp.stack(origin3, -1), jnp.stack(direction3, -1),
                       t_max)


def any_hit_soa_auto(bvh, origin3, direction3, t_max, t_min=1e-3, active=None):
    if _on_tpu():
        from glaze_tpu.accel.traverse_pallas import any_hit_soa

        return any_hit_soa(bvh, origin3, direction3, t_max, t_min=t_min,
                           active=active)
    import jax.numpy as jnp

    return any_hit(bvh, jnp.stack(origin3, -1), jnp.stack(direction3, -1),
                   t_max, t_min=t_min, active=active)


__all__ = [
    "BVH", "build_bvh", "closest_hit", "any_hit",
    "closest_hit_auto", "any_hit_auto",
    "closest_hit_soa_auto", "any_hit_soa_auto",
]
