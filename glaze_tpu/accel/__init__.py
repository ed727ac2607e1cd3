"""Acceleration structures: SAH BVH build + JAX traversal kernels.

TPU replacement for the reference's hardware BLAS/TLAS
(``lib/src/vulkan/acceleration.rs``): instances are flattened to world-space
triangles at upload time (the instancing *feature* — per-instance transforms
— is preserved by the flattener), a binned-SAH BVH with a threaded skip-link
layout is built natively, and traversal runs as a batched JAX kernel.
"""

from glaze_tpu.accel.bvh import BVH, build_bvh, closest_hit, any_hit

__all__ = ["BVH", "build_bvh", "closest_hit", "any_hit"]
