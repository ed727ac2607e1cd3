"""Acceleration structures: SAH BVH build + JAX traversal kernels.

TPU replacement for the reference's hardware BLAS/TLAS
(``lib/src/vulkan/acceleration.rs``): instances are flattened to world-space
triangles at upload time (the instancing *feature* — per-instance transforms
— is preserved by the flattener), a binned-SAH BVH with a threaded skip-link
layout is built natively, and traversal runs as a batched JAX kernel.

Scenes whose triangle table exceeds the VMEM budget build a
:class:`ChunkedBVH` (spatial partition; the analogue of the reference's
chunked BLAS builds, acceleration.rs:199-277) and the ``*_auto`` dispatchers
trace the chunks sequentially, carrying the best-t cap / blocked mask so
later chunks prune early.
"""

from glaze_tpu.accel.bvh import (
    BVH,
    ChunkedBVH,
    build_bvh,
    build_bvh_chunked,
    closest_hit,
    any_hit,
)


def _on_tpu() -> bool:
    import jax

    return jax.default_backend() not in ("cpu", "METAL")


def _merge_closest(hit, h, off):
    """Fold chunk result ``h`` (tri ids offset by ``off``) into ``hit``.
    ``h`` was traced with t_max = hit's current t, so any reported hit is
    strictly closer."""
    import jax.numpy as jnp

    better = h["tri"] >= 0
    return {
        "t": jnp.where(better, h["t"], hit["t"]),
        "tri": jnp.where(better, h["tri"] + off, hit["tri"]),
        "u": jnp.where(better, h["u"], hit["u"]),
        "v": jnp.where(better, h["v"], hit["v"]),
    }


def _chunked_closest(bvh, trace_one, t_max):
    hit = None
    for chunk, off in zip(bvh.chunks, bvh.offsets):
        cap = t_max if hit is None else hit["t"]
        h = trace_one(chunk, cap)
        if hit is None:
            import jax.numpy as jnp

            hit = dict(h)
            hit["tri"] = jnp.where(h["tri"] >= 0, h["tri"] + off, -1)
        else:
            hit = _merge_closest(hit, h, off)
    return hit


def _chunked_any(bvh, trace_one, active):
    res = None
    for chunk in bvh.chunks:
        a = active if res is None else (~res if active is None
                                        else (active & ~res))
        r = trace_one(chunk, a)
        res = r if res is None else (res | r)
    return res


def closest_hit_auto(bvh, origin, direction, t_max=None):
    """Pallas packet kernel on TPU, XLA loop elsewhere (CPU tests)."""
    if isinstance(bvh, ChunkedBVH):
        return _chunked_closest(
            bvh, lambda c, cap: closest_hit_auto(c, origin, direction, cap),
            t_max)
    if _on_tpu():
        from glaze_tpu.accel.traverse_pallas import closest_hit_pallas

        return closest_hit_pallas(bvh, origin, direction, t_max)
    return closest_hit(bvh, origin, direction, t_max)


def any_hit_auto(bvh, origin, direction, t_max, t_min=1e-3, active=None):
    if isinstance(bvh, ChunkedBVH):
        return _chunked_any(
            bvh,
            lambda c, a: any_hit_auto(c, origin, direction, t_max,
                                      t_min=t_min, active=a),
            active)
    if _on_tpu():
        from glaze_tpu.accel.traverse_pallas import any_hit_pallas

        return any_hit_pallas(bvh, origin, direction, t_max, t_min=t_min,
                              active=active)
    return any_hit(bvh, origin, direction, t_max, t_min=t_min, active=active)


def closest_hit_soa_auto(bvh, origin3, direction3, t_max=None):
    """SoA dispatch: Pallas on TPU, stacked XLA loop on CPU."""
    if isinstance(bvh, ChunkedBVH):
        return _chunked_closest(
            bvh,
            lambda c, cap: closest_hit_soa_auto(c, origin3, direction3, cap),
            t_max)
    if _on_tpu():
        from glaze_tpu.accel.traverse_pallas import closest_hit_soa

        return closest_hit_soa(bvh, origin3, direction3, t_max)
    import jax.numpy as jnp

    return closest_hit(bvh, jnp.stack(origin3, -1), jnp.stack(direction3, -1),
                       t_max)


def any_hit_soa_auto(bvh, origin3, direction3, t_max, t_min=1e-3, active=None):
    if isinstance(bvh, ChunkedBVH):
        return _chunked_any(
            bvh,
            lambda c, a: any_hit_soa_auto(c, origin3, direction3, t_max,
                                          t_min=t_min, active=a),
            active)
    if _on_tpu():
        from glaze_tpu.accel.traverse_pallas import any_hit_soa

        return any_hit_soa(bvh, origin3, direction3, t_max, t_min=t_min,
                           active=active)
    import jax.numpy as jnp

    return any_hit(bvh, jnp.stack(origin3, -1), jnp.stack(direction3, -1),
                   t_max, t_min=t_min, active=active)


__all__ = [
    "BVH", "ChunkedBVH", "build_bvh", "build_bvh_chunked",
    "closest_hit", "any_hit",
    "closest_hit_auto", "any_hit_auto",
    "closest_hit_soa_auto", "any_hit_soa_auto",
]
