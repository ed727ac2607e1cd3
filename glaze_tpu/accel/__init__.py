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

import os

from glaze_tpu.accel.bvh import (
    BVH,
    ChunkedBVH,
    build_bvh,
    build_bvh_chunked,
    closest_hit,
    any_hit,
)
from glaze_tpu.accel.fat import (
    FatBVH,
    build_bvh_fat,
    closest_hit_fat,
    any_hit_fat,
)

# Tree selection. The fat-leaf MXU drain was measured to TIE the classic
# VPU drain on the real workload, so CLASSIC is the default everywhere.
# The full evidence chain (Sponza-class 1080p bench, captured bounce
# rays, tools/bench_fat_ab.py + bench.py r3):
#   * 512k MOST-coherent rays (head of the Morton sort): fat 138 ms vs
#     classic 171 ms — the subset that motivated a hybrid attempt.
#   * FULL 2.09M-ray bounce mix: fat 864.8 ms vs classic 864.9 — a tie;
#     the fat win exists only on the coherent head.
#   * e2e hybrid launch 1932 ms vs classic 1801 (bounce-phase counter
#     1.59 vs 1.81 Mrays/s) — a 7% net LOSS.
#   * why: at K=16 the (16,4T)@(16,128) contraction runs at ~0.19
#     cy/tri-lane-test — the VPU drain's measured 0.18. In-situ pricing
#     (GLAZE_FAT_DOT2 epsilon-dot) shows the dot dominating the drain,
#     and its cost scales with OUTPUT SIZE: batching Q slabs into one
#     wide dot is 3x slower (413 ms), DEFAULT precision loses hits and
#     inflates traversal (235 ms). No MXU formulation lever is left:
#     M=4T outputs and K=16 features are intrinsic to Moller-Trumbore.
# GLAZE_TREE=classic|fat|hybrid overrides for re-testing on future
# toolchains; legacy GLAZE_FATLEAF=0/1 maps to classic/fat.
_FAT_NODES_BUDGET = 12 * 1024 * 1024


def tree_mode() -> str:
    v = os.environ.get("GLAZE_TREE", "")
    if v in ("classic", "fat", "hybrid"):
        return v
    legacy = os.environ.get("GLAZE_FATLEAF", "")
    if legacy == "1":
        return "fat"
    if legacy == "0":
        return "classic"
    return "classic"


def build_bvh_auto(tri_verts, leaf_size=None):
    """Builds the traversal structure(s) the current backend prefers.

    Returns ``(bvh, tri_order, bvh_any)``: ``bvh`` serves closest-hit
    traces and defines the triangle order [build_bvh contract];
    ``bvh_any`` is the classic any-hit tree in hybrid mode, else None.
    Falls back to classic-only when the fat node slab would exceed the
    VMEM budget."""
    mode = tree_mode()
    if mode in ("fat", "hybrid"):
        bvh, order = build_bvh_fat(tri_verts, leaf_size)
        slab = (bvh.nodes16.shape[0] // 8) * 128 * 4
        if slab <= _FAT_NODES_BUDGET:
            if mode == "hybrid":
                any_tree, _ = build_bvh_chunked(tri_verts)
                return bvh, order, any_tree
            return bvh, order, None
    b, order = build_bvh_chunked(tri_verts)
    return b, order, None


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
    if isinstance(bvh, FatBVH):
        if _on_tpu():
            from glaze_tpu.accel.traverse_fat import closest_hit_fat_pallas

            return closest_hit_fat_pallas(bvh, origin, direction, t_max)
        return closest_hit_fat(bvh, origin, direction, t_max)
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
    if isinstance(bvh, FatBVH):
        if _on_tpu():
            from glaze_tpu.accel.traverse_fat import any_hit_fat_pallas

            return any_hit_fat_pallas(bvh, origin, direction, t_max,
                                      t_min=t_min, active=active)
        return any_hit_fat(bvh, origin, direction, t_max, t_min=t_min,
                           active=active)
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
    if isinstance(bvh, FatBVH):
        if _on_tpu():
            from glaze_tpu.accel.traverse_fat import closest_hit_fat_soa

            return closest_hit_fat_soa(bvh, origin3, direction3, t_max)
        import jax.numpy as jnp

        return closest_hit_fat(bvh, jnp.stack(origin3, -1),
                               jnp.stack(direction3, -1), t_max)
    if _on_tpu():
        from glaze_tpu.accel.traverse_pallas import closest_hit_soa

        return closest_hit_soa(bvh, origin3, direction3, t_max)
    import jax.numpy as jnp

    return closest_hit(bvh, jnp.stack(origin3, -1), jnp.stack(direction3, -1),
                       t_max)


def closest_hit_soa_masked_auto(bvh, origin3, direction3, t_max=None):
    """closest_hit_soa_auto honoring baked opacity-mask payloads
    (bvh.attach_tri_payload + pack_alpha_masks): provably-transparent
    cell hits are skipped in the walk; the extra ``mixed`` flag marks
    accepted hits that still need the exact texture test. Trees without
    payload behave exactly like closest_hit_soa_auto with every hit
    flagged mixed."""
    import jax.numpy as jnp

    if isinstance(bvh, ChunkedBVH):
        hit = None
        for chunk, off in zip(bvh.chunks, bvh.offsets):
            cap = t_max if hit is None else hit["t"]
            h = closest_hit_soa_masked_auto(chunk, origin3, direction3, cap)
            if hit is None:
                hit = dict(h)
                hit["tri"] = jnp.where(h["tri"] >= 0, h["tri"] + off, -1)
            else:
                better = h["tri"] >= 0
                hit = {
                    "t": jnp.where(better, h["t"], hit["t"]),
                    "tri": jnp.where(better, h["tri"] + off, hit["tri"]),
                    "u": jnp.where(better, h["u"], hit["u"]),
                    "v": jnp.where(better, h["v"], hit["v"]),
                    "mixed": jnp.where(better, h["mixed"], hit["mixed"]),
                }
        return hit
    if isinstance(bvh, FatBVH):
        out = closest_hit_soa_auto(bvh, origin3, direction3, t_max)
        return dict(out, mixed=out["tri"] >= 0)
    if _on_tpu():
        from glaze_tpu.accel.traverse_pallas import closest_hit_soa_masked

        return closest_hit_soa_masked(bvh, origin3, direction3, t_max)
    from glaze_tpu.accel.bvh import closest_hit_masked

    return closest_hit_masked(bvh, jnp.stack(origin3, -1),
                              jnp.stack(direction3, -1), t_max)


def masked_anyhit_ok(bvh) -> bool:
    """True when any_hit_soa_masked_auto will REALLY run the 3-state
    masked kernels for this tree (payload present and, on TPU, the
    windowed kernel applies). Callers that resolve ``pending`` against
    only the alpha subset MUST gate on this: the unmasked fallback
    reports every potential blocker as pending, which needs FULL-scene
    resolution."""
    if isinstance(bvh, ChunkedBVH):
        return all(masked_anyhit_ok(c) for c in bvh.chunks)
    if isinstance(bvh, FatBVH):
        return False
    tri = getattr(bvh, "tri", None)
    if tri is None or tri.ndim != 2 or tri.shape[1] <= 9:
        return False
    if _on_tpu():
        from glaze_tpu.accel.traverse_pallas import (WINDOWED_ANYHIT,
                                                     _residency)

        nodes_res, _ = _residency(bvh.nodes16, bvh.tri8)
        return bool(WINDOWED_ANYHIT and nodes_res)
    return True


def any_hit_soa_masked_auto(bvh, origin3, direction3, t_max, t_min=1e-3,
                            active=None):
    """any_hit_soa_auto honoring baked opacity cells: returns
    ``(blocked, pending)`` — see traverse_pallas.any_hit_soa_masked.
    Trees without payload (or fat trees) report every potential blocker
    as pending, which callers resolve exactly."""
    import jax.numpy as jnp

    if isinstance(bvh, ChunkedBVH):
        blocked = pending = None
        for chunk in bvh.chunks:
            a = active if blocked is None else (
                ~blocked if active is None else (active & ~blocked))
            b, p = any_hit_soa_masked_auto(chunk, origin3, direction3,
                                           t_max, t_min=t_min, active=a)
            blocked = b if blocked is None else (blocked | b)
            pending = p if pending is None else (pending | p)
        return blocked, pending & ~blocked
    if isinstance(bvh, FatBVH):
        blocked = any_hit_soa_auto(bvh, origin3, direction3, t_max,
                                   t_min=t_min, active=active)
        return jnp.zeros_like(blocked), blocked
    if _on_tpu():
        from glaze_tpu.accel.traverse_pallas import any_hit_soa_masked

        return any_hit_soa_masked(bvh, origin3, direction3, t_max,
                                  t_min=t_min, active=active)
    from glaze_tpu.accel.bvh import any_hit_masked

    return any_hit_masked(bvh, jnp.stack(origin3, -1),
                          jnp.stack(direction3, -1), t_max, t_min=t_min,
                          active=active)


def any_hit_soa_auto(bvh, origin3, direction3, t_max, t_min=1e-3, active=None):
    if isinstance(bvh, ChunkedBVH):
        return _chunked_any(
            bvh,
            lambda c, a: any_hit_soa_auto(c, origin3, direction3, t_max,
                                          t_min=t_min, active=a),
            active)
    if isinstance(bvh, FatBVH):
        if _on_tpu():
            from glaze_tpu.accel.traverse_fat import any_hit_fat_soa

            return any_hit_fat_soa(bvh, origin3, direction3, t_max,
                                   t_min=t_min, active=active)
        import jax.numpy as jnp

        return any_hit_fat(bvh, jnp.stack(origin3, -1),
                           jnp.stack(direction3, -1), t_max, t_min=t_min,
                           active=active)
    if _on_tpu():
        from glaze_tpu.accel.traverse_pallas import any_hit_soa

        return any_hit_soa(bvh, origin3, direction3, t_max, t_min=t_min,
                           active=active)
    import jax.numpy as jnp

    return any_hit(bvh, jnp.stack(origin3, -1), jnp.stack(direction3, -1),
                   t_max, t_min=t_min, active=active)


__all__ = [
    "BVH", "ChunkedBVH", "FatBVH", "build_bvh", "build_bvh_chunked",
    "build_bvh_fat", "build_bvh_auto",
    "closest_hit", "any_hit", "closest_hit_fat", "any_hit_fat",
    "closest_hit_auto", "any_hit_auto",
    "closest_hit_soa_auto", "any_hit_soa_auto",
    "closest_hit_soa_masked_auto", "any_hit_soa_masked_auto",
]
