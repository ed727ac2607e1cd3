"""Fat-leaf BVH: few large leaves drained on the MXU.

The round-2 cost model localized 86% of traversal time in the per-node
walk + 8-triangle VPU leaf drains (row-union scheduling waste). This
variant shrinks the tree ~8-16x (LEAF_SIZE 64-128 vs 8) and tests a WHOLE
leaf against a 128-ray row with one MXU matmul: Moller-Trumbore is
multilinear in the per-ray features x = [o x d, o, d, 1], so a
per-triangle 16x4 coefficient block maps x to (det, u*det, v*det, t*det)
and a leaf is one dot_general of (16, 4T) coefficients with (16, 128)
features. Exact vs the scalar reference at f32 (tools/bench_mxu.py:
rel t err ~1e-7; the per-leaf origin shift keeps the bilinear expansion
conditioned). Replaces the reference's hardware BLAS traversal
(``traceRayEXT``, lib/src/shaders/path_trace.rgen:169).

Node layout matches :mod:`glaze_tpu.accel.bvh` (8 octant skip-link DFS
orders, 16 nodes per 128-lane row) except leaf meta stores the LEAF INDEX
(tri range = [leaf*T, leaf*T + T), padding rows degenerate) instead of
the packed first*8+count.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from glaze_tpu.accel.bvh import (
    SENTINEL,
    T_MIN,
    _pack_lane_dense,
    _slab_test,
    _tri_intersect,
    build_host_octants,
)

INF = np.float32(np.inf)

LEAF_SIZE_FAT = int(os.environ.get("GLAZE_FAT_LEAF", "128"))
F = 16  # feature rows (10 used: o'xd, o', d, 1)
DET_EPS = 1e-12


@jax.tree_util.register_pytree_node_class
class FatBVH:
    """Device-resident fat-leaf BVH.

    ``nodes``: (M, 8) octant-0 plain rows (XLA fallback + root box).
    ``nodes16``: (8*ceil(M/16)r8, 128) all-octant lane-dense packing.
    ``tri``: (L*T, 9) leaf-aligned padded (v0, e1, e2) rows.
    ``leafmat``: (L*16, 4*T) per-leaf MT coefficient blocks
        [det | u*det | v*det | t*det] (one (16, 4T) slab per leaf).
    ``n_nodes``/``n_tris``/``leaf_size`` are static aux.
    """

    def __init__(self, nodes, tri, nodes16, leafmat,
                 n_nodes: int, n_tris: int, leaf_size: int):
        self.nodes = nodes
        self.tri = tri
        self.nodes16 = nodes16
        self.leafmat = leafmat
        self.n_nodes = int(n_nodes)
        self.n_tris = int(n_tris)
        self.leaf_size = int(leaf_size)

    def tree_flatten(self):
        return (
            (self.nodes, self.tri, self.nodes16, self.leafmat),
            (self.n_nodes, self.n_tris, self.leaf_size),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def leaf_matrices(tri_rows: np.ndarray, leaf_size: int):
    """(L*T, 9) leaf-aligned (v0, e1, e2) rows -> (L*16, 4T) coefficient
    slabs. Vectorized; padding rows (all zero) produce all-zero columns
    -> det 0 -> never valid.

    Slabs are UNCENTRED (world-space v0): on the real bench scene the
    f32 matmul then matches an f64 scalar Moller-Trumbore to rel t err
    p99 2.9e-6 / max 1.3e-5, u/v p99 3.7e-5, with ~1/400 borderline-hit
    flips (Monte-Carlo-noise scale). Uncentred slabs let the kernel
    build ray features ONCE per row instead of once per (row, leaf)
    pair, which is what makes batched MXU drains cheap."""
    t = leaf_size
    n = tri_rows.shape[0]
    assert n % t == 0
    L = n // t
    r = tri_rows.reshape(L, t, 9).astype(np.float64)
    v0, e1, e2 = r[..., 0:3], r[..., 3:6], r[..., 6:9]
    real = (np.abs(e1).sum(-1) + np.abs(e2).sum(-1)) > 0  # (L, T)
    n12 = np.cross(e1, e2)
    m = np.zeros((L, F, 4 * t), np.float64)
    m[:, 6:9, 0 * t:1 * t] = np.cross(e2, e1).transpose(0, 2, 1)
    m[:, 0:3, 1 * t:2 * t] = e2.transpose(0, 2, 1)
    m[:, 6:9, 1 * t:2 * t] = -np.cross(e2, v0).transpose(0, 2, 1)
    m[:, 0:3, 2 * t:3 * t] = -e1.transpose(0, 2, 1)
    m[:, 6:9, 2 * t:3 * t] = -np.cross(v0, e1).transpose(0, 2, 1)
    m[:, 3:6, 3 * t:4 * t] = n12.transpose(0, 2, 1)
    m[:, 9, 3 * t:4 * t] = -(v0 * n12).sum(-1)
    # zero out padding columns entirely (paranoia: keeps det exactly 0)
    pad = ~real
    for blk in range(4):
        mm = m[:, :, blk * t:(blk + 1) * t]
        mm[np.broadcast_to(pad[:, None, :], mm.shape)] = 0.0
    # spare row 10 (features[10] == 0, so it never contributes to the
    # matmul) carries the leaf's base triangle index: the drain kernel
    # reads it from the slab it already DMA'd instead of re-extracting
    # the leaf id from the queue ring (f32 is exact up to 2^24 tris)
    m[:, 10, 0] = np.arange(L, dtype=np.float64) * t
    return m.reshape(L * F, 4 * t).astype(np.float32)


def _pack_octant_nodes_fat(oct_tables: dict, m: int, leaf_size: int):
    """8 octant layouts, leaf meta = leaf index (first // leaf_size)."""
    packed = []
    nodes0 = None
    for o in range(8):
        nodes = np.zeros((m, 8), np.float32)
        nodes[:, 0:3] = oct_tables["bmin"][o]
        nodes[:, 3:6] = oct_tables["bmax"][o]
        is_leaf = oct_tables["first"][o] >= 0
        meta = np.where(is_leaf, oct_tables["first"][o] // leaf_size,
                        -1).astype(np.int32)
        skip = np.where(oct_tables["skip"][o] < 0, m,
                        oct_tables["skip"][o]).astype(np.int32)
        nodes[:, 6] = meta.view(np.float32)
        nodes[:, 7] = skip.view(np.float32)
        p = _pack_lane_dense(nodes, 16, 8)
        rows8 = -(-p.shape[0] // 8) * 8
        if rows8 != p.shape[0]:
            p = np.concatenate(
                [p, np.zeros((rows8 - p.shape[0], 128), np.float32)])
        packed.append(p)
        if o == 0:
            nodes0 = nodes
    return np.concatenate(packed, axis=0), nodes0


def build_bvh_fat(tri_verts: np.ndarray, leaf_size: int | None = None):
    """Builds a FatBVH over (N, 3, 3) world-space triangles.

    Returns ``(bvh, tri_order)`` with the :func:`build_bvh` contract
    (padded leaf-aligned uint32 permutation, SENTINEL = padding).
    """
    if leaf_size is None:
        leaf_size = LEAF_SIZE_FAT
    tri_verts = np.ascontiguousarray(tri_verts, np.float32)
    n = tri_verts.shape[0]
    if n == 0:
        tri0 = np.zeros((leaf_size, 9), np.float32)
        lm = leaf_matrices(tri0, leaf_size)
        nodes = np.zeros((1, 8), np.float32)
        meta = np.zeros((1, 2), np.int32)
        meta[0] = [0, 1]
        nodes[:, 6:8] = meta.view(np.float32)
        n16 = _pack_lane_dense(nodes, 16, 8)
        n16 = np.concatenate(
            [n16, np.zeros((8 - n16.shape[0] % 8, 128), np.float32)]
        ) if n16.shape[0] % 8 else n16
        return (
            FatBVH(jnp.asarray(nodes), jnp.asarray(tri0),
                   jnp.asarray(np.tile(n16, (8, 1))), jnp.asarray(lm),
                   1, 0, leaf_size),
            np.zeros(0, np.uint32),
        )
    oct_tables = build_host_octants(tri_verts, leaf_size)
    m = oct_tables["bmin"].shape[1]
    order = oct_tables["tri_order"]
    sent = order == SENTINEL
    safe = np.where(sent, 0, order).astype(np.int64)
    tri_sorted = tri_verts[safe]
    tri_sorted[sent] = 0.0
    v0 = tri_sorted[:, 0]
    e1 = tri_sorted[:, 1] - v0
    e2 = tri_sorted[:, 2] - v0
    tri = np.concatenate([v0, e1, e2], axis=1).astype(np.float32)

    leafmat = leaf_matrices(tri, leaf_size)
    nodes16_oct, nodes0 = _pack_octant_nodes_fat(oct_tables, m, leaf_size)
    return (
        FatBVH(jnp.asarray(nodes0), jnp.asarray(tri),
               jnp.asarray(nodes16_oct), jnp.asarray(leafmat),
               int(m), int(n), leaf_size),
        order,
    )


# ---------------------------------------------------------------------------
# XLA fallback traversal (CPU tests / multichip dryrun)
# ---------------------------------------------------------------------------


def closest_hit_fat(bvh: FatBVH, origin, direction, t_max=None):
    """Batched XLA walker over the fat tree (same contract as
    :func:`glaze_tpu.accel.bvh.closest_hit`)."""
    r = origin.shape[0]
    m = bvh.n_nodes
    t = bvh.leaf_size
    inv_dir = jnp.where(
        jnp.abs(direction) < 1e-20,
        jnp.float32(1e20) * jnp.sign(direction)
        + jnp.float32(1e20) * (direction == 0.0),
        1.0 / direction,
    )
    if t_max is None:
        t0 = jnp.full((r,), INF, jnp.float32)
    else:
        t0 = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))

    def cond(state):
        return jnp.any(state[0] < m)

    def body(state):
        ptr, best_t, best_tri, best_u, best_v = state
        safe_ptr = jnp.minimum(ptr, m - 1)
        row = bvh.nodes[safe_ptr]
        meta = row[..., 6].view(jnp.int32)
        skip = row[..., 7].view(jnp.int32)
        active = ptr < m
        box_hit = _slab_test(row, origin, inv_dir, best_t) & active
        is_leaf = meta >= 0
        first = jnp.maximum(meta, 0) * t

        def leaf_step(k, carry):
            bt, btri, bu, bv = carry
            tri_idx = jnp.minimum(first + k, bvh.tri.shape[0] - 1)
            valid = box_hit & is_leaf
            trow = bvh.tri[tri_idx]
            tt, u, v, hit = _tri_intersect(trow, origin, direction)
            better = valid & hit & (tt < bt)
            return (jnp.where(better, tt, bt),
                    jnp.where(better, tri_idx, btri),
                    jnp.where(better, u, bu),
                    jnp.where(better, v, bv))

        best_t, best_tri, best_u, best_v = jax.lax.fori_loop(
            0, t, leaf_step, (best_t, best_tri, best_u, best_v))
        descend = box_hit & ~is_leaf
        new_ptr = jnp.where(descend, ptr + 1, skip)
        return (jnp.where(active, new_ptr, ptr), best_t, best_tri,
                best_u, best_v)

    init = (jnp.zeros((r,), jnp.int32), t0, jnp.full((r,), -1, jnp.int32),
            jnp.zeros((r,), jnp.float32), jnp.zeros((r,), jnp.float32))
    _, tt, tri, u, v = jax.lax.while_loop(cond, body, init)
    tt = jnp.where(tri >= 0, tt, INF)
    if bvh.n_tris == 0:
        tt = jnp.full_like(tt, INF)
        tri = jnp.full_like(tri, -1)
    return {"t": tt, "tri": tri, "u": u, "v": v}


def any_hit_fat(bvh: FatBVH, origin, direction, t_max, t_min=1e-3,
                active=None):
    r = origin.shape[0]
    m = bvh.n_nodes
    t_leaf = bvh.leaf_size
    t_min = jnp.float32(t_min)
    inv_dir = jnp.where(
        jnp.abs(direction) < 1e-20,
        jnp.float32(1e20) * jnp.sign(direction)
        + jnp.float32(1e20) * (direction == 0.0),
        1.0 / direction,
    )
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    start = jnp.zeros((r,), jnp.int32)
    if active is not None:
        start = jnp.where(active, start, m)

    def cond(state):
        ptr, hit = state
        return jnp.any((ptr < m) & ~hit)

    def body(state):
        ptr, hit_any = state
        safe_ptr = jnp.minimum(ptr, m - 1)
        row = bvh.nodes[safe_ptr]
        meta = row[..., 6].view(jnp.int32)
        skip = row[..., 7].view(jnp.int32)
        lane_on = (ptr < m) & ~hit_any
        box_hit = _slab_test(row, origin, inv_dir, t_max) & lane_on
        is_leaf = meta >= 0
        first = jnp.maximum(meta, 0) * t_leaf

        def leaf_step(k, acc):
            tri_idx = jnp.minimum(first + k, bvh.tri.shape[0] - 1)
            valid = box_hit & is_leaf
            tt, _, _, hit = _tri_intersect(bvh.tri[tri_idx], origin,
                                           direction)
            return acc | (valid & hit & (tt > t_min) & (tt < t_max))

        hit_any = jax.lax.fori_loop(0, t_leaf, leaf_step, hit_any)
        descend = box_hit & ~is_leaf
        new_ptr = jnp.where(descend, ptr + 1, skip)
        return jnp.where(lane_on, new_ptr, ptr), hit_any

    init = (start, jnp.zeros((r,), bool))
    _, hit = jax.lax.while_loop(cond, body, init)
    if bvh.n_tris == 0:
        hit = jnp.zeros_like(hit)
    return hit
