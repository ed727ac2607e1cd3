"""Pallas TPU packet-traversal kernels (the RT-core replacement).

Why a kernel: XLA lowers the gather-per-iteration traversal loop to
hundreds of tiny HBM-bound ops per step (measured 0.03 Mrays/s on chip).
Here the ENTIRE trace is one fused kernel: the BVH node and triangle
tables live in VMEM in 128-lane-dense packing, a packet of
PACKET_ROWS*128 rays walks the skip-link tree together behind one scalar
node pointer (classic packet traversal), node/triangle loads are a
sublane dynamic-slice + an in-tile lane gather (the only dynamic-gather
form the VPU supports), and all intersection math is dense (rows, 128)
VPU work.

Packet semantics: a node is visited if ANY ray in the packet wants it;
per-ray t_best pruning still applies inside the packet. Coherent packets
(primary, shadow) visit near the per-ray optimum; bounce packets stay in
pixel order, which remains spatially coherent.

Layout contract (built by :func:`glaze_tpu.accel.bvh.build_bvh`):
  nodes16 (ceil(M/16), 128): node i at [i>>4, (i&15)*8 : +8] =
      [bmin.xyz, bmax.xyz, bitcast(meta), bitcast(skip)]
  tri8    (ceil(N/8), 128):  tri i at [i>>3, (i&7)*16 : +9] = v0, e1, e2
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from glaze_tpu.accel.bvh import T_MIN

PACKET_ROWS = 16  # rays per packet = PACKET_ROWS * 128
LANES = 128

# VMEM budgets for the resident BVH tables (one octant node slab + the
# triangle rows; VMEM is ~16 MB total with ~0.5 MB of ray blocks). The
# while-while kernels only need the NODE slab resident — leaf triangle
# rows are DMA'd from HBM per leaf phase — so node budget is generous and
# triangles become resident only when both fit together. Scenes whose
# NODE slab exceeds the budget should be CHUNKED (build_bvh_chunked).
# env overrides exist so tools/check_tpu.py can force the streamed
# (tri_resident=False) kernels on a scene that normally fits, and diff
# them against the resident kernels ON HARDWARE (Mosaic DMA/semaphore
# scheduling is not exercised by interpret-mode CPU tests)
NODES_VMEM_BUDGET = int(os.environ.get("GLAZE_NODES_VMEM_BUDGET",
                                       12 * 1024 * 1024))
TRI_VMEM_BUDGET = int(os.environ.get("GLAZE_TRI_VMEM_BUDGET",
                                     12 * 1024 * 1024))
COMBINED_VMEM_BUDGET = int(os.environ.get("GLAZE_COMBINED_VMEM_BUDGET",
                                          14 * 1024 * 1024))

def _load_fields(table_ref, item, per_row, stride):
    """Loads one packed item; returns an (8, 128) value whose lane f holds
    field f%stride in every sublane (an in-tile lane gather — the only
    dynamic-gather form the VPU supports)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
    row = table_ref[pl.ds(item // per_row, 1), :]
    rowb = jnp.broadcast_to(row, (8, LANES))
    idx = (item % per_row) * stride + lane % stride
    return jnp.take_along_axis(rowb, idx, axis=1)


def _load_row(table_ref, item, per_row):
    """One packed item's 128-lane row, broadcast to (8, 128)."""
    row = table_ref[pl.ds(item // per_row, 1), :]
    return jnp.broadcast_to(row, (8, LANES)), (item % per_row)


def _field(rowb, base, f):
    """Broadcasts field ``base*stride + f`` to all lanes as (1, 128) —
    a full-lane dynamic gather instead of a scalar extract (extracts
    measured ~25 cycles each; gathers are plain vreg ops). With 8-aligned
    leaves ``base + f`` is a Python int, making the index a compile-time
    constant. (A static slice + broadcast instead trips Mosaic's
    unimplemented sublane+lane broadcast.)"""
    idx = jnp.full((8, LANES), base + f, jnp.int32)
    return jnp.take_along_axis(rowb, idx, axis=1)[0:1, :]


def _node_fields(rowb, slot):
    """All 8 node fields in ONE dynamic gather: returns (8, 128) where
    sublane f holds field f broadcast across the 128 lanes. Replaces 8
    separate per-field gathers (each ~a full gather's latency)."""
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    return jnp.take_along_axis(rowb, slot * 8 + sub, axis=1)


def _slab(bmin, bmax, ox, oy, oz, ix, iy, iz, t_cap):
    """Packet ray/AABB test against one node (scalar box, vector rays)."""
    t0x = (bmin[0] - ox) * ix
    t1x = (bmax[0] - ox) * ix
    t0y = (bmin[1] - oy) * iy
    t1y = (bmax[1] - oy) * iy
    t0z = (bmin[2] - oz) * iz
    t1z = (bmax[2] - oz) * iz
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.minimum(t0z, t1z),
    )
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.maximum(t0z, t1z),
    )
    return (tn <= tf) & (tf >= T_MIN) & (tn <= t_cap)


def _safe_inv(d):
    tiny = jnp.abs(d) < 1e-20
    return jnp.where(tiny, 1e20, 1.0 / jnp.where(tiny, 1.0, d))


def _load_tables(nodes_hbm, tri_hbm, oct_ref, nodes_ref, tri_ref, sems,
                 nodes_resident, tri_resident):
    """DMA of the BVH tables into persistent VMEM scratch.

    ``nodes_hbm`` stacks 8 octant-ordered layouts ((8*M16, 128)); each
    packet copies the slab for ITS direction octant (~3 MB, a few us) so
    the skip-link walk runs front-to-back. Triangles are octant-invariant
    and copied once on grid step 0 (TPU scratch persists across steps).
    Streaming tables through the block pipeline instead measured
    90 ms/call inside a fused scan.

    Tables beyond the VMEM budgets are NOT copied (``*_resident=False``);
    the walk then DMAs individual rows from HBM on demand — slower but any
    scene size runs.
    """
    if nodes_resident:
        m16 = nodes_hbm.shape[0] // 8
        oct_ = oct_ref[pl.program_id(0)]
        n = pltpu.make_async_copy(
            nodes_hbm.at[pl.ds(oct_ * m16, m16), :], nodes_ref, sems.at[0]
        )
        n.start()
    if tri_resident:
        @pl.when(pl.program_id(0) == 0)
        def _():
            t = pltpu.make_async_copy(tri_hbm, tri_ref, sems.at[1])
            t.start()
            t.wait()
    if nodes_resident:
        n.wait()


def _load_row_streamed(hbm_ref, row_idx, scratch, sem):
    """DMA one 128-lane row from an HBM table and broadcast it."""
    cp = pltpu.make_async_copy(
        hbm_ref.at[pl.ds(row_idx, 1), :], scratch.at[pl.ds(0, 1), :], sem
    )
    cp.start()
    cp.wait()
    return jnp.broadcast_to(scratch[pl.ds(0, 1), :], (8, LANES))


def _tri_hit_rows(tri_rowb, base, ox, oy, oz, dx, dy, dz):
    """Moller-Trumbore of the whole packet against one triangle whose
    fields come as (1, 128) lane broadcasts from a loaded row."""
    f = lambda k: _field(tri_rowb, base, k)
    v0x, v0y, v0z = f(0), f(1), f(2)
    e1x, e1y, e1z = f(3), f(4), f(5)
    e2x, e2y, e2z = f(6), f(7), f(8)
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    ok = jnp.abs(det) >= 1e-12
    inv = jnp.where(ok, 1.0 / jnp.where(det == 0.0, 1.0, det), 0.0)
    tvx = ox - v0x
    tvy = oy - v0y
    tvz = oz - v0z
    u = (tvx * px + tvy * py + tvz * pz) * inv
    qx = tvy * e1z - tvz * e1y
    qy = tvz * e1x - tvx * e1z
    qz = tvx * e1y - tvy * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv
    t = (e2x * qx + e2y * qy + e2z * qz) * inv
    hit = ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > T_MIN)
    return t, u, v, hit


def _closest_kernel(oct_ref, nodes_hbm, tri_hbm, ox_ref, oy_ref, oz_ref,
                    dx_ref, dy_ref, dz_ref, tmax_ref,
                    t_ref, tri_out_ref, u_ref, v_ref,
                    nodes_ref, tri_ref, sems, *, n_nodes, n_tris,
                    leaf_size, nodes_resident=True, tri_resident=True):
    _load_tables(nodes_hbm, tri_hbm, oct_ref, nodes_ref, tri_ref, sems,
                 nodes_resident, tri_resident)
    m16 = nodes_hbm.shape[0] // 8
    oct_base = oct_ref[pl.program_id(0)] * m16
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    ix, iy, iz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)

    def node_row(ptr):
        if nodes_resident:
            return _load_row(nodes_ref, ptr, 16)
        return (
            _load_row_streamed(nodes_hbm, oct_base + ptr // 16, nodes_ref,
                               sems.at[0]),
            ptr % 16,
        )

    def tri_row(first):
        # leaves are LEAF_SIZE(8)-aligned, so the in-row slot is always 0:
        # returning the constant (not first % 8) makes every leaf field
        # gather a compile-time-constant lane index, which Mosaic lowers
        # to cheap broadcasts instead of dynamic gathers
        if tri_resident:
            row = tri_ref[pl.ds(first // 8, 1), :]
            return jnp.broadcast_to(row, (8, LANES)), 0
        return (
            _load_row_streamed(tri_hbm, first // 8, tri_ref, sems.at[1]),
            0,
        )

    # best-hit state lives in the OUTPUT refs; the loop carries only the
    # node pointer (vector loop carries spill to VMEM every iteration —
    # measured ~200 cycles/iteration of pure overhead)
    t_ref[:] = tmax_ref[:]
    tri_out_ref[:] = jnp.full(ox.shape, -1, jnp.int32)
    u_ref[:] = jnp.zeros(ox.shape, jnp.float32)
    v_ref[:] = jnp.zeros(ox.shape, jnp.float32)

    def cond(ptr):
        return ptr < n_nodes

    def body(ptr):
        rowb, slot = node_row(ptr)
        f8 = _node_fields(rowb, slot)
        bmin = (f8[0:1], f8[1:2], f8[2:3])
        bmax = (f8[3:4], f8[4:5], f8[5:6])
        meta = pltpu.bitcast(f8[6:7], jnp.int32)[0, 0]
        skip = pltpu.bitcast(f8[7:8], jnp.int32)[0, 0]
        hit = _slab(bmin, bmax, ox, oy, oz, ix, iy, iz, t_ref[:])
        any_hit = jnp.any(hit)
        is_leaf = meta >= 0

        @pl.when(any_hit & is_leaf)
        def _():
            first = meta >> 3  # leaf_size-aligned; padding rows degenerate
            t_best = t_ref[:]
            tri_best = tri_out_ref[:]
            u_best = u_ref[:]
            v_best = v_ref[:]
            trow, tslot = tri_row(first)
            base0 = tslot * 16
            for k in range(leaf_size):
                t, u, v, h = _tri_hit_rows(trow, base0 + k * 16, ox, oy, oz,
                                           dx, dy, dz)
                better = h & (t < t_best) & hit
                t_best = jnp.where(better, t, t_best)
                tri_best = jnp.where(better, first + k, tri_best)
                u_best = jnp.where(better, u, u_best)
                v_best = jnp.where(better, v, v_best)
            t_ref[:] = t_best
            tri_out_ref[:] = tri_best
            u_ref[:] = u_best
            v_ref[:] = v_best

        descend = any_hit & jnp.logical_not(is_leaf)
        return jnp.where(descend, ptr + 1, skip)

    jax.lax.while_loop(cond, body, jnp.int32(0))
    t_ref[:] = jnp.where(tri_out_ref[:] >= 0, t_ref[:], jnp.float32(jnp.inf))


def _closest_kernel_dual(oct_ref, nodes_hbm, tri_hbm, ox_ref, oy_ref, oz_ref,
                         dx_ref, dy_ref, dz_ref, tmax_ref,
                         t_ref, tri_out_ref, u_ref, v_ref,
                         nodes_ref, tri_ref, sems, *, n_nodes, n_tris,
                         leaf_size, n_walks=2):
    """Closest hit with ``n_walks`` INDEPENDENT packet walks interleaved in
    one loop body. Each walk owns PACKET_ROWS sublane rows of the block
    and its own scalar node pointer; the chains have no data dependencies,
    so the VLIW scheduler overlaps one walk's scalar decision latency
    (vector->scalar sync, branch) with the others' vector work. Iterations
    = max over walks of their visit counts (adjacent image tiles are
    balanced)."""
    _load_tables(nodes_hbm, tri_hbm, oct_ref, nodes_ref, tri_ref, sems,
                 True, True)
    R = PACKET_ROWS

    walks = []
    for w in range(n_walks):
        s = slice(w * R, (w + 1) * R)
        ox, oy, oz = ox_ref[s, :], oy_ref[s, :], oz_ref[s, :]
        dx, dy, dz = dx_ref[s, :], dy_ref[s, :], dz_ref[s, :]
        walks.append((s, ox, oy, oz, dx, dy, dz,
                      _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)))

    t_ref[:] = tmax_ref[:]
    tri_out_ref[:] = jnp.full(t_ref.shape, -1, jnp.int32)
    u_ref[:] = jnp.zeros(t_ref.shape, jnp.float32)
    v_ref[:] = jnp.zeros(t_ref.shape, jnp.float32)

    def cond(ptrs):
        alive = ptrs[0] < n_nodes
        for w in range(1, n_walks):
            alive = alive | (ptrs[w] < n_nodes)
        return alive

    def body(ptrs):
        new_ptrs = []
        for w, (s, ox, oy, oz, dx, dy, dz, ix, iy, iz) in enumerate(walks):
            ptr = ptrs[w]
            safe = jnp.minimum(ptr, n_nodes - 1)
            rowb, slot = _load_row(nodes_ref, safe, 16)
            f8 = _node_fields(rowb, slot)
            meta = pltpu.bitcast(f8[6:7], jnp.int32)[0, 0]
            skip = pltpu.bitcast(f8[7:8], jnp.int32)[0, 0]
            cap = jnp.where(ptr < n_nodes, t_ref[s, :], jnp.float32(-1.0))
            hit = _slab((f8[0:1], f8[1:2], f8[2:3]),
                        (f8[3:4], f8[4:5], f8[5:6]),
                        ox, oy, oz, ix, iy, iz, cap)
            any_hit = jnp.any(hit)
            is_leaf = meta >= 0

            @pl.when(any_hit & is_leaf)
            def _(s=s, hit=hit, meta=meta, walk=(ox, oy, oz, dx, dy, dz)):
                ox, oy, oz, dx, dy, dz = walk
                first = meta >> 3
                t_best = t_ref[s, :]
                tri_best = tri_out_ref[s, :]
                u_best = u_ref[s, :]
                v_best = v_ref[s, :]
                row = tri_ref[pl.ds(first // 8, 1), :]
                trow = jnp.broadcast_to(row, (8, LANES))
                for k in range(leaf_size):
                    t, u, v, h = _tri_hit_rows(trow, k * 16, ox, oy, oz,
                                               dx, dy, dz)
                    better = h & (t < t_best) & hit
                    t_best = jnp.where(better, t, t_best)
                    tri_best = jnp.where(better, first + k, tri_best)
                    u_best = jnp.where(better, u, u_best)
                    v_best = jnp.where(better, v, v_best)
                t_ref[s, :] = t_best
                tri_out_ref[s, :] = tri_best
                u_ref[s, :] = u_best
                v_ref[s, :] = v_best

            descend = any_hit & jnp.logical_not(is_leaf)
            nxt = jnp.where(descend, ptr + 1, skip)
            new_ptrs.append(jnp.where(ptr < n_nodes, nxt, ptr))
        return tuple(new_ptrs)

    jax.lax.while_loop(cond, body, tuple(jnp.int32(0)
                                         for _ in range(n_walks)))
    t_ref[:] = jnp.where(tri_out_ref[:] >= 0, t_ref[:], jnp.float32(jnp.inf))


def _closest_kernel_sub(oct_ref, nodes_hbm, tri_hbm, ox_ref, oy_ref, oz_ref,
                        dx_ref, dy_ref, dz_ref, tmax_ref,
                        t_ref, tri_out_ref, u_ref, v_ref,
                        nodes_ref, tri_ref, ntile_ref, ttile_ref, sems, *,
                        n_nodes, n_tris, leaf_size):
    """Sub-packet closest hit: each of the PACKET_ROWS sublane rows (128
    rays) walks the tree behind its OWN node pointer. Unions shrink from
    2048-ray to 128-ray granularity (measured 3.6x fewer serial iterations
    on bounce rays) and the 16 pointer chains are independent, letting the
    VLIW scalar unit overlap row loads with the previous row's vector
    work. Requires both tables VMEM-resident (chunk big scenes)."""
    _load_tables(nodes_hbm, tri_hbm, oct_ref, nodes_ref, tri_ref, sems,
                 True, True)
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    ix, iy, iz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)

    t_ref[:] = tmax_ref[:]
    tri_out_ref[:] = jnp.full(ox.shape, -1, jnp.int32)
    u_ref[:] = jnp.zeros(ox.shape, jnp.float32)
    v_ref[:] = jnp.zeros(ox.shape, jnp.float32)

    n_rows_tri = tri_ref.shape[0]

    def cond(ptrs):
        return jnp.any(ptrs < n_nodes)

    def body(ptrs):
        safe = jnp.minimum(ptrs, n_nodes - 1)
        # per-row node loads (independent scalar chains)
        for r in range(PACKET_ROWS):
            p_r = safe[r, 0] // 16
            ntile_ref[pl.ds(r, 1), :] = nodes_ref[pl.ds(p_r, 1), :]
        ntile = ntile_ref[:]
        base = (safe % 16) * 8

        def nf(f):
            return jnp.take_along_axis(ntile, base + f, axis=1)

        meta = pltpu.bitcast(nf(6), jnp.int32)
        skip = pltpu.bitcast(nf(7), jnp.int32)
        row_active = ptrs < n_nodes
        cap = jnp.where(row_active, t_ref[:], jnp.float32(-1.0))
        hit = _slab((nf(0), nf(1), nf(2)), (nf(3), nf(4), nf(5)),
                    ox, oy, oz, ix, iy, iz, cap)
        any_row = jnp.any(hit, axis=1, keepdims=True)
        is_leaf = meta >= 0

        # per-row triangle loads: unconditional (non-leaf rows load row 0
        # and mask the tests) so there is no per-row branching
        first = meta >> 3
        lrow = jnp.where(is_leaf & any_row, first >> 3, 0)
        lrow = jnp.minimum(lrow, n_rows_tri - 1)
        for r in range(PACKET_ROWS):
            ttile_ref[pl.ds(r, 1), :] = tri_ref[pl.ds(lrow[r, 0], 1), :]
        ttile = ttile_ref[:]

        valid = is_leaf & any_row & hit
        t_best = t_ref[:]
        tri_best = tri_out_ref[:]
        u_best = u_ref[:]
        v_best = v_ref[:]
        for k in range(leaf_size):
            f = lambda j: jnp.take_along_axis(
                ttile, jnp.full(ox.shape, k * 16 + j, jnp.int32), axis=1)
            t, u, v, h = _mt_fields(f, ox, oy, oz, dx, dy, dz)
            better = h & (t < t_best) & valid
            t_best = jnp.where(better, t, t_best)
            tri_best = jnp.where(better, first + k, tri_best)
            u_best = jnp.where(better, u, u_best)
            v_best = jnp.where(better, v, v_best)
        t_ref[:] = t_best
        tri_out_ref[:] = tri_best
        u_ref[:] = u_best
        v_ref[:] = v_best

        descend = any_row & jnp.logical_not(is_leaf)
        return jnp.where(row_active, jnp.where(descend, ptrs + 1, skip),
                         ptrs)

    ptrs0 = jnp.zeros(ox.shape, jnp.int32)
    jax.lax.while_loop(cond, body, ptrs0)
    t_ref[:] = jnp.where(tri_out_ref[:] >= 0, t_ref[:], jnp.float32(jnp.inf))


def _closest_kernel_ww(oct_ref, nodes_hbm, tri_hbm, ox_ref, oy_ref, oz_ref,
                       dx_ref, dy_ref, dz_ref, tmax_ref,
                       t_ref, tri_out_ref, u_ref, v_ref,
                       nodes_ref, tri_ref, ntile_ref, ttile_ref, sems,
                       leaf_sems, *, n_nodes, n_tris, leaf_size,
                       tri_resident):
    """While-while sub-packet closest hit.

    Each of the PACKET_ROWS sublane rows (128 rays) walks the skip-link
    tree behind its OWN pointer (3.6x fewer serial iterations than the
    2048-ray packet union on bounce rays), and — unlike
    :func:`_closest_kernel_sub` — leaf work is NOT paid every iteration:
    the INNER while walks internal nodes only, stalling a row when it
    enters a hit leaf; when every live row is stalled the OUTER body runs
    one dense leaf phase for all stalled rows at once (simulated mattest
    bounce schedule: ~2000 inner iterations + ~68 leaf phases per
    2048-ray tile vs ~7200 full-cost packet iterations).

    The leaf phase reads each row's one triangle row either from resident
    VMEM or via 16 parallel async DMAs from HBM (``tri_resident=False``)
    — so the triangle table never has to fit VMEM and big scenes keep a
    single tree instead of sequential chunks.
    """
    _load_tables(nodes_hbm, tri_hbm, oct_ref, nodes_ref, tri_ref, sems,
                 True, tri_resident)
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    ix, iy, iz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)

    t_ref[:] = tmax_ref[:]
    tri_out_ref[:] = jnp.full(ox.shape, -1, jnp.int32)
    u_ref[:] = jnp.zeros(ox.shape, jnp.float32)
    v_ref[:] = jnp.zeros(ox.shape, jnp.float32)

    max_tri_row = tri_hbm.shape[0] - 1

    def leaf_dma(r, lrow_r):
        return pltpu.make_async_copy(
            tri_hbm.at[pl.ds(lrow_r, 1), :],
            ttile_ref.at[pl.ds(r, 1), :],
            leaf_sems.at[r],
        )

    def icond(ic):
        p, m_ = ic
        return jnp.any((p < n_nodes) & (m_ < 0))

    def ibody(ic):
        p, m_ = ic
        safe = jnp.minimum(p, n_nodes - 1)
        for r in range(PACKET_ROWS):
            ntile_ref[pl.ds(r, 1), :] = nodes_ref[pl.ds(safe[r, 0] // 16, 1), :]
        ntile = ntile_ref[:]
        base = (safe % 16) * 8

        def nf(f):
            return jnp.take_along_axis(ntile, base + f, axis=1)

        meta = pltpu.bitcast(nf(6), jnp.int32)
        skip = pltpu.bitcast(nf(7), jnp.int32)
        walking = (p < n_nodes) & (m_ < 0)
        cap = jnp.where(walking, t_ref[:], jnp.float32(-1.0))
        hit = _slab((nf(0), nf(1), nf(2)), (nf(3), nf(4), nf(5)),
                    ox, oy, oz, ix, iy, iz, cap)
        any_row = jnp.any(hit, axis=1, keepdims=True)
        is_leaf = meta >= 0
        stall = walking & is_leaf & any_row
        new_m = jnp.where(stall, meta, m_)
        descend = any_row & jnp.logical_not(is_leaf)
        nxt = jnp.where(descend, p + 1, skip)
        return jnp.where(walking, nxt, p), new_m

    def cond(c):
        p, m_ = c
        return jnp.any((p < n_nodes) | (m_ >= 0))

    def body(c):
        ptrs, lm = jax.lax.while_loop(icond, ibody, c)

        @pl.when(jnp.any(lm >= 0))
        def _():
            valid_row = lm >= 0
            first = lm >> 3
            lrow = jnp.minimum(jnp.where(valid_row, first >> 3, 0),
                               max_tri_row)
            if tri_resident:
                for r in range(PACKET_ROWS):
                    ttile_ref[pl.ds(r, 1), :] = tri_ref[
                        pl.ds(lrow[r, 0], 1), :]
            else:
                for r in range(PACKET_ROWS):
                    leaf_dma(r, lrow[r, 0]).start()
                for r in range(PACKET_ROWS):
                    leaf_dma(r, lrow[r, 0]).wait()
            ttile = ttile_ref[:]
            t_best = t_ref[:]
            tri_best = tri_out_ref[:]
            u_best = u_ref[:]
            v_best = v_ref[:]
            for k in range(leaf_size):
                f = lambda j: jnp.take_along_axis(
                    ttile, jnp.full(ox.shape, k * 16 + j, jnp.int32), axis=1)
                t, u, v, h = _mt_fields(f, ox, oy, oz, dx, dy, dz)
                better = h & (t < t_best) & valid_row
                t_best = jnp.where(better, t, t_best)
                tri_best = jnp.where(better, first + k, tri_best)
                u_best = jnp.where(better, u, u_best)
                v_best = jnp.where(better, v, v_best)
            t_ref[:] = t_best
            tri_out_ref[:] = tri_best
            u_ref[:] = u_best
            v_ref[:] = v_best

        return ptrs, jnp.full(lm.shape, -1, jnp.int32)

    ptrs0 = jnp.zeros(ox.shape, jnp.int32)
    lm0 = jnp.full(ox.shape, -1, jnp.int32)
    jax.lax.while_loop(cond, body, (ptrs0, lm0))
    t_ref[:] = jnp.where(tri_out_ref[:] >= 0, t_ref[:], jnp.float32(jnp.inf))


# In-window steps per load round in the windowed kernels. Simulated
# (tools/sim_window.py, mattest bounce): per-row walks stay inside one
# aligned 16-node row for 3.78 steps on average; lockstep load-rounds per
# 2048-ray tile drop 678 (S=1) -> 249 (S=4) -> 211 (S=6). Full-bench
# sweep on the Sponza-class 1080p workload: S=3 3725ms / S=4 3797 /
# S=6 4184 -> default 3.
WINDOW_STEPS = int(os.environ.get("GLAZE_WINDOW_STEPS", "3"))
# Leaf-queue capacity before a drain phase triggers. Smaller keeps
# closest-hit t pruning fresher (queued leaves haven't updated t yet);
# larger amortizes the drain-round fixed cost over more rows.
QUEUE_MAX = int(os.environ.get("GLAZE_QUEUE_MAX", "8"))
# Any-hit can use a SHALLOWER queue: its blocked mask only updates at
# drain time, so pending leaves mean blocked lanes keep inflating the
# walk unions; a small queue trades drain frequency for mask freshness.
QUEUE_MAX_ANY = int(os.environ.get("GLAZE_QUEUE_MAX_ANY",
                                   os.environ.get("GLAZE_QUEUE_MAX", "8")))


def _closest_kernel_win(oct_ref, nodes_hbm, tri_hbm, ox_ref, oy_ref, oz_ref,
                        dx_ref, dy_ref, dz_ref, tmax_ref,
                        t_ref, tri_out_ref, u_ref, v_ref, *rest,
                        n_nodes, n_tris, leaf_size, tri_resident,
                        alpha_mask=False):
    """Windowed sub-packet closest hit.

    Each of the 16 sublane rows (128 rays) walks the skip-link tree behind
    its OWN pointer. Per outer round every row loads its current aligned
    16-node window ONCE (the expensive per-row scalar dynamic-slice), then
    takes up to WINDOW_STEPS walk steps via in-tile lane gathers — all
    dense vector work across the 16 rows at once. Rows whose pointer
    leaves the window idle until the next round's reload. Leaf hits do NOT
    stall the row: the leaf meta is pushed to a per-row FIFO ring
    (``queue_ref`` lanes) and the row keeps walking; when any row has
    QUEUE_MAX pending (or the walk ends) a drain phase pops one leaf per
    row per round and runs the 8-triangle Moller-Trumbore dense across all
    16 rows — so leaf work costs ~1/16th of the packet-union kernel's
    whole-packet leaf test. Deferred leaves mean slightly staler t-pruning
    during the walk; QUEUE_MAX bounds that.

    Streamed mode (``tri_resident=False``): drain rounds DOUBLE-BUFFER the
    16 per-row leaf DMAs from HBM — round k+1's rows are in flight while
    round k's Moller-Trumbore runs, so the HBM latency hides behind the
    dense leaf math instead of stalling every round (``ttile_ref`` holds 2
    banks of PACKET_ROWS rows; the drain loop is unrolled 2 rounds/body so
    bank indices stay static).

    ``alpha_mask``: baked 8x8 barycentric opacity masks (bvh.py
    pack_alpha_masks payload, triangle-row slots 9..12) are tested in the
    drain — the 128 lanes of a row all test the SAME triangle, so the
    mask words are one in-tile lane gather away. Hits on provably
    TRANSPARENT cells are skipped mid-walk (raytrace_hit.rahit's
    ignoreIntersectionEXT at zero re-trace cost); an extra ``mix_ref``
    output flags accepted hits on MIXED cells (the only ones the caller
    must still texture-test).
    """
    if alpha_mask:
        (mix_ref, nodes_ref, tri_ref, ntile_ref, ttile_ref, queue_ref,
         sems, leaf_sems) = rest
    else:
        (nodes_ref, tri_ref, ntile_ref, ttile_ref, queue_ref,
         sems, leaf_sems) = rest
        mix_ref = None
    _load_tables(nodes_hbm, tri_hbm, oct_ref, nodes_ref, tri_ref, sems,
                 True, tri_resident)
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    ix, iy, iz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)

    t_ref[:] = tmax_ref[:]
    tri_out_ref[:] = jnp.full(ox.shape, -1, jnp.int32)
    u_ref[:] = jnp.zeros(ox.shape, jnp.float32)
    v_ref[:] = jnp.zeros(ox.shape, jnp.float32)
    queue_ref[:] = jnp.zeros(ox.shape, jnp.int32)
    if alpha_mask:
        mix_ref[:] = jnp.zeros(ox.shape, jnp.int32)

    max_tri_row = tri_hbm.shape[0] - 1
    lanes = jax.lax.broadcasted_iota(jnp.int32, ox.shape, 1)

    def _queue_rows(qc, hcv):
        """(has, first, lrow) for the queue entries at position ``hcv``."""
        has = qc > hcv
        lm = jnp.take_along_axis(queue_ref[:], hcv % LANES, axis=1)
        first = lm >> 3
        lrow = jnp.minimum(jnp.where(has, first >> 3, 0), max_tri_row)
        return has, first, lrow

    def _issue(lrow, bank):
        for r in range(PACKET_ROWS):
            pltpu.make_async_copy(
                tri_hbm.at[pl.ds(lrow[r, 0], 1), :],
                ttile_ref.at[pl.ds(bank * PACKET_ROWS + r, 1), :],
                leaf_sems.at[bank * PACKET_ROWS + r],
            ).start()

    def _wait(bank):
        for r in range(PACKET_ROWS):
            pltpu.make_async_copy(
                tri_hbm.at[pl.ds(0, 1), :],
                ttile_ref.at[pl.ds(bank * PACKET_ROWS + r, 1), :],
                leaf_sems.at[bank * PACKET_ROWS + r],
            ).wait()

    def _mt_leaf(ttile, has, first):
        t_best = t_ref[:]
        tri_best = tri_out_ref[:]
        u_best = u_ref[:]
        v_best = v_ref[:]
        if alpha_mask:
            mix_best = mix_ref[:]
            ttile_i = pltpu.bitcast(ttile, jnp.int32)
        for k in range(leaf_size):
            f = lambda j: jnp.take_along_axis(
                ttile, jnp.full(ox.shape, k * 16 + j, jnp.int32), axis=1)
            t, u, v, h = _mt_fields(f, ox, oy, oz, dx, dy, dz)
            if alpha_mask:
                # 8x8 cell lookup. The 4 mask words sit at STATIC slots
                # (k*16+9..12): constant-index gathers lower to cheap
                # broadcasts (see _field), and the per-lane word choice
                # is 3 vector selects — a per-lane DYNAMIC gather here
                # instead measured +28% on the whole closest kernel.
                fi = lambda j: jnp.take_along_axis(
                    ttile_i, jnp.full(ox.shape, k * 16 + j, jnp.int32),
                    axis=1)
                w0, w1, w2, w3 = fi(9), fi(10), fi(11), fi(12)
                cu = jnp.clip((u * 8.0).astype(jnp.int32), 0, 7)
                cv = jnp.clip((v * 8.0).astype(jnp.int32), 0, 7)
                cell = cv * 8 + cu
                lo = (cell & 16) == 0
                mw = jnp.where((cell & 32) == 0,
                               jnp.where(lo, w0, w1),
                               jnp.where(lo, w2, w3))
                bits = (mw >> ((cell & 15) * 2)) & 3
                h = h & (bits != 2)
            better = h & (t < t_best) & has
            t_best = jnp.where(better, t, t_best)
            tri_best = jnp.where(better, first + k, tri_best)
            u_best = jnp.where(better, u, u_best)
            v_best = jnp.where(better, v, v_best)
            if alpha_mask:
                mix_best = jnp.where(better, (bits == 0).astype(jnp.int32),
                                     mix_best)
        t_ref[:] = t_best
        tri_out_ref[:] = tri_best
        u_ref[:] = u_best
        v_ref[:] = v_best
        if alpha_mask:
            mix_ref[:] = mix_best

    def drain_round(c):
        qc, hc = c
        has, first, lrow = _queue_rows(qc, hc)
        for r in range(PACKET_ROWS):
            ttile_ref[pl.ds(r, 1), :] = tri_ref[pl.ds(lrow[r, 0], 1), :]
        _mt_leaf(ttile_ref[pl.ds(0, PACKET_ROWS), :], has, first)
        return qc, jnp.where(has, hc + 1, hc)

    def drain_streamed(qc, hc):
        """Double-buffered drain: while bank p's rows feed the MT, bank
        1-p's DMAs for the next round are in flight."""
        has0, _, lrow0 = _queue_rows(qc, hc)

        @pl.when(jnp.any(has0))
        def _():
            _issue(lrow0, 0)

        def cond(c):
            qc, hc = c
            return jnp.any(qc > hc)

        def body(c):
            qc, hc = c
            # bank 0 round (hc)
            has, first, _ = _queue_rows(qc, hc)
            _wait(0)
            hc1 = jnp.where(has, hc + 1, hc)
            has1, first1, lrow1 = _queue_rows(qc, hc1)

            @pl.when(jnp.any(has1))
            def _():
                _issue(lrow1, 1)

            _mt_leaf(ttile_ref[pl.ds(0, PACKET_ROWS), :], has, first)

            # bank 1 round (hc1), runs only if anything was issued
            @pl.when(jnp.any(has1))
            def _():
                _wait(1)
                hc2 = jnp.where(has1, hc1 + 1, hc1)
                has2, _, lrow2 = _queue_rows(qc, hc2)

                @pl.when(jnp.any(has2))
                def _():
                    _issue(lrow2, 0)

                _mt_leaf(ttile_ref[pl.ds(PACKET_ROWS, PACKET_ROWS), :],
                         has1, first1)

            return qc, jnp.where(has1, hc1 + 1, hc1)

        jax.lax.while_loop(cond, body, (qc, hc))

    def cond(c):
        p, qc, hc = c
        return jnp.any((p < n_nodes) | (qc > hc))

    def body(c):
        p, qc, hc = c
        safe = jnp.minimum(p, n_nodes - 1)
        for r in range(PACKET_ROWS):
            ntile_ref[pl.ds(r, 1), :] = nodes_ref[pl.ds(safe[r, 0] // 16, 1), :]
        ntile = ntile_ref[:]
        win = safe // 16
        for _ in range(WINDOW_STEPS):
            inwin = ((p // 16) == win) & (p < n_nodes) & (qc - hc < QUEUE_MAX)
            base = (p % 16) * 8

            def nf(f):
                return jnp.take_along_axis(ntile, base + f, axis=1)

            meta = pltpu.bitcast(nf(6), jnp.int32)
            skip = pltpu.bitcast(nf(7), jnp.int32)
            cap = jnp.where(inwin, t_ref[:], jnp.float32(-1.0))
            hit = _slab((nf(0), nf(1), nf(2)), (nf(3), nf(4), nf(5)),
                        ox, oy, oz, ix, iy, iz, cap)
            any_row = jnp.any(hit, axis=1, keepdims=True)
            is_leaf = meta >= 0
            enq = inwin & is_leaf & any_row
            queue_ref[:] = jnp.where(enq & (lanes == qc % LANES), meta,
                                     queue_ref[:])
            qc = qc + enq.astype(jnp.int32)
            descend = any_row & jnp.logical_not(is_leaf)
            nxt = jnp.where(descend, p + 1, skip)
            p = jnp.where(inwin, nxt, p)

        drain = jnp.any(qc - hc >= QUEUE_MAX) | jnp.logical_not(
            jnp.any(p < n_nodes))

        @pl.when(drain & jnp.any(qc > hc))
        def _():
            if tri_resident:
                jax.lax.while_loop(
                    lambda c2: jnp.any(c2[0] > c2[1]), drain_round, (qc, hc))
            else:
                drain_streamed(qc, hc)
            # hc is recomputed below; the loop's effect is in the refs

        hc = jnp.where(drain, qc, hc)
        return p, qc, hc

    p0 = jnp.zeros(ox.shape, jnp.int32)
    z0 = jnp.zeros(ox.shape, jnp.int32)
    jax.lax.while_loop(cond, body, (p0, z0, z0))
    t_ref[:] = jnp.where(tri_out_ref[:] >= 0, t_ref[:], jnp.float32(jnp.inf))


def _anyhit_kernel_win(oct_ref, nodes_hbm, tri_hbm, ox_ref, oy_ref, oz_ref,
                       dx_ref, dy_ref, dz_ref, tmax_ref, active_ref,
                       hit_ref, *rest, n_nodes, n_tris,
                       leaf_size, t_min, tri_resident, alpha_mask=False):
    """Windowed sub-packet any hit (see _closest_kernel_win). Queued
    leaves set the blocked mask at drain time; rows whose lanes are all
    blocked jump past the end (per-row early exit).

    ``alpha_mask``: baked opacity cells in the triangle rows — an
    OPAQUE-cell hit blocks definitively, a TRANSPARENT-cell hit is
    ignored, a MIXED-cell hit sets the ``pend_ref`` output instead of
    blocking (the caller resolves pending lanes with the exact texture
    test). Occlusion semantics of raytrace_hit.rahit in one walk."""
    if alpha_mask:
        (pend_ref, nodes_ref, tri_ref, ntile_ref, ttile_ref,
         queue_ref, sems, leaf_sems) = rest
    else:
        (nodes_ref, tri_ref, ntile_ref, ttile_ref,
         queue_ref, sems, leaf_sems) = rest
        pend_ref = None
    _load_tables(nodes_hbm, tri_hbm, oct_ref, nodes_ref, tri_ref, sems,
                 True, tri_resident)
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    t_max = tmax_ref[:]
    needed0 = active_ref[:]
    ix, iy, iz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)
    hit_ref[:] = jnp.where(needed0 > 0, jnp.int32(0), jnp.int32(1))
    queue_ref[:] = jnp.zeros(ox.shape, jnp.int32)
    if alpha_mask:
        pend_ref[:] = jnp.zeros(ox.shape, jnp.int32)

    max_tri_row = tri_hbm.shape[0] - 1
    lanes = jax.lax.broadcasted_iota(jnp.int32, ox.shape, 1)

    def _queue_rows(qc, hcv):
        has = qc > hcv
        lm = jnp.take_along_axis(queue_ref[:], hcv % LANES, axis=1)
        first = lm >> 3
        lrow = jnp.minimum(jnp.where(has, first >> 3, 0), max_tri_row)
        return has, first, lrow

    def _issue(lrow, bank):
        for r in range(PACKET_ROWS):
            pltpu.make_async_copy(
                tri_hbm.at[pl.ds(lrow[r, 0], 1), :],
                ttile_ref.at[pl.ds(bank * PACKET_ROWS + r, 1), :],
                leaf_sems.at[bank * PACKET_ROWS + r],
            ).start()

    def _wait(bank):
        for r in range(PACKET_ROWS):
            pltpu.make_async_copy(
                tri_hbm.at[pl.ds(0, 1), :],
                ttile_ref.at[pl.ds(bank * PACKET_ROWS + r, 1), :],
                leaf_sems.at[bank * PACKET_ROWS + r],
            ).wait()

    def _mt_leaf(ttile, has):
        b = hit_ref[:]
        if alpha_mask:
            pend = pend_ref[:]
            ttile_i = pltpu.bitcast(ttile, jnp.int32)
        for k in range(leaf_size):
            f = lambda j: jnp.take_along_axis(
                ttile, jnp.full(ox.shape, k * 16 + j, jnp.int32), axis=1)
            t, u, v, h = _mt_fields(f, ox, oy, oz, dx, dy, dz)
            new = h & (t > t_min) & (t < t_max) & has
            if alpha_mask:
                # static-slot word fetch + vector select (see the
                # closest kernel's note: a dynamic gather here costs)
                fi = lambda j: jnp.take_along_axis(
                    ttile_i, jnp.full(ox.shape, k * 16 + j, jnp.int32),
                    axis=1)
                w0, w1, w2, w3 = fi(9), fi(10), fi(11), fi(12)
                cu = jnp.clip((u * 8.0).astype(jnp.int32), 0, 7)
                cv = jnp.clip((v * 8.0).astype(jnp.int32), 0, 7)
                cell = cv * 8 + cu
                lo = (cell & 16) == 0
                mw = jnp.where((cell & 32) == 0,
                               jnp.where(lo, w0, w1),
                               jnp.where(lo, w2, w3))
                bits = (mw >> ((cell & 15) * 2)) & 3
                pend = jnp.maximum(pend,
                                   (new & (bits == 0)).astype(jnp.int32))
                new = new & (bits == 1)
            b = jnp.maximum(b, new.astype(jnp.int32))
        hit_ref[:] = b
        if alpha_mask:
            pend_ref[:] = pend

    def drain_round(c):
        qc, hc = c
        has, first, lrow = _queue_rows(qc, hc)
        for r in range(PACKET_ROWS):
            ttile_ref[pl.ds(r, 1), :] = tri_ref[pl.ds(lrow[r, 0], 1), :]
        _mt_leaf(ttile_ref[pl.ds(0, PACKET_ROWS), :], has)
        return qc, jnp.where(has, hc + 1, hc)

    def drain_streamed(qc, hc):
        """Double-buffered leaf DMAs (see _closest_kernel_win)."""
        has0, _, lrow0 = _queue_rows(qc, hc)

        @pl.when(jnp.any(has0))
        def _():
            _issue(lrow0, 0)

        def cond(c):
            qc, hc = c
            return jnp.any(qc > hc)

        def body(c):
            qc, hc = c
            has, first, _ = _queue_rows(qc, hc)
            _wait(0)
            hc1 = jnp.where(has, hc + 1, hc)
            has1, first1, lrow1 = _queue_rows(qc, hc1)

            @pl.when(jnp.any(has1))
            def _():
                _issue(lrow1, 1)

            _mt_leaf(ttile_ref[pl.ds(0, PACKET_ROWS), :], has)

            @pl.when(jnp.any(has1))
            def _():
                _wait(1)
                hc2 = jnp.where(has1, hc1 + 1, hc1)
                has2, _, lrow2 = _queue_rows(qc, hc2)

                @pl.when(jnp.any(has2))
                def _():
                    _issue(lrow2, 0)

                _mt_leaf(ttile_ref[pl.ds(PACKET_ROWS, PACKET_ROWS), :], has1)

            return qc, jnp.where(has1, hc1 + 1, hc1)

        jax.lax.while_loop(cond, body, (qc, hc))

    def cond(c):
        p, qc, hc = c
        return jnp.any((p < n_nodes) | (qc > hc))

    def body(c):
        p, qc, hc = c
        safe = jnp.minimum(p, n_nodes - 1)
        for r in range(PACKET_ROWS):
            ntile_ref[pl.ds(r, 1), :] = nodes_ref[pl.ds(safe[r, 0] // 16, 1), :]
        ntile = ntile_ref[:]
        win = safe // 16
        blocked = hit_ref[:]
        for _ in range(WINDOW_STEPS):
            inwin = ((p // 16) == win) & (p < n_nodes) & (qc - hc < QUEUE_MAX_ANY)
            base = (p % 16) * 8

            def nf(f):
                return jnp.take_along_axis(ntile, base + f, axis=1)

            meta = pltpu.bitcast(nf(6), jnp.int32)
            skip = pltpu.bitcast(nf(7), jnp.int32)
            cap = jnp.where(inwin & (blocked == 0), t_max, jnp.float32(-1.0))
            hit = _slab((nf(0), nf(1), nf(2)), (nf(3), nf(4), nf(5)),
                        ox, oy, oz, ix, iy, iz, cap)
            any_row = jnp.any(hit, axis=1, keepdims=True)
            is_leaf = meta >= 0
            enq = inwin & is_leaf & any_row
            queue_ref[:] = jnp.where(enq & (lanes == qc % LANES), meta,
                                     queue_ref[:])
            qc = qc + enq.astype(jnp.int32)
            descend = any_row & jnp.logical_not(is_leaf)
            nxt = jnp.where(descend, p + 1, skip)
            p = jnp.where(inwin, nxt, p)

        drain = jnp.any(qc - hc >= QUEUE_MAX_ANY) | jnp.logical_not(
            jnp.any(p < n_nodes))

        @pl.when(drain & jnp.any(qc > hc))
        def _():
            if tri_resident:
                jax.lax.while_loop(
                    lambda c2: jnp.any(c2[0] > c2[1]), drain_round, (qc, hc))
            else:
                drain_streamed(qc, hc)

        hc = jnp.where(drain, qc, hc)
        # early-exit fully blocked rows once their queue is flushed
        row_done = jnp.all(hit_ref[:] > 0, axis=1, keepdims=True)
        p = jnp.where(row_done & (qc <= hc), n_nodes, p)
        return p, qc, hc

    p0 = jnp.zeros(ox.shape, jnp.int32)
    z0 = jnp.zeros(ox.shape, jnp.int32)
    jax.lax.while_loop(cond, body, (p0, z0, z0))
    hit_ref[:] = jnp.where(needed0 > 0, hit_ref[:], jnp.int32(0))
    if alpha_mask:
        # a lane that later found a definitive opaque blocker needs no
        # resolution; inactive lanes report nothing
        pend_ref[:] = jnp.where((needed0 > 0) & (hit_ref[:] == 0),
                                pend_ref[:], jnp.int32(0))


def _anyhit_kernel_ww(oct_ref, nodes_hbm, tri_hbm, ox_ref, oy_ref, oz_ref,
                      dx_ref, dy_ref, dz_ref, tmax_ref, active_ref,
                      hit_ref, nodes_ref, tri_ref, ntile_ref, ttile_ref,
                      sems, leaf_sems, *, n_nodes, n_tris, leaf_size, t_min,
                      tri_resident):
    """While-while sub-packet any hit (see _closest_kernel_ww). Rows whose
    lanes are all blocked jump past the end (per-row early exit)."""
    _load_tables(nodes_hbm, tri_hbm, oct_ref, nodes_ref, tri_ref, sems,
                 True, tri_resident)
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    t_max = tmax_ref[:]
    needed0 = active_ref[:]
    ix, iy, iz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)
    hit_ref[:] = jnp.where(needed0 > 0, jnp.int32(0), jnp.int32(1))

    max_tri_row = tri_hbm.shape[0] - 1

    def leaf_dma(r, lrow_r):
        return pltpu.make_async_copy(
            tri_hbm.at[pl.ds(lrow_r, 1), :],
            ttile_ref.at[pl.ds(r, 1), :],
            leaf_sems.at[r],
        )

    def icond(ic):
        p, m_ = ic
        return jnp.any((p < n_nodes) & (m_ < 0))

    def ibody(ic):
        p, m_ = ic
        safe = jnp.minimum(p, n_nodes - 1)
        for r in range(PACKET_ROWS):
            ntile_ref[pl.ds(r, 1), :] = nodes_ref[pl.ds(safe[r, 0] // 16, 1), :]
        ntile = ntile_ref[:]
        base = (safe % 16) * 8

        def nf(f):
            return jnp.take_along_axis(ntile, base + f, axis=1)

        meta = pltpu.bitcast(nf(6), jnp.int32)
        skip = pltpu.bitcast(nf(7), jnp.int32)
        walking = (p < n_nodes) & (m_ < 0)
        blocked = hit_ref[:]
        cap = jnp.where(walking & (blocked == 0), t_max, jnp.float32(-1.0))
        hit = _slab((nf(0), nf(1), nf(2)), (nf(3), nf(4), nf(5)),
                    ox, oy, oz, ix, iy, iz, cap)
        any_row = jnp.any(hit, axis=1, keepdims=True)
        is_leaf = meta >= 0
        stall = walking & is_leaf & any_row
        new_m = jnp.where(stall, meta, m_)
        descend = any_row & jnp.logical_not(is_leaf)
        nxt = jnp.where(descend, p + 1, skip)
        return jnp.where(walking, nxt, p), new_m

    def cond(c):
        p, m_ = c
        return jnp.any((p < n_nodes) | (m_ >= 0))

    def body(c):
        ptrs, lm = jax.lax.while_loop(icond, ibody, c)

        @pl.when(jnp.any(lm >= 0))
        def _():
            valid_row = lm >= 0
            first = lm >> 3
            lrow = jnp.minimum(jnp.where(valid_row, first >> 3, 0),
                               max_tri_row)
            if tri_resident:
                for r in range(PACKET_ROWS):
                    ttile_ref[pl.ds(r, 1), :] = tri_ref[
                        pl.ds(lrow[r, 0], 1), :]
            else:
                for r in range(PACKET_ROWS):
                    leaf_dma(r, lrow[r, 0]).start()
                for r in range(PACKET_ROWS):
                    leaf_dma(r, lrow[r, 0]).wait()
            ttile = ttile_ref[:]
            b = hit_ref[:]
            for k in range(leaf_size):
                f = lambda j: jnp.take_along_axis(
                    ttile, jnp.full(ox.shape, k * 16 + j, jnp.int32), axis=1)
                t, _, _, h = _mt_fields(f, ox, oy, oz, dx, dy, dz)
                new = h & (t > t_min) & (t < t_max) & valid_row
                b = jnp.maximum(b, new.astype(jnp.int32))
            hit_ref[:] = b

        row_done = jnp.all(hit_ref[:] > 0, axis=1, keepdims=True)
        return (jnp.where(row_done, n_nodes, ptrs),
                jnp.full(lm.shape, -1, jnp.int32))

    ptrs0 = jnp.zeros(ox.shape, jnp.int32)
    lm0 = jnp.full(ox.shape, -1, jnp.int32)
    jax.lax.while_loop(cond, body, (ptrs0, lm0))
    hit_ref[:] = jnp.where(needed0 > 0, hit_ref[:], jnp.int32(0))


def _mt_fields(f, ox, oy, oz, dx, dy, dz):
    """Moller-Trumbore with fields supplied by a gather closure ``f(j)``
    (full-tile shapes)."""
    v0x, v0y, v0z = f(0), f(1), f(2)
    e1x, e1y, e1z = f(3), f(4), f(5)
    e2x, e2y, e2z = f(6), f(7), f(8)
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    ok = jnp.abs(det) >= 1e-12
    inv = jnp.where(ok, 1.0 / jnp.where(det == 0.0, 1.0, det), 0.0)
    tvx = ox - v0x
    tvy = oy - v0y
    tvz = oz - v0z
    u = (tvx * px + tvy * py + tvz * pz) * inv
    qx = tvy * e1z - tvz * e1y
    qy = tvz * e1x - tvx * e1z
    qz = tvx * e1y - tvy * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv
    t = (e2x * qx + e2y * qy + e2z * qz) * inv
    hit = ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > T_MIN)
    return t, u, v, hit


def _anyhit_kernel_sub(oct_ref, nodes_hbm, tri_hbm, ox_ref, oy_ref, oz_ref,
                       dx_ref, dy_ref, dz_ref, tmax_ref, active_ref,
                       hit_ref, nodes_ref, tri_ref, ntile_ref, ttile_ref,
                       sems, *, n_nodes, n_tris, leaf_size, t_min):
    """Sub-packet any hit (see _closest_kernel_sub). Rows whose lanes are
    all blocked jump their pointer past the end (per-row early exit)."""
    _load_tables(nodes_hbm, tri_hbm, oct_ref, nodes_ref, tri_ref, sems,
                 True, True)
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    t_max = tmax_ref[:]
    needed0 = active_ref[:]
    ix, iy, iz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)
    hit_ref[:] = jnp.where(needed0 > 0, jnp.int32(0), jnp.int32(1))
    n_rows_tri = tri_ref.shape[0]

    def cond(ptrs):
        return jnp.any(ptrs < n_nodes)

    def body(ptrs):
        safe = jnp.minimum(ptrs, n_nodes - 1)
        for r in range(PACKET_ROWS):
            p_r = safe[r, 0] // 16
            ntile_ref[pl.ds(r, 1), :] = nodes_ref[pl.ds(p_r, 1), :]
        ntile = ntile_ref[:]
        base = (safe % 16) * 8

        def nf(f):
            return jnp.take_along_axis(ntile, base + f, axis=1)

        meta = pltpu.bitcast(nf(6), jnp.int32)
        skip = pltpu.bitcast(nf(7), jnp.int32)
        row_active = ptrs < n_nodes
        blocked = hit_ref[:]
        cap = jnp.where(row_active & (blocked == 0), t_max,
                        jnp.float32(-1.0))
        hit = _slab((nf(0), nf(1), nf(2)), (nf(3), nf(4), nf(5)),
                    ox, oy, oz, ix, iy, iz, cap)
        any_row = jnp.any(hit, axis=1, keepdims=True)
        is_leaf = meta >= 0

        first = meta >> 3
        lrow = jnp.where(is_leaf & any_row, first >> 3, 0)
        lrow = jnp.minimum(lrow, n_rows_tri - 1)
        for r in range(PACKET_ROWS):
            ttile_ref[pl.ds(r, 1), :] = tri_ref[pl.ds(lrow[r, 0], 1), :]
        ttile = ttile_ref[:]

        valid = is_leaf & any_row & hit
        b = blocked
        for k in range(leaf_size):
            f = lambda j: jnp.take_along_axis(
                ttile, jnp.full(ox.shape, k * 16 + j, jnp.int32), axis=1)
            t, _, _, h = _mt_fields(f, ox, oy, oz, dx, dy, dz)
            new = h & (t > t_min) & (t < t_max) & valid
            b = jnp.maximum(b, new.astype(jnp.int32))
        hit_ref[:] = b

        row_done = jnp.all(b > 0, axis=1, keepdims=True)
        descend = any_row & jnp.logical_not(is_leaf)
        nxt = jnp.where(descend, ptrs + 1, skip)
        nxt = jnp.where(row_done, n_nodes, nxt)
        return jnp.where(row_active, nxt, ptrs)

    jax.lax.while_loop(cond, body, jnp.zeros(ox.shape, jnp.int32))
    hit_ref[:] = jnp.where(needed0 > 0, hit_ref[:], jnp.int32(0))


def _anyhit_kernel(oct_ref, nodes_hbm, tri_hbm, ox_ref, oy_ref, oz_ref,
                   dx_ref, dy_ref, dz_ref, tmax_ref, active_ref,
                   hit_ref, nodes_ref, tri_ref, sems, *, n_nodes, n_tris,
                   leaf_size, t_min, nodes_resident=True, tri_resident=True):
    _load_tables(nodes_hbm, tri_hbm, oct_ref, nodes_ref, tri_ref, sems,
                 nodes_resident, tri_resident)
    m16 = nodes_hbm.shape[0] // 8
    oct_base = oct_ref[pl.program_id(0)] * m16

    def node_row(ptr):
        if nodes_resident:
            return _load_row(nodes_ref, ptr, 16)
        return (
            _load_row_streamed(nodes_hbm, oct_base + ptr // 16, nodes_ref,
                               sems.at[0]),
            ptr % 16,
        )

    def tri_row(first):
        # leaves are 8-aligned: constant slot 0 (see _closest_kernel)
        if tri_resident:
            row = tri_ref[pl.ds(first // 8, 1), :]
            return jnp.broadcast_to(row, (8, LANES)), 0
        return (
            _load_row_streamed(tri_hbm, first // 8, tri_ref, sems.at[1]),
            0,
        )

    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    t_max = tmax_ref[:]
    needed0 = active_ref[:]  # int32 0/1
    ix, iy, iz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)
    # blocked mask lives in the output ref (int32: Mosaic miscompiles i1
    # vectors through identity cond branches); the effective t cap for
    # retired/inactive lanes is -1 so the slab test culls them
    hit_ref[:] = jnp.where(needed0 > 0, jnp.int32(0), jnp.int32(1))

    def cond(c):
        ptr, live = c
        return (ptr < n_nodes) & live

    def body(c):
        ptr, live = c
        rowb, slot = node_row(ptr)
        base = slot * 8
        bmin = (_field(rowb, base, 0), _field(rowb, base, 1),
                _field(rowb, base, 2))
        bmax = (_field(rowb, base, 3), _field(rowb, base, 4),
                _field(rowb, base, 5))
        meta = pltpu.bitcast(_field(rowb, base, 6), jnp.int32)[0, 0]
        skip = pltpu.bitcast(_field(rowb, base, 7), jnp.int32)[0, 0]
        blocked = hit_ref[:]
        cap = jnp.where(blocked == 0, t_max, jnp.float32(-1.0))
        hit = _slab(bmin, bmax, ox, oy, oz, ix, iy, iz, cap)
        any_h = jnp.any(hit)
        is_leaf = meta >= 0

        @pl.when(any_h & is_leaf)
        def _():
            first = meta >> 3  # leaf_size-aligned; padding rows degenerate
            b = blocked
            trow, tslot = tri_row(first)
            base0 = tslot * 16
            for k in range(leaf_size):
                t, _, _, h = _tri_hit_rows(trow, base0 + k * 16, ox, oy, oz,
                                           dx, dy, dz)
                new = h & (t > t_min) & (t < t_max) & hit
                b = jnp.maximum(b, new.astype(jnp.int32))
            hit_ref[:] = b

        live = jnp.where(
            is_leaf & any_h, jnp.any(hit_ref[:] == 0), live
        )
        descend = any_h & jnp.logical_not(is_leaf)
        return jnp.where(descend, ptr + 1, skip), live

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.any(needed0 > 0)))
    # report False for lanes that were never active
    hit_ref[:] = jnp.where(needed0 > 0, hit_ref[:], jnp.int32(0))


def _morton3(q):
    """Interleaves 5-bit coords (R, 3) -> 15-bit Morton code (R,)."""
    def spread(x):
        x = x.astype(jnp.int32)
        x = (x | (x << 8)) & 0x100F
        x = (x | (x << 4)) & 0x10C3
        x = (x | (x << 2)) & 0x1249
        return x

    return spread(q[..., 0]) | (spread(q[..., 1]) << 1) | (spread(q[..., 2]) << 2)


def sort_rays_key(bvh, origin, direction):
    """Spatial+directional coherence key: 6 direction bits over 15 bits of
    origin Morton. Sorting incoherent ray batches by this key turns packet
    union-visits back into near per-ray visits (classic ray binning)."""
    root = bvh.nodes[0]
    bmin = root[0:3]
    extent = jnp.maximum(root[3:6] - bmin, 1e-20)
    q = jnp.clip(((origin - bmin) / extent * 31.0).astype(jnp.int32), 0, 31)
    morton = _morton3(q)
    octant = (
        (direction[:, 0] >= 0).astype(jnp.int32)
        | ((direction[:, 1] >= 0).astype(jnp.int32) << 1)
        | ((direction[:, 2] >= 0).astype(jnp.int32) << 2)
    )
    dom = jnp.argmax(jnp.abs(direction), axis=-1).astype(jnp.int32)
    return ((octant * 4 + dom) << 15) | morton


def _pack_comps(origin3, direction3, extra=()):
    """SoA (R,) components -> (rows, 128) padded layouts."""
    r = origin3[0].shape[0]
    rows = -(-r // LANES)
    blk = PACKET_ROWS * max(DUAL_WALKS, 1)
    pad_rows = -(-rows // blk) * blk
    total = pad_rows * LANES

    def comp(x, fill):
        if total != r:
            x = jnp.concatenate([x, jnp.full((total - r,), fill, x.dtype)])
        return x.reshape(pad_rows, LANES)

    comps = [comp(origin3[i], 0.0) for i in range(3)]
    # padding rays get zero direction -> inv 1e20 -> slab never hits
    comps += [comp(direction3[i], 0.0) for i in range(3)]
    comps += [comp(x, fill) for x, fill in extra]
    return comps, pad_rows, total


def _pack_rays(origin, direction, extra=()):
    """(R, 3) ray arrays -> per-component (rows, 128) padded layouts."""
    return _pack_comps(
        tuple(origin[:, i] for i in range(3)),
        tuple(direction[:, i] for i in range(3)),
        extra,
    )


def _ray_blk(rows=None):
    # index_map takes (grid_idx, *scalar_prefetch_refs)
    return pl.BlockSpec((rows or PACKET_ROWS, LANES), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)


def _hbm(a):
    return pl.BlockSpec(memory_space=pl.ANY)


def _residency(nodes16, tri8):
    """(nodes_resident, tri_resident) by VMEM budget. Nodes get priority
    (the while-while kernels stream leaf triangle rows from HBM);
    triangles are resident only when both tables fit together."""
    nodes_bytes = (nodes16.shape[0] // 8) * 128 * 4
    tri_bytes = tri8.shape[0] * 128 * 4
    nodes_res = nodes_bytes <= NODES_VMEM_BUDGET
    if nodes_res:
        tri_res = nodes_bytes + tri_bytes <= COMBINED_VMEM_BUDGET
    else:
        tri_res = tri_bytes <= TRI_VMEM_BUDGET
    return nodes_res, tri_res


def _table_scratch(nodes16, tri8):
    """Resident tables get full scratch copies; streamed tables get a
    single-row staging buffer."""
    nodes_res, tri_res = _residency(nodes16, tri8)
    return [
        pltpu.VMEM((nodes16.shape[0] // 8 if nodes_res else 8, 128),
                   jnp.float32),
        pltpu.VMEM(tri8.shape if tri_res else (8, 128), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    ]


def _packet_octants(dx, dy, dz, blk_rows=None):
    """Majority direction octant per packet (kernel block), (grid,) i32."""
    blk_rows = blk_rows or PACKET_ROWS
    grid = dx.shape[0] // blk_rows

    def mean(c):
        return c.reshape(grid, blk_rows * LANES).sum(axis=1)

    o = (
        (mean(dx) >= 0).astype(jnp.int32)
        + 2 * (mean(dy) >= 0).astype(jnp.int32)
        + 4 * (mean(dz) >= 0).astype(jnp.int32)
    )
    return o  # (grid,) scalar-prefetch operand


# One pointer per 128-ray sublane row instead of per 2048-ray packet:
# smaller traversal unions + 16 independent scalar chains. Only valid with
# both tables VMEM-resident (big scenes are chunked to stay resident).
# Measured (mattest 512^2): any-hit wins 1.24x; closest-hit loses (the
# unconditional leaf phase outweighs the union win) until the while-while
# restructure lands, so it keeps the single-pointer kernel.
SUBPACKETS_CLOSEST = False
SUBPACKETS_ANYHIT = True

# While-while restructure of the sub-packet kernels: inner loop walks
# internal nodes only (cheap body), leaf phases run dense only when rows
# stall at hit leaves. Triangle rows stream from HBM when not resident, so
# a single tree serves any triangle count whose NODES fit VMEM.
WHILEWHILE_CLOSEST = True
WHILEWHILE_ANYHIT = True

# Windowed refinement of the while-while kernels (see _closest_kernel_win):
# one row-load round serves WINDOW_STEPS in-tile gather steps and leaf hits
# queue instead of stalling. Takes precedence when enabled. Env overrides
# exist for on-chip A/B sweeps (tools/bench_phases.py).
WINDOWED_CLOSEST = os.environ.get("GLAZE_WINDOWED_CLOSEST", "1") == "1"
WINDOWED_ANYHIT = os.environ.get("GLAZE_WINDOWED_ANYHIT", "1") == "1"

# Interleave this many INDEPENDENT packet walks per closest-hit kernel body
# (block = DUAL_WALKS*PACKET_ROWS rows). Their scalar chains have no data
# dependencies, so the VLIW scheduler hides each walk's vector->scalar sync
# latency behind the others' vector work. 1 disables.
DUAL_WALKS = 1  # measured: 2 walks/body = 1.3x SLOWER (no VLIW overlap)


def _sub_scratch(nodes16, tri8):
    return [
        pltpu.VMEM((nodes16.shape[0] // 8, 128), jnp.float32),
        pltpu.VMEM(tri8.shape, jnp.float32),
        pltpu.VMEM((PACKET_ROWS, LANES), jnp.float32),
        pltpu.VMEM((PACKET_ROWS, LANES), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    ]


def _ww_scratch(nodes16, tri8, tri_res, queue=False):
    # queue (windowed) kernels in STREAMED mode carry TWO ttile banks +
    # per-bank DMA sems for the double-buffered drain; resident mode never
    # runs it, so it keeps the single bank (VMEM headroom)
    ttile_rows = (2 if queue and not tri_res else 1) * PACKET_ROWS
    return [
        pltpu.VMEM((nodes16.shape[0] // 8, 128), jnp.float32),
        pltpu.VMEM(tri8.shape if tri_res else (8, 128), jnp.float32),
        pltpu.VMEM((PACKET_ROWS, LANES), jnp.float32),
        pltpu.VMEM((ttile_rows, LANES), jnp.float32),
    ] + ([pltpu.VMEM((PACKET_ROWS, LANES), jnp.int32)] if queue else []) + [
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((ttile_rows,)),
    ]


@functools.partial(jax.jit, static_argnames=("n_nodes", "n_tris", "leaf_size",
                                             "interpret"))
def _closest_call(nodes16, tri8, ox, oy, oz, dx, dy, dz, tmax, *, n_nodes,
                  n_tris, leaf_size, interpret):
    rows = ox.shape[0]
    octs = _packet_octants(dx, dy, dz)
    nodes_res, tri_res = _residency(nodes16, tri8)
    blk_rows = PACKET_ROWS
    if WINDOWED_CLOSEST and nodes_res:
        kernel = functools.partial(_closest_kernel_win, n_nodes=n_nodes,
                                   n_tris=n_tris, leaf_size=leaf_size,
                                   tri_resident=tri_res)
        scratch = _ww_scratch(nodes16, tri8, tri_res, queue=True)
    elif WHILEWHILE_CLOSEST and nodes_res:
        kernel = functools.partial(_closest_kernel_ww, n_nodes=n_nodes,
                                   n_tris=n_tris, leaf_size=leaf_size,
                                   tri_resident=tri_res)
        scratch = _ww_scratch(nodes16, tri8, tri_res)
    elif SUBPACKETS_CLOSEST and nodes_res and tri_res:
        kernel = functools.partial(_closest_kernel_sub, n_nodes=n_nodes,
                                   n_tris=n_tris, leaf_size=leaf_size)
        scratch = _sub_scratch(nodes16, tri8)
    elif DUAL_WALKS > 1 and nodes_res and tri_res:
        blk_rows = PACKET_ROWS * DUAL_WALKS
        kernel = functools.partial(_closest_kernel_dual, n_nodes=n_nodes,
                                   n_tris=n_tris, leaf_size=leaf_size,
                                   n_walks=DUAL_WALKS)
        scratch = _table_scratch(nodes16, tri8)
        octs = _packet_octants(dx, dy, dz, blk_rows)
    else:
        kernel = functools.partial(_closest_kernel, n_nodes=n_nodes,
                                   n_tris=n_tris, leaf_size=leaf_size,
                                   nodes_resident=nodes_res,
                                   tri_resident=tri_res)
        scratch = _table_scratch(nodes16, tri8)
    grid = rows // blk_rows
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[_hbm(nodes16), _hbm(tri8)]
        + [_ray_blk(blk_rows) for _ in range(7)],
        out_specs=[_ray_blk(blk_rows) for _ in range(4)],
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(octs, nodes16, tri8, ox, oy, oz, dx, dy, dz, tmax)


@functools.partial(jax.jit, static_argnames=("n_nodes", "n_tris", "leaf_size",
                                             "interpret"))
def _closest_call_masked(nodes16, tri8, ox, oy, oz, dx, dy, dz, tmax, *,
                         n_nodes, n_tris, leaf_size, interpret):
    """Windowed closest hit with baked opacity masks (see
    _closest_kernel_win alpha_mask). Caller guarantees the windowed
    kernel applies (nodes resident); use closest_hit_soa_masked."""
    rows = ox.shape[0]
    octs = _packet_octants(dx, dy, dz)
    nodes_res, tri_res = _residency(nodes16, tri8)
    assert nodes_res
    kernel = functools.partial(_closest_kernel_win, n_nodes=n_nodes,
                               n_tris=n_tris, leaf_size=leaf_size,
                               tri_resident=tri_res, alpha_mask=True)
    scratch = _ww_scratch(nodes16, tri8, tri_res, queue=True)
    grid = rows // PACKET_ROWS
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[_hbm(nodes16), _hbm(tri8)]
        + [_ray_blk() for _ in range(7)],
        out_specs=[_ray_blk() for _ in range(5)],
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(octs, nodes16, tri8, ox, oy, oz, dx, dy, dz, tmax)


def closest_hit_soa_masked(bvh, origin3, direction3, t_max=None,
                           interpret: bool = False):
    """SoA closest hit honoring baked opacity masks; returns the
    closest_hit_soa dict plus ``mixed`` ((R,) bool: accepted hit sits on
    a MIXED cell and still needs the exact texture test). Falls back to
    the unmasked kernel with every hit flagged mixed when the windowed
    kernel doesn't apply (huge node slab) — always safe."""
    from glaze_tpu.accel.bvh import LEAF_SIZE, TRI_PAYLOAD_BASE

    nodes_res, _ = _residency(bvh.nodes16, bvh.tri8)
    has_payload = bvh.tri.shape[1] > TRI_PAYLOAD_BASE
    if not (WINDOWED_CLOSEST and nodes_res and has_payload):
        # payload-free trees: skip the mask variant entirely (its
        # per-triangle cell gather would read guaranteed zeros)
        out = closest_hit_soa(bvh, origin3, direction3, t_max,
                              interpret=interpret)
        return dict(out, mixed=out["tri"] >= 0)
    r = origin3[0].shape[0]
    if t_max is None:
        cap = jnp.full((r,), np.inf, jnp.float32)
    else:
        cap = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    comps, rows, total = _pack_comps(origin3, direction3, [(cap, -1.0)])
    ox, oy, oz, dx, dy, dz, tmax = comps
    t, tri, u, v, mix = _closest_call_masked(
        bvh.nodes16, bvh.tri8, ox, oy, oz, dx, dy, dz, tmax,
        n_nodes=bvh.nodes.shape[0], n_tris=bvh.tri.shape[0],
        leaf_size=LEAF_SIZE, interpret=interpret,
    )
    flat = lambda x: x.reshape(total)[:r]
    out_t = flat(t)
    out_tri = flat(tri)
    out_mix = flat(mix) != 0
    if bvh.n_tris == 0:
        out_t = jnp.full_like(out_t, np.inf)
        out_tri = jnp.full_like(out_tri, -1)
        out_mix = jnp.zeros_like(out_mix)
    return {"t": out_t, "tri": out_tri, "u": flat(u), "v": flat(v),
            "mixed": out_mix & (out_tri >= 0)}


def closest_hit_soa(bvh, origin3, direction3, t_max=None,
                    interpret: bool = False):
    """SoA closest hit: origin/direction as (x, y, z) tuples of (R,).

    Returns dict with (R,) ``t``/``tri``/``u``/``v``.
    """
    from glaze_tpu.accel.bvh import LEAF_SIZE

    r = origin3[0].shape[0]
    if t_max is None:
        cap = jnp.full((r,), np.inf, jnp.float32)
    else:
        cap = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    comps, rows, total = _pack_comps(origin3, direction3, [(cap, -1.0)])
    ox, oy, oz, dx, dy, dz, tmax = comps
    t, tri, u, v = _closest_call(
        bvh.nodes16, bvh.tri8, ox, oy, oz, dx, dy, dz, tmax,
        n_nodes=bvh.nodes.shape[0], n_tris=bvh.tri.shape[0],
        leaf_size=LEAF_SIZE, interpret=interpret,
    )
    flat = lambda x: x.reshape(total)[:r]
    out_t = flat(t)
    out_tri = flat(tri)
    if bvh.n_tris == 0:
        out_t = jnp.full_like(out_t, np.inf)
        out_tri = jnp.full_like(out_tri, -1)
    return {"t": out_t, "tri": out_tri, "u": flat(u), "v": flat(v)}


def any_hit_soa(bvh, origin3, direction3, t_max, t_min=1e-3, active=None,
                interpret: bool = False):
    """SoA any hit; ``t_max`` is (R,); returns (R,) bool."""
    from glaze_tpu.accel.bvh import LEAF_SIZE

    r = origin3[0].shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    act = jnp.ones((r,), jnp.int32) if active is None else active.astype(jnp.int32)
    comps, rows, total = _pack_comps(origin3, direction3,
                                     [(t_max, -1.0), (act, 0)])
    ox, oy, oz, dx, dy, dz, tmax, actv = comps
    hit = _anyhit_call(
        bvh.nodes16, bvh.tri8, ox, oy, oz, dx, dy, dz, tmax, actv,
        n_nodes=bvh.nodes.shape[0], n_tris=bvh.tri.shape[0],
        leaf_size=LEAF_SIZE, t_min=float(t_min), interpret=interpret,
    )
    result = hit.reshape(total)[:r] != 0
    if bvh.n_tris == 0:
        result = jnp.zeros_like(result)
    return result


def closest_hit_pallas(bvh, origin, direction, t_max=None,
                       interpret: bool = False, sort: bool = False):
    """Drop-in replacement for :func:`glaze_tpu.accel.bvh.closest_hit`.

    ``sort=True`` bins rays by Morton/octant before tracing (worth it for
    incoherent batches; pixel-ordered primary rays don't need it).
    """
    from glaze_tpu.accel.bvh import LEAF_SIZE

    r = origin.shape[0]
    cap = jnp.full((r,), np.inf if t_max is None else t_max, jnp.float32)
    perm = None
    if sort:
        key = sort_rays_key(bvh, origin, direction)
        perm = jnp.argsort(key)
        origin = origin[perm]
        direction = direction[perm]
        cap = cap[perm]
    comps, rows, total = _pack_rays(origin, direction, [(cap, -1.0)])
    ox, oy, oz, dx, dy, dz, tmax = comps
    t, tri, u, v = _closest_call(
        bvh.nodes16, bvh.tri8, ox, oy, oz, dx, dy, dz, tmax,
        n_nodes=bvh.nodes.shape[0], n_tris=bvh.tri.shape[0],
        leaf_size=LEAF_SIZE, interpret=interpret,
    )

    def flat(x):
        x = x.reshape(total)[:r]
        if perm is not None:
            x = jnp.zeros_like(x).at[perm].set(x)
        return x

    out_t = flat(t)
    out_tri = flat(tri)
    # empty scenes keep a placeholder triangle; report misses
    if bvh.n_tris == 0:
        out_t = jnp.full_like(out_t, np.inf)
        out_tri = jnp.full_like(out_tri, -1)
    return {"t": out_t, "tri": out_tri, "u": flat(u), "v": flat(v)}


@functools.partial(jax.jit, static_argnames=("n_nodes", "n_tris", "leaf_size",
                                             "t_min", "interpret"))
def _anyhit_call(nodes16, tri8, ox, oy, oz, dx, dy, dz, tmax, active, *,
                 n_nodes, n_tris, leaf_size, t_min, interpret):
    rows = ox.shape[0]
    grid = rows // PACKET_ROWS
    octs = _packet_octants(dx, dy, dz)
    nodes_res, tri_res = _residency(nodes16, tri8)
    if WINDOWED_ANYHIT and nodes_res:
        kernel = functools.partial(_anyhit_kernel_win, n_nodes=n_nodes,
                                   n_tris=n_tris, leaf_size=leaf_size,
                                   t_min=t_min, tri_resident=tri_res)
        scratch = _ww_scratch(nodes16, tri8, tri_res, queue=True)
    elif WHILEWHILE_ANYHIT and nodes_res:
        kernel = functools.partial(_anyhit_kernel_ww, n_nodes=n_nodes,
                                   n_tris=n_tris, leaf_size=leaf_size,
                                   t_min=t_min, tri_resident=tri_res)
        scratch = _ww_scratch(nodes16, tri8, tri_res)
    elif SUBPACKETS_ANYHIT and nodes_res and tri_res:
        kernel = functools.partial(_anyhit_kernel_sub, n_nodes=n_nodes,
                                   n_tris=n_tris, leaf_size=leaf_size,
                                   t_min=t_min)
        scratch = _sub_scratch(nodes16, tri8)
    else:
        kernel = functools.partial(_anyhit_kernel, n_nodes=n_nodes,
                                   n_tris=n_tris,
                                   leaf_size=leaf_size, t_min=t_min,
                                   nodes_resident=nodes_res,
                                   tri_resident=tri_res)
        scratch = _table_scratch(nodes16, tri8)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[_hbm(nodes16), _hbm(tri8)] + [_ray_blk() for _ in range(8)],
        out_specs=_ray_blk(),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        interpret=interpret,
    )(octs, nodes16, tri8, ox, oy, oz, dx, dy, dz, tmax, active)


@functools.partial(jax.jit, static_argnames=("n_nodes", "n_tris", "leaf_size",
                                             "t_min", "interpret"))
def _anyhit_call_masked(nodes16, tri8, ox, oy, oz, dx, dy, dz, tmax, active,
                        *, n_nodes, n_tris, leaf_size, t_min, interpret):
    rows = ox.shape[0]
    grid = rows // PACKET_ROWS
    octs = _packet_octants(dx, dy, dz)
    nodes_res, tri_res = _residency(nodes16, tri8)
    assert nodes_res
    kernel = functools.partial(_anyhit_kernel_win, n_nodes=n_nodes,
                               n_tris=n_tris, leaf_size=leaf_size,
                               t_min=t_min, tri_resident=tri_res,
                               alpha_mask=True)
    scratch = _ww_scratch(nodes16, tri8, tri_res, queue=True)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[_hbm(nodes16), _hbm(tri8)] + [_ray_blk() for _ in range(8)],
        out_specs=[_ray_blk(), _ray_blk()],
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
                   jax.ShapeDtypeStruct((rows, LANES), jnp.int32)],
        interpret=interpret,
    )(octs, nodes16, tri8, ox, oy, oz, dx, dy, dz, tmax, active)


def any_hit_soa_masked(bvh, origin3, direction3, t_max, t_min=1e-3,
                       active=None, interpret: bool = False):
    """SoA any hit honoring baked opacity cells: returns ``(blocked,
    pending)`` (R,) bools — blocked lanes have a definitive OPAQUE-cell
    occluder; pending lanes saw only MIXED-cell hits and need the exact
    texture test. Falls back to the unmasked kernel with
    pending == blocked-result when the masked kernel doesn't apply
    (the caller then resolves every potential blocker exactly)."""
    from glaze_tpu.accel.bvh import LEAF_SIZE, TRI_PAYLOAD_BASE

    r = origin3[0].shape[0]
    nodes_res, _ = _residency(bvh.nodes16, bvh.tri8)
    has_payload = bvh.tri.shape[1] > TRI_PAYLOAD_BASE
    if not (WINDOWED_ANYHIT and nodes_res and has_payload):
        blocked = any_hit_soa(bvh, origin3, direction3, t_max, t_min=t_min,
                              active=active, interpret=interpret)
        return jnp.zeros_like(blocked), blocked
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    act = (jnp.ones((r,), jnp.int32) if active is None
           else active.astype(jnp.int32))
    comps, rows, total = _pack_comps(origin3, direction3,
                                     [(t_max, -1.0), (act, 0)])
    ox, oy, oz, dx, dy, dz, tmax, actv = comps
    blocked, pending = _anyhit_call_masked(
        bvh.nodes16, bvh.tri8, ox, oy, oz, dx, dy, dz, tmax, actv,
        n_nodes=bvh.nodes.shape[0], n_tris=bvh.tri.shape[0],
        leaf_size=LEAF_SIZE, t_min=float(t_min), interpret=interpret,
    )
    blocked = blocked.reshape(total)[:r] != 0
    pending = pending.reshape(total)[:r] != 0
    if bvh.n_tris == 0:
        blocked = jnp.zeros_like(blocked)
        pending = jnp.zeros_like(pending)
    return blocked, pending


def any_hit_pallas(bvh, origin, direction, t_max, t_min=1e-3,
                   active=None, interpret: bool = False, sort: bool = False):
    """Drop-in replacement for :func:`glaze_tpu.accel.bvh.any_hit`.

    ``sort`` is off by default: measured on-chip, XLA's argsort + permute
    gathers cost far more than the packet-coherence win (pixel order is
    already coherent enough).
    """
    from glaze_tpu.accel.bvh import LEAF_SIZE

    r = origin.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    act = jnp.ones((r,), jnp.int32) if active is None else active.astype(jnp.int32)
    perm = None
    if sort:
        key = sort_rays_key(bvh, origin, direction)
        perm = jnp.argsort(key)
        origin = origin[perm]
        direction = direction[perm]
        t_max = t_max[perm]
        act = act[perm]
    comps, rows, total = _pack_rays(origin, direction,
                                    [(t_max, -1.0), (act, 0)])
    ox, oy, oz, dx, dy, dz, tmax, actv = comps
    hit = _anyhit_call(
        bvh.nodes16, bvh.tri8, ox, oy, oz, dx, dy, dz, tmax, actv,
        n_nodes=bvh.nodes.shape[0], n_tris=bvh.tri.shape[0],
        leaf_size=LEAF_SIZE, t_min=float(t_min), interpret=interpret,
    )
    result = hit.reshape(total)[:r]
    if perm is not None:
        result = jnp.zeros_like(result).at[perm].set(result)
    result = result != 0
    if bvh.n_tris == 0:
        result = jnp.zeros_like(result)
    return result
