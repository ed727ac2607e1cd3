"""Pallas TPU kernels for the fat-leaf BVH (MXU leaf drains).

Walk structure is the windowed sub-packet design of
:mod:`glaze_tpu.accel.traverse_pallas` (each 128-ray sublane row owns a
node pointer; one aligned 16-node window load serves WINDOW_STEPS in-tile
gather steps; leaf hits queue in a per-row FIFO). The drain engine is
new: a queued leaf is ONE dot_general of its (16, 4T) Moller-Trumbore
coefficient slab (streamed from HBM, 2-bank pipelined across rows) with
the row's (16, 128) ray features — dense MXU work replacing the
8-triangle VPU loop. Resolve is (T, 128) VPU compares + a sublane
min-reduce.

v2: slabs are UNCENTRED (accel/fat.py:leaf_matrices), so ray features
are leaf-independent — built ONCE per row into a (R*16, 128) scratch at
kernel start instead of rebuilt per (row, leaf) pair. The per-pair cost
is then just DMA-wait + matmul + resolve; the v1 per-pair feature
rebuild (9 sublane writes + 3 scalar centre extracts per pair) measured
~1200 cycles/pair in situ (tools/bench_fat_ab.py r3) and dominated.

Only rows with queued work pay: per-row DMA/compute is guarded by scalar
predicates (drain rounds average ~5/16 busy rows on the bench workload).
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
from glaze_tpu.accel.fat import DET_EPS, F, FatBVH
from glaze_tpu.accel.traverse_pallas import (
    LANES,
    PACKET_ROWS,
    WINDOW_STEPS,
    _hbm,
    _load_tables,
    _pack_comps,
    _packet_octants,
    _ray_blk,
    _safe_inv,
    _slab,
)

# Fat drains are per-(row, leaf) pairs with software-pipelined slab DMA;
# a SHALLOW queue drains often enough to keep walk and drain overlapped
# without long pair chains. On-chip sweeps (tools/bench_fat_ab.py, 512k
# bounce rays, leaf 128): closest Q=2/4/8/12 -> 146/141/152/157 ms;
# anyhit Q=2/4/8/12 -> 170/176/151/211 ms (early-exit rows prefer a
# deeper queue: fewer drain calls wasted on rows that just got blocked).
QUEUE_MAX_FAT = int(os.environ.get("GLAZE_FAT_QUEUE_MAX", "4"))
QUEUE_MAX_ANY_FAT = int(os.environ.get("GLAZE_FAT_QUEUE_MAX_ANY", "8"))

# matmul precision for the coefficient dot: HIGHEST (6-pass bf16 ~ f32)
# matches the scalar reference (rel t err ~1e-7 centred / 3e-6 p99
# uncentred); DEFAULT (one bf16 pass) loses hits (tools/bench_mxu.py).
# GLAZE_FAT_PRECISION=high (3-pass, ~2x faster) is exposed for A/B.
_DOT_PRECISION = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,  # timing A/B only: loses hits
}[os.environ.get("GLAZE_FAT_PRECISION", "highest")]
_DN = (((0,), (0,)), ((), ()))
# measurement knob: skip winner u/v/tri extraction in the closest resolve
# (output WRONG — timing only; see _pair)
_DEFER_UV = os.environ.get("GLAZE_FAT_DEFER_UV", "0") == "1"
# batched drain: one (F, 4T*Q) @ (F, 128) dot per busy row per drain
# call instead of Q separate (F, 4T) dots (see drain_batched). Measured
# 3x SLOWER on the bench bounce phase (413 vs 138 ms / 512k rays): the
# dot's cost scales with its OUTPUT size, not a per-dot fixed overhead,
# so widening the dot buys nothing and loses VMEM locality. Kept for
# the record + re-testing on future toolchains.
_BATCHED = os.environ.get("GLAZE_FAT_BATCHED", "0") == "1"
# measurement knob: add an epsilon-weighted second dot per pair (timing)
_DOT2 = {
    "": None,
    "default": jax.lax.Precision.DEFAULT,
    "highest": jax.lax.Precision.HIGHEST,
}[os.environ.get("GLAZE_FAT_DOT2", "")]


def _walk_and_drain(kind, oct_ref, nodes_hbm, leafmat_hbm,
                    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                    tmax_ref, active_ref, out_refs, nodes_ref, ntile_ref,
                    feat_ref, mat_ref, queue_ref, sems, mat_sems, *,
                    n_nodes, n_leaves, leaf_size, t_min, queue_max):
    """Shared windowed walk + MXU drain body. ``kind``: 'closest'|'any'."""
    T = leaf_size
    _load_tables(nodes_hbm, leafmat_hbm, oct_ref, nodes_ref, None, sems,
                 True, False)
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    ix, iy, iz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)

    if kind == "closest":
        t_ref, tri_out_ref, u_ref, v_ref = out_refs
        t_ref[:] = tmax_ref[:]
        tri_out_ref[:] = jnp.full(ox.shape, -1, jnp.int32)
        u_ref[:] = jnp.zeros(ox.shape, jnp.float32)
        v_ref[:] = jnp.zeros(ox.shape, jnp.float32)
    else:
        (hit_ref,) = out_refs
        t_max_all = tmax_ref[:]
        needed0 = active_ref[:]
        hit_ref[:] = jnp.where(needed0 > 0, jnp.int32(0), jnp.int32(1))
    queue_ref[:] = jnp.zeros(ox.shape, jnp.int32)
    # per-row ray features, built ONCE (uncentred slabs make them
    # leaf-independent): row r occupies sublanes [r*16, r*16+16) as
    # [o x d (3), o (3), d (3), 1, 0 x 6]
    oxd_x = oy * dz - oz * dy
    oxd_y = oz * dx - ox * dz
    oxd_z = ox * dy - oy * dx
    ones_row = jnp.ones((1, LANES), jnp.float32)
    zeros_tail = jnp.zeros((F - 10, LANES), jnp.float32)
    for r in range(PACKET_ROWS):
        feat_ref[r * F:(r + 1) * F, :] = jnp.concatenate([
            oxd_x[r:r + 1], oxd_y[r:r + 1], oxd_z[r:r + 1],
            ox[r:r + 1], oy[r:r + 1], oz[r:r + 1],
            dx[r:r + 1], dy[r:r + 1], dz[r:r + 1],
            ones_row, zeros_tail], axis=0)

    lanes = jax.lax.broadcasted_iota(jnp.int32, ox.shape, 1)
    iota_t = jax.lax.broadcasted_iota(jnp.int32, (T, LANES), 0)

    def _issue(lidx_r, bank):
        pltpu.make_async_copy(
            leafmat_hbm.at[pl.ds(lidx_r * F, F), :],
            mat_ref.at[pl.ds(bank * F, F), :],
            mat_sems.at[bank],
        ).start()

    def _resolve(r, out, tri_base):
        """Resolve one (row, leaf) test block ``out`` (4T, 128) against
        row ``r``'s best-hit state. ``r`` is a Python int (the drain row
        loop is unrolled), so the ref slices are static."""
        det = out[0 * T:1 * T]
        ud = out[1 * T:2 * T]
        vd = out[2 * T:3 * T]
        td = out[3 * T:4 * T]
        ok = jnp.abs(det) >= DET_EPS
        inv = jnp.where(ok, 1.0 / jnp.where(det == 0.0, 1.0, det), 0.0)
        t = td * inv
        base_valid = (ok & (ud * det >= 0.0) & (vd * det >= 0.0)
                      & ((ud + vd) * det <= det * det))
        if kind == "closest":
            tb = t_ref[pl.ds(r, 1), :]
            valid = base_valid & (t > T_MIN) & (t < tb)
            tt = jnp.where(valid, t, jnp.inf)
            tmin = jnp.min(tt, axis=0, keepdims=True)
            better = tmin < tb
            t_ref[pl.ds(r, 1), :] = jnp.where(better, tmin, tb)
            if _DEFER_UV:
                # measurement mode: skip the winner extraction (widx /
                # onehot / u / v) to price it; tri is WRONG (base only)
                tri_out_ref[pl.ds(r, 1), :] = jnp.where(
                    better, tri_base, tri_out_ref[pl.ds(r, 1), :])
            else:
                widx = jnp.min(jnp.where(tt <= tmin, iota_t, T), axis=0,
                               keepdims=True)
                onehot = iota_t == widx
                uw = jnp.sum(jnp.where(onehot, ud * inv, 0.0), axis=0,
                             keepdims=True)
                vw = jnp.sum(jnp.where(onehot, vd * inv, 0.0), axis=0,
                             keepdims=True)
                tri_out_ref[pl.ds(r, 1), :] = jnp.where(
                    better, tri_base + widx, tri_out_ref[pl.ds(r, 1), :])
                u_ref[pl.ds(r, 1), :] = jnp.where(better, uw,
                                                  u_ref[pl.ds(r, 1), :])
                v_ref[pl.ds(r, 1), :] = jnp.where(better, vw,
                                                  v_ref[pl.ds(r, 1), :])
        else:
            cap = tmax_ref[pl.ds(r, 1), :]
            valid = base_valid & (t > t_min) & (t < cap)
            new = jnp.max(valid.astype(jnp.int32), axis=0, keepdims=True)
            hit_ref[pl.ds(r, 1), :] = jnp.maximum(
                hit_ref[pl.ds(r, 1), :], new)

    def _pair(r, bank):
        """Drain one (row, leaf) pair: wait slab DMA, dot, resolve. The
        leaf's base tri index rides in slab row 10 (leaf_matrices), so
        no queue-ring extraction happens here."""
        pltpu.make_async_copy(
            leafmat_hbm.at[pl.ds(0, F), :],
            mat_ref.at[pl.ds(bank * F, F), :],
            mat_sems.at[bank],
        ).wait()
        mat = mat_ref[pl.ds(bank * F, F), :]
        feat = feat_ref[r * F:(r + 1) * F, :]
        out = jax.lax.dot_general(mat, feat, _DN,
                                  precision=_DOT_PRECISION,
                                  preferred_element_type=jnp.float32)
        if _DOT2 is not None:
            # measurement knob: a second, epsilon-weighted dot prices the
            # marginal in-situ cost of one dot at the given precision
            out = out + 1e-35 * jax.lax.dot_general(
                mat, feat, _DN, precision=_DOT2,
                preferred_element_type=jnp.float32)
        _resolve(r, out, mat[10, 0].astype(jnp.int32))

    def drain_batched(qc, hc):
        # ONE dot per busy row per drain call: the row's queued slabs
        # are DMA'd side-by-side into a (F, 4T*Q) bank and tested with a
        # single (F, 4T*Q) @ (F, 128) contraction. In-situ pricing (the
        # _DOT2 epsilon-dot experiment) showed the per-dot cost, not the
        # resolve or queue bookkeeping, dominates the drain — batching
        # amortizes the MXU pass overhead over up to Q leaves.
        W = 4 * T
        d = qc - hc
        cnt = [d[r, 0] for r in range(PACKET_ROWS)]
        for q in range(queue_max):
            idsq = jnp.take_along_axis(queue_ref[:], (hc + q) % LANES,
                                       axis=1)
            for r in range(PACKET_ROWS):
                @pl.when(cnt[r] > q)
                def _(r=r, q=q, idsq=idsq):
                    pltpu.make_async_copy(
                        leafmat_hbm.at[pl.ds(idsq[r, 0] * F, F), :],
                        mat_ref.at[pl.ds(r * F, F), pl.ds(q * W, W)],
                        mat_sems.at[r * queue_max + q],
                    ).start()
        for r in range(PACKET_ROWS):
            @pl.when(cnt[r] > 0)
            def _(r=r):
                for q in range(queue_max):
                    @pl.when(cnt[r] > q)
                    def _(q=q):
                        pltpu.make_async_copy(
                            leafmat_hbm.at[pl.ds(0, F), :],
                            mat_ref.at[pl.ds(r * F, F), pl.ds(q * W, W)],
                            mat_sems.at[r * queue_max + q],
                        ).wait()
                mat = mat_ref[pl.ds(r * F, F), :]
                feat = feat_ref[r * F:(r + 1) * F, :]
                out = jax.lax.dot_general(
                    mat, feat, _DN, precision=_DOT_PRECISION,
                    preferred_element_type=jnp.float32)
                for q in range(queue_max):
                    @pl.when(cnt[r] > q)
                    def _(q=q):
                        # stale (un-DMA'd) slots are never resolved, and
                        # their garbage affects only their own out rows
                        _resolve(r, out[q * W:(q + 1) * W],
                                 mat[10, q * W].astype(jnp.int32))

    def drain(qc, hc):
        if _BATCHED:
            drain_batched(qc, hc)
            return
        # statically-unrolled round-robin drain: per-row pair counts are
        # extracted ONCE as scalars (the old design re-interrogated the
        # (16,128) queue ring with a vector gather + 16 vector->scalar
        # extracts and paid a vector-reduce while_loop cond on EVERY
        # pair round — measured ~900 cy/pair of overhead). Rounds are
        # unrolled to queue_max with scalar predicates; round i+1's slab
        # DMAs (other bank set) are issued before round i's pairs
        # compute, so HBM copy latency is paid once per drain call and
        # rows still pipeline against each other within a round.
        d = qc - hc
        cnt = [d[r, 0] for r in range(PACKET_ROWS)]

        def ids_at(i):
            # row-uniform lane gather: every lane of row r holds
            # queue[r, (hc_r + i) % 128], so the lane-0 extract is exact
            return jnp.take_along_axis(queue_ref[:], (hc + i) % LANES,
                                       axis=1)

        ids0 = ids_at(0)
        for r in range(PACKET_ROWS):
            @pl.when(cnt[r] > 0)
            def _(r=r):
                _issue(ids0[r, 0], r)
        for i in range(queue_max):
            bank = i % 2
            if i + 1 < queue_max:
                nxt = ids_at(i + 1)
                for r in range(PACKET_ROWS):
                    @pl.when(cnt[r] > i + 1)
                    def _(r=r):
                        _issue(nxt[r, 0], ((i + 1) % 2) * PACKET_ROWS + r)
            for r in range(PACKET_ROWS):
                @pl.when(cnt[r] > i)
                def _(r=r, bank=bank):
                    _pair(r, bank * PACKET_ROWS + r)

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
        if kind == "any":
            blocked = hit_ref[:]
        for _ in range(WINDOW_STEPS):
            inwin = ((p // 16) == win) & (p < n_nodes) & (qc - hc < queue_max)
            base = (p % 16) * 8

            def nf(f):
                return jnp.take_along_axis(ntile, base + f, axis=1)

            meta = pltpu.bitcast(nf(6), jnp.int32)
            skip = pltpu.bitcast(nf(7), jnp.int32)
            if kind == "closest":
                cap = jnp.where(inwin, t_ref[:], jnp.float32(-1.0))
            else:
                cap = jnp.where(inwin & (blocked == 0), t_max_all,
                                jnp.float32(-1.0))
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

        do = jnp.any(qc - hc >= queue_max) | jnp.logical_not(
            jnp.any(p < n_nodes))

        @pl.when(do & jnp.any(qc > hc))
        def _():
            drain(qc, hc)

        hc = jnp.where(do, qc, hc)
        if kind == "any":
            row_done = jnp.all(hit_ref[:] > 0, axis=1, keepdims=True)
            p = jnp.where(row_done & (qc <= hc), n_nodes, p)
        return p, qc, hc

    p0 = jnp.zeros(ox.shape, jnp.int32)
    z0 = jnp.zeros(ox.shape, jnp.int32)
    jax.lax.while_loop(cond, body, (p0, z0, z0))
    if kind == "closest":
        t_ref[:] = jnp.where(tri_out_ref[:] >= 0, t_ref[:],
                             jnp.float32(jnp.inf))
    else:
        hit_ref[:] = jnp.where(needed0 > 0, hit_ref[:], jnp.int32(0))


def _closest_kernel_fat(oct_ref, nodes_hbm, leafmat_hbm,
                        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                        tmax_ref, t_ref, tri_ref, u_ref, v_ref,
                        nodes_ref, ntile_ref, feat_ref, mat_ref, queue_ref,
                        sems, mat_sems, *, n_nodes, n_leaves, leaf_size):
    _walk_and_drain(
        "closest", oct_ref, nodes_hbm, leafmat_hbm,
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref, None,
        (t_ref, tri_ref, u_ref, v_ref), nodes_ref, ntile_ref, feat_ref,
        mat_ref, queue_ref, sems, mat_sems, n_nodes=n_nodes,
        n_leaves=n_leaves, leaf_size=leaf_size, t_min=None,
        queue_max=QUEUE_MAX_FAT)


def _anyhit_kernel_fat(oct_ref, nodes_hbm, leafmat_hbm,
                       ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                       tmax_ref, active_ref, hit_ref,
                       nodes_ref, ntile_ref, feat_ref, mat_ref, queue_ref,
                       sems, mat_sems, *, n_nodes, n_leaves, leaf_size,
                       t_min):
    _walk_and_drain(
        "any", oct_ref, nodes_hbm, leafmat_hbm,
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
        active_ref, (hit_ref,), nodes_ref, ntile_ref, feat_ref,
        mat_ref, queue_ref, sems, mat_sems, n_nodes=n_nodes,
        n_leaves=n_leaves, leaf_size=leaf_size, t_min=t_min,
        queue_max=QUEUE_MAX_ANY_FAT)


def _fat_scratch(nodes16, leaf_size, queue_max):
    if _BATCHED:
        # one (F, 4T*Q) bank per row (side-by-side slabs, one dot each)
        mat_bank = pltpu.VMEM(
            (PACKET_ROWS * F, 4 * leaf_size * queue_max), jnp.float32)
        mat_sems = pltpu.SemaphoreType.DMA((PACKET_ROWS * queue_max,))
    else:
        mat_bank = pltpu.VMEM(
            (2 * PACKET_ROWS * F, 4 * leaf_size), jnp.float32)
        mat_sems = pltpu.SemaphoreType.DMA((2 * PACKET_ROWS,))
    return [
        pltpu.VMEM((nodes16.shape[0] // 8, 128), jnp.float32),  # node slab
        pltpu.VMEM((PACKET_ROWS, LANES), jnp.float32),  # ntile
        pltpu.VMEM((PACKET_ROWS * F, LANES), jnp.float32),  # features
        mat_bank,
        pltpu.VMEM((PACKET_ROWS, LANES), jnp.int32),  # queue ring
        pltpu.SemaphoreType.DMA((2,)),  # node table copy
        mat_sems,
    ]


@functools.partial(jax.jit, static_argnames=("n_nodes", "n_leaves",
                                             "leaf_size", "interpret"))
def _closest_call_fat(nodes16, leafmat, ox, oy, oz, dx, dy, dz, tmax, *,
                      n_nodes, n_leaves, leaf_size, interpret):
    rows = ox.shape[0]
    octs = _packet_octants(dx, dy, dz)
    kernel = functools.partial(_closest_kernel_fat, n_nodes=n_nodes,
                               n_leaves=n_leaves, leaf_size=leaf_size)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(rows // PACKET_ROWS,),
        in_specs=[_hbm(nodes16), _hbm(leafmat)]
        + [_ray_blk() for _ in range(7)],
        out_specs=[_ray_blk() for _ in range(4)],
        scratch_shapes=_fat_scratch(nodes16, leaf_size, QUEUE_MAX_FAT),
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
    )(octs, nodes16, leafmat, ox, oy, oz, dx, dy, dz, tmax)


@functools.partial(jax.jit, static_argnames=("n_nodes", "n_leaves",
                                             "leaf_size", "t_min",
                                             "interpret"))
def _anyhit_call_fat(nodes16, leafmat, ox, oy, oz, dx, dy, dz, tmax,
                     active, *, n_nodes, n_leaves, leaf_size, t_min,
                     interpret):
    rows = ox.shape[0]
    octs = _packet_octants(dx, dy, dz)
    kernel = functools.partial(_anyhit_kernel_fat, n_nodes=n_nodes,
                               n_leaves=n_leaves, leaf_size=leaf_size,
                               t_min=t_min)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(rows // PACKET_ROWS,),
        in_specs=[_hbm(nodes16), _hbm(leafmat)]
        + [_ray_blk() for _ in range(8)],
        out_specs=_ray_blk(),
        scratch_shapes=_fat_scratch(nodes16, leaf_size, QUEUE_MAX_ANY_FAT),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        interpret=interpret,
    )(octs, nodes16, leafmat, ox, oy, oz, dx, dy, dz, tmax, active)


def closest_hit_fat_soa(bvh: FatBVH, origin3, direction3, t_max=None,
                        interpret: bool = False):
    """SoA closest hit on a FatBVH (contract of closest_hit_soa)."""
    r = origin3[0].shape[0]
    if t_max is None:
        cap = jnp.full((r,), np.inf, jnp.float32)
    else:
        cap = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    comps, rows, total = _pack_comps(origin3, direction3, [(cap, -1.0)])
    ox, oy, oz, dx, dy, dz, tmax = comps
    t, tri, u, v = _closest_call_fat(
        bvh.nodes16, bvh.leafmat, ox, oy, oz, dx, dy, dz, tmax,
        n_nodes=bvh.n_nodes, n_leaves=bvh.leafmat.shape[0] // F,
        leaf_size=bvh.leaf_size, interpret=interpret)
    flat = lambda x: x.reshape(total)[:r]
    out_t = flat(t)
    out_tri = flat(tri)
    if bvh.n_tris == 0:
        out_t = jnp.full_like(out_t, np.inf)
        out_tri = jnp.full_like(out_tri, -1)
    return {"t": out_t, "tri": out_tri, "u": flat(u), "v": flat(v)}


def any_hit_fat_soa(bvh: FatBVH, origin3, direction3, t_max, t_min=1e-3,
                    active=None, interpret: bool = False):
    r = origin3[0].shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    act = (jnp.ones((r,), jnp.int32) if active is None
           else active.astype(jnp.int32))
    comps, rows, total = _pack_comps(origin3, direction3,
                                     [(t_max, -1.0), (act, 0)])
    ox, oy, oz, dx, dy, dz, tmax, actv = comps
    hit = _anyhit_call_fat(
        bvh.nodes16, bvh.leafmat, ox, oy, oz, dx, dy, dz, tmax, actv,
        n_nodes=bvh.n_nodes, n_leaves=bvh.leafmat.shape[0] // F,
        leaf_size=bvh.leaf_size, t_min=float(t_min), interpret=interpret)
    result = hit.reshape(total)[:r] != 0
    if bvh.n_tris == 0:
        result = jnp.zeros_like(result)
    return result


def closest_hit_fat_pallas(bvh: FatBVH, origin, direction, t_max=None,
                           interpret: bool = False):
    """AoS wrapper (contract of closest_hit_pallas)."""
    o3 = tuple(origin[:, i] for i in range(3))
    d3 = tuple(direction[:, i] for i in range(3))
    return closest_hit_fat_soa(bvh, o3, d3, t_max, interpret=interpret)


def any_hit_fat_pallas(bvh: FatBVH, origin, direction, t_max, t_min=1e-3,
                       active=None, interpret: bool = False):
    o3 = tuple(origin[:, i] for i in range(3))
    d3 = tuple(direction[:, i] for i in range(3))
    return any_hit_fat_soa(bvh, o3, d3, t_max, t_min=t_min, active=active,
                           interpret=interpret)
