"""Feasibility + cost microbench for the fat-leaf MXU drain engine.

Moller-Trumbore is multilinear in per-ray features x = [o'xd, o', d, 1]
(o' = o - leaf_centre): per triangle a 16x4 coefficient block maps x to
(det, u*det, v*det, t*det), so one dot_general of the leaf matrix
(16, 4T) with the row features (16, 128) tests a whole T-triangle leaf
against 128 rays on the MXU (VERDICT r2 next-round #1).

This tool checks three things ON CHIP:
  1. Mosaic compiles the contraction (lhs dim0 x rhs dim0) and the
     sublane-reduce resolve.
  2. Numeric agreement with the exact VPU Moller-Trumbore (per precision).
  3. Cycles per (row, leaf) drain at T in {16, 32, 64, 128}: the C_drain
     constant for the fat-leaf cost model (tools/sim_fatleaf.py).

Usage: python tools/bench_mxu.py [T ...]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

T_MIN = 1e-4
DET_EPS = 1e-12
F = 16  # feature rows (10 used)


def leaf_matrices(tri_verts, T):
    """(N,3,3) world triangles -> (L, 16, 4T) leaf matrices + (L,3) centres.

    Column layout within 4T: [det | u*det | v*det | t*det] blocks of T.
    Padding triangles (all-zero rows) produce det=0 -> never valid.
    """
    n = tri_verts.shape[0]
    L = -(-n // T)
    pad = L * T - n
    tv = np.concatenate([tri_verts,
                         np.zeros((pad, 3, 3), np.float32)]) if pad else tri_verts
    tv = tv.reshape(L, T, 3, 3).astype(np.float64)
    # leaf centre from REAL tris only
    counts = np.minimum(np.maximum(n - np.arange(L) * T, 1), T)
    centre = np.stack([tv[l, :counts[l], 0].mean(0) for l in range(L)])
    v0 = tv[:, :, 0] - centre[:, None]
    e1 = tv[:, :, 1] - tv[:, :, 0]
    e2 = tv[:, :, 2] - tv[:, :, 0]
    n12 = np.cross(e1, e2)
    m = np.zeros((L, F, 4 * T), np.float64)
    # det
    m[:, 6:9, 0 * T:1 * T] = np.cross(e2, e1).transpose(0, 2, 1)
    # u*det
    m[:, 0:3, 1 * T:2 * T] = e2.transpose(0, 2, 1)
    m[:, 6:9, 1 * T:2 * T] = -np.cross(e2, v0).transpose(0, 2, 1)
    # v*det
    m[:, 0:3, 2 * T:3 * T] = -e1.transpose(0, 2, 1)
    m[:, 6:9, 2 * T:3 * T] = -np.cross(v0, e1).transpose(0, 2, 1)
    # t*det
    m[:, 3:6, 3 * T:4 * T] = n12.transpose(0, 2, 1)
    m[:, 9, 3 * T:4 * T] = -(v0 * n12).sum(-1)
    # lane dim must be a multiple of the 128 tiling for HBM DMA slices
    w = -(-4 * T // 128) * 128
    if w != 4 * T:
        m = np.concatenate([m, np.zeros((L, F, w - 4 * T))], axis=2)
    return m.astype(np.float32), centre.astype(np.float32)


def np_reference(tri_verts, o, d, t_cap):
    """Exact scalar MT over all tris; returns (t, tri) per ray."""
    v0 = tri_verts[:, 0]
    e1 = tri_verts[:, 1] - v0
    e2 = tri_verts[:, 2] - v0
    best_t = np.full(o.shape[0], np.inf)
    best_i = np.full(o.shape[0], -1)
    for i in range(len(v0)):
        p = np.cross(d, e2[i])
        det = p @ e1[i]
        ok = np.abs(det) >= DET_EPS
        inv = np.where(ok, 1.0 / np.where(det == 0, 1, det), 0.0)
        tv = o - v0[i]
        u = (tv * p).sum(-1) * inv
        q = np.cross(tv, e1[i])
        v = (d * q).sum(-1) * inv
        t = (q @ e2[i]) * inv
        hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > T_MIN) & \
            (t < np.minimum(best_t, t_cap))
        best_t = np.where(hit, t, best_t)
        best_i = np.where(hit, i, best_i)
    return best_t, best_i


def make_kernel(T, n_leaves, reps, precision):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dn = (((0,), (0,)), ((), ()))

    def kernel(order_ref, mats_hbm, centres_ref, rays_ref,
               t_ref, tri_ref, u_ref, v_ref, feat_ref, mat_ref, sems):
        ox, oy, oz = rays_ref[0:1], rays_ref[1:2], rays_ref[2:3]
        dx, dy, dz = rays_ref[3:4], rays_ref[4:5], rays_ref[5:6]
        t_ref[:] = jnp.full((8, 128), jnp.inf, jnp.float32)
        tri_ref[:] = jnp.full((8, 128), -1, jnp.int32)
        u_ref[:] = jnp.zeros((8, 128), jnp.float32)
        v_ref[:] = jnp.zeros((8, 128), jnp.float32)
        feat_ref[:] = jnp.zeros((F, 128), jnp.float32)
        feat_ref[9:10] = jnp.ones((1, 128), jnp.float32)
        iota = jax.lax.broadcasted_iota(jnp.int32, (T, 128), 0)

        def body(k, _):
            leaf = order_ref[k % reps]
            cp = pltpu.make_async_copy(
                mats_hbm.at[pl.ds(leaf * F, F), :], mat_ref, sems.at[0])
            cp.start()
            cx = centres_ref[leaf, 0]
            cy = centres_ref[leaf, 1]
            cz = centres_ref[leaf, 2]
            opx, opy, opz = ox - cx, oy - cy, oz - cz
            feat_ref[0:1] = opy * dz - opz * dy
            feat_ref[1:2] = opz * dx - opx * dz
            feat_ref[2:3] = opx * dy - opy * dx
            feat_ref[3:4] = opx
            feat_ref[4:5] = opy
            feat_ref[5:6] = opz
            feat_ref[6:7] = dx
            feat_ref[7:8] = dy
            feat_ref[8:9] = dz
            cp.wait()
            out = jax.lax.dot_general(
                mat_ref[:], feat_ref[:], dn,
                precision=precision,
                preferred_element_type=jnp.float32)
            det = out[0 * T:1 * T]
            ud = out[1 * T:2 * T]
            vd = out[2 * T:3 * T]
            td = out[3 * T:4 * T]
            ok = jnp.abs(det) >= DET_EPS
            inv = jnp.where(ok, 1.0 / jnp.where(det == 0.0, 1.0, det), 0.0)
            t = td * inv
            tb = t_ref[0:1]
            valid = (ok & (ud * det >= 0.0) & (vd * det >= 0.0)
                     & ((ud + vd) * det <= det * det)
                     & (t > T_MIN) & (t < tb))
            tt = jnp.where(valid, t, jnp.inf)
            tmin = jnp.min(tt, axis=0, keepdims=True)
            widx = jnp.min(jnp.where(tt <= tmin, iota, T), axis=0,
                           keepdims=True)
            onehot = iota == widx
            uw = jnp.sum(jnp.where(onehot, ud * inv, 0.0), axis=0,
                         keepdims=True)
            vw = jnp.sum(jnp.where(onehot, vd * inv, 0.0), axis=0,
                         keepdims=True)
            better = tmin < tb
            t_ref[0:1] = jnp.where(better, tmin, tb)
            tri_ref[0:1] = jnp.where(better, leaf * T + widx,
                                     tri_ref[0:1])
            u_ref[0:1] = jnp.where(better, uw, u_ref[0:1])
            v_ref[0:1] = jnp.where(better, vw, v_ref[0:1])
            return 0

        jax.lax.fori_loop(0, reps, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # mats (L*F, 4T) HBM
            pl.BlockSpec(memory_space=pltpu.SMEM),  # centres (L, 3)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # rays (8,128)
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        scratch_shapes=[
            pltpu.VMEM((F, 128), jnp.float32),
            pltpu.VMEM((F, max(4 * T, 128)), jnp.float32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((8, 128), jnp.float32),
        jax.ShapeDtypeStruct((8, 128), jnp.int32),
        jax.ShapeDtypeStruct((8, 128), jnp.float32),
        jax.ShapeDtypeStruct((8, 128), jnp.float32),
    ]
    return pl.pallas_call(kernel, grid_spec=grid_spec, out_shape=out_shape)


def run(T, precision="highest", check=True):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    n_tri = 8 * T
    # triangle cloud spanning a world ~40 units from origin (Sponza-like
    # magnitudes so the precision check is honest)
    base = rng.uniform(-20, 20, (n_tri, 1, 3))
    tri = (base + rng.uniform(-0.6, 0.6, (n_tri, 3, 3))).astype(np.float32)
    mats, centres = leaf_matrices(tri, T)
    L = mats.shape[0]

    o = rng.uniform(-22, 22, (128, 3)).astype(np.float32)
    d = rng.normal(size=(128, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.zeros((8, 128), np.float32)
    rays[0:3] = o.T
    rays[3:6] = d.T

    reps_check = L  # visit each leaf once
    order = np.arange(L, dtype=np.int32)
    fn = make_kernel(T, L, reps_check, precision)
    mats_flat = jnp.asarray(mats.reshape(L * F, mats.shape[2]))
    t, tri_id, u, v = fn(jnp.asarray(order), mats_flat,
                         jnp.asarray(centres), jnp.asarray(rays))
    t = np.asarray(t[0])
    tri_id = np.asarray(tri_id[0])
    if check:
        rt, ri = np_reference(tri.astype(np.float64), o.astype(np.float64),
                              d.astype(np.float64), np.inf)
        hit_match = ((tri_id >= 0) == (ri >= 0)).mean()
        both = (tri_id >= 0) & (ri >= 0)
        t_err = np.abs(t[both] - rt[both]) / np.maximum(rt[both], 1e-6)
        id_match = (tri_id[both] == ri[both]).mean() if both.any() else 1.0
        print(f"T={T} prec={precision}: hit agree {hit_match:.4f}, "
              f"id agree {id_match:.4f}, rel t err max "
              f"{t_err.max() if both.any() else 0:.2e}")

    # timing: long rep loops, distinct leaf orders per call (tunnel dedupe)
    for reps in (8192, 24576):
        order = rng.integers(0, L, reps).astype(np.int32)
        fn = make_kernel(T, L, reps, precision)
        r = fn(jnp.asarray(order), mats_flat, jnp.asarray(centres),
               jnp.asarray(rays))
        jax.block_until_ready(r)
        best = np.inf
        for _ in range(3):
            order = rng.integers(0, L, reps).astype(np.int32)
            t0 = time.perf_counter()
            r = fn(jnp.asarray(order), mats_flat, jnp.asarray(centres),
                   jnp.asarray(rays))
            jax.block_until_ready(r)
            best = min(best, time.perf_counter() - t0)
        cyc = best * 940e6 / reps
        print(f"  reps={reps}: {best*1e3:.2f} ms -> {cyc:.0f} cyc/(row,leaf)"
              f" = {cyc/T:.2f} cyc/tri-row")


def main():
    ts = [int(a) for a in sys.argv[1:] if a.isdigit()] or [16, 32, 64, 128]
    precs = [a for a in sys.argv[1:] if not a.isdigit()] or \
        ["highest", "default"]
    for T in ts:
        for p in precs:
            run(T, p)


if __name__ == "__main__":
    main()
