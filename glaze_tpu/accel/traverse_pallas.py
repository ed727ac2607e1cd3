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

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from glaze_tpu.accel.bvh import T_MIN

PACKET_ROWS = 16  # rays per packet = PACKET_ROWS * 128
LANES = 128

def _load_fields(table_ref, item, per_row, stride):
    """Loads one packed item; returns an (8, 128) value whose lane f holds
    field f%stride in every sublane (an in-tile lane gather — the only
    dynamic-gather form the VPU supports)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
    row = table_ref[pl.ds(item // per_row, 1), :]
    rowb = jnp.broadcast_to(row, (8, LANES))
    idx = (item % per_row) * stride + lane % stride
    return jnp.take_along_axis(rowb, idx, axis=1)


def _node_fields(nodes_ref, ptr):
    """(bmin3, bmax3, meta, skip) scalars for node ``ptr``."""
    g = _load_fields(nodes_ref, ptr, 16, 8)
    gi = pltpu.bitcast(g, jnp.int32)
    return (
        (g[0, 0], g[0, 1], g[0, 2]),
        (g[0, 3], g[0, 4], g[0, 5]),
        gi[0, 6],
        gi[0, 7],
    )


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


def _tri_hit(tri_ref, tri_idx, ox, oy, oz, dx, dy, dz):
    """Moller-Trumbore of the whole packet against one triangle."""
    g = _load_fields(tri_ref, tri_idx, 8, 16)
    v0x, v0y, v0z = g[0, 0], g[0, 1], g[0, 2]
    e1x, e1y, e1z = g[0, 3], g[0, 4], g[0, 5]
    e2x, e2y, e2z = g[0, 6], g[0, 7], g[0, 8]
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


def _safe_inv(d):
    tiny = jnp.abs(d) < 1e-20
    return jnp.where(tiny, 1e20, 1.0 / jnp.where(tiny, 1.0, d))


def _closest_kernel(nodes_ref, tri_ref, ox_ref, oy_ref, oz_ref,
                    dx_ref, dy_ref, dz_ref, tmax_ref,
                    t_ref, tri_out_ref, u_ref, v_ref, *, n_nodes, n_tris,
                    leaf_size):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    ix, iy, iz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)

    init = (
        jnp.int32(0),
        tmax_ref[:],
        jnp.full(ox.shape, -1, jnp.int32),
        jnp.zeros(ox.shape, jnp.float32),
        jnp.zeros(ox.shape, jnp.float32),
    )

    def cond(c):
        return c[0] < n_nodes

    def body(c):
        ptr, t_best, tri_best, u_best, v_best = c
        bmin, bmax, meta, skip = _node_fields(nodes_ref, ptr)
        hit = _slab(bmin, bmax, ox, oy, oz, ix, iy, iz, t_best)
        any_hit = jnp.any(hit)
        is_leaf = meta >= 0

        def leaf_body(c2):
            t_best, tri_best, u_best, v_best = c2
            first = meta >> 3
            count = meta & 7
            for k in range(leaf_size):
                tid = jnp.minimum(first + k, n_tris - 1)
                t, u, v, h = _tri_hit(tri_ref, tid, ox, oy, oz, dx, dy, dz)
                better = h & (t < t_best) & (k < count) & hit
                t_best = jnp.where(better, t, t_best)
                tri_best = jnp.where(better, tid, tri_best)
                u_best = jnp.where(better, u, u_best)
                v_best = jnp.where(better, v, v_best)
            return t_best, tri_best, u_best, v_best

        t_best, tri_best, u_best, v_best = jax.lax.cond(
            any_hit & is_leaf, leaf_body, lambda c2: c2,
            (t_best, tri_best, u_best, v_best),
        )
        descend = any_hit & jnp.logical_not(is_leaf)
        ptr = jnp.where(descend, ptr + 1, skip)
        return ptr, t_best, tri_best, u_best, v_best

    _, t_best, tri_best, u_best, v_best = jax.lax.while_loop(cond, body, init)
    t_ref[:] = jnp.where(tri_best >= 0, t_best, jnp.float32(jnp.inf))
    tri_out_ref[:] = tri_best
    u_ref[:] = u_best
    v_ref[:] = v_best


def _anyhit_kernel(nodes_ref, tri_ref, ox_ref, oy_ref, oz_ref,
                   dx_ref, dy_ref, dz_ref, tmax_ref, active_ref,
                   hit_ref, *, n_nodes, n_tris, leaf_size, t_min):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    t_max = tmax_ref[:]
    needed0 = active_ref[:]  # int32 0/1
    ix, iy, iz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)
    # NOTE: the retire mask is carried as int32 — Mosaic miscompiles i1
    # vectors passed through an identity lax.cond branch (layout mismatch
    # between packed and unpacked masks).
    init = (jnp.int32(0), jnp.zeros(ox.shape, jnp.int32))

    def cond(c):
        ptr, blocked = c
        return (ptr < n_nodes) & jnp.any(needed0 > blocked)

    def body(c):
        ptr, blocked = c
        bmin, bmax, meta, skip = _node_fields(nodes_ref, ptr)
        want = needed0 > blocked
        cap = jnp.where(want, t_max, jnp.float32(-1.0))  # retired lanes cull
        hit = _slab(bmin, bmax, ox, oy, oz, ix, iy, iz, cap)
        any_h = jnp.any(hit)
        is_leaf = meta >= 0

        def leaf_body(blocked):
            first = meta >> 3
            count = meta & 7
            for k in range(leaf_size):
                tid = jnp.minimum(first + k, n_tris - 1)
                t, _, _, h = _tri_hit(tri_ref, tid, ox, oy, oz, dx, dy, dz)
                new = h & (t > t_min) & (t < t_max) & (k < count) & hit
                blocked = jnp.maximum(blocked, new.astype(jnp.int32))
            return blocked

        blocked = jax.lax.cond(any_h & is_leaf, leaf_body, lambda b: b, blocked)
        descend = any_h & jnp.logical_not(is_leaf)
        ptr = jnp.where(descend, ptr + 1, skip)
        return ptr, blocked

    _, blocked = jax.lax.while_loop(cond, body, init)
    hit_ref[:] = blocked


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


def _pack_rays(origin, direction, extra=()):
    """(R, 3) ray arrays -> per-component (rows, 128) padded layouts."""
    r = origin.shape[0]
    rows = -(-r // LANES)
    pad_rows = -(-rows // PACKET_ROWS) * PACKET_ROWS
    total = pad_rows * LANES

    def comp(x, fill):
        if total != r:
            x = jnp.concatenate([x, jnp.full((total - r,), fill, x.dtype)])
        return x.reshape(pad_rows, LANES)

    comps = [comp(origin[:, i], 0.0) for i in range(3)]
    # padding rays get zero direction -> inv 1e20 -> slab never hits
    comps += [comp(direction[:, i], 0.0) for i in range(3)]
    comps += [comp(x, fill) for x, fill in extra]
    return comps, pad_rows, total


def _ray_blk():
    return pl.BlockSpec((PACKET_ROWS, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _full(a):
    return pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("n_nodes", "n_tris", "leaf_size",
                                             "interpret"))
def _closest_call(nodes16, tri8, ox, oy, oz, dx, dy, dz, tmax, *, n_nodes,
                  n_tris, leaf_size, interpret):
    rows = ox.shape[0]
    grid = rows // PACKET_ROWS
    kernel = functools.partial(_closest_kernel, n_nodes=n_nodes,
                               n_tris=n_tris, leaf_size=leaf_size)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[_full(nodes16), _full(tri8)] + [_ray_blk() for _ in range(7)],
        out_specs=[_ray_blk() for _ in range(4)],
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(nodes16, tri8, ox, oy, oz, dx, dy, dz, tmax)


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
    kernel = functools.partial(_anyhit_kernel, n_nodes=n_nodes, n_tris=n_tris,
                               leaf_size=leaf_size, t_min=t_min)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[_full(nodes16), _full(tri8)] + [_ray_blk() for _ in range(8)],
        out_specs=_ray_blk(),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        interpret=interpret,
    )(nodes16, tri8, ox, oy, oz, dx, dy, dz, tmax, active)


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
