"""Isolates the per-iteration overhead of the traversal while-loop.

Variants (all walk the same mattest octant-0 layout over the same 32k
primary rays, NO t-pruning so the iteration count is identical and known):
  A full    : leaf pl.when + full 8-tri Moller-Trumbore leaf body
  B when    : leaf pl.when + trivial leaf body (one ref store)
  C nowhen  : no branch at all — body is load + gather + slab + descend
  D nosync  : like C but descend is data-INdependent (ptr % 3 != 0), so
              there is no vector->scalar sync in the loop at all
Time(A)-Time(B) = leaf body; B-C = branch; C-D = any() sync; D = loop floor.

Usage: python tools/exp_overhead.py [A B C D]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from glaze_tpu.utils import enable_compilation_cache
from glaze_tpu.accel.traverse_pallas import (
    LANES,
    PACKET_ROWS,
    _field,
    _load_row,
    _load_tables,
    _node_fields,
    _safe_inv,
    _slab,
    _table_scratch,
    _tri_hit_rows,
    _hbm,
    _ray_blk,
)

enable_compilation_cache()

TILES = 16
SCAN = 16


def make_kernel(variant, n_nodes, leaf_size=8):
    def kernel(oct_ref, nodes_hbm, tri_hbm, ox_ref, oy_ref, oz_ref,
               dx_ref, dy_ref, dz_ref, t_ref, nodes_ref, tri_ref, sems):
        _load_tables(nodes_hbm, tri_hbm, oct_ref, nodes_ref, tri_ref, sems,
                     True, True)
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        ix, iy, iz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)
        t_ref[:] = jnp.zeros(ox.shape, jnp.float32)
        inf = jnp.full(ox.shape, jnp.inf, jnp.float32)

        def cond(ptr):
            return ptr < n_nodes

        def body(ptr):
            rowb, slot = _load_row(nodes_ref, ptr, 16)
            f8 = _node_fields(rowb, slot)
            meta = pltpu.bitcast(f8[6:7], jnp.int32)[0, 0]
            skip = pltpu.bitcast(f8[7:8], jnp.int32)[0, 0]
            hit = _slab((f8[0:1], f8[1:2], f8[2:3]),
                        (f8[3:4], f8[4:5], f8[5:6]),
                        ox, oy, oz, ix, iy, iz, inf)
            is_leaf = meta >= 0
            if variant == "D":
                descend = (ptr % 3) != 2
                t_ref[:] = t_ref[:] + jnp.sum(hit.astype(jnp.float32)) * 0
                return jnp.where(descend & jnp.logical_not(is_leaf),
                                 ptr + 1, skip)
            any_hit = jnp.any(hit)
            if variant in ("A", "B"):
                @pl.when(any_hit & is_leaf)
                def _():
                    if variant == "B":
                        t_ref[:] = t_ref[:] + 1.0
                    else:
                        first = meta >> 3
                        acc = t_ref[:]
                        row = tri_ref[pl.ds(first // 8, 1), :]
                        trow = jnp.broadcast_to(row, (8, LANES))
                        for k in range(leaf_size):
                            t, u, v, h = _tri_hit_rows(trow, k * 16, ox, oy,
                                                       oz, dx, dy, dz)
                            acc = acc + jnp.where(h & hit, t, 0.0)
                        t_ref[:] = acc
            descend = any_hit & jnp.logical_not(is_leaf)
            return jnp.where(descend, ptr + 1, skip)

        jax.lax.while_loop(cond, body, jnp.int32(0))

    return kernel


def main():
    want = sys.argv[1:] or ["A", "B", "C", "D"]
    import glaze_tpu
    from glaze_tpu.scene.flatten import flatten_scene
    from glaze_tpu.render import integrator as integ

    parsed = glaze_tpu.parse("/root/reference/resources/mattest.glaze")
    scene, camera, host = flatten_scene(parsed)
    bvh = scene.bvh
    width = height = 512
    px, py = integ.pixel_coords(width, height)
    c2w, s2c = integ.camera_matrices(camera, width, height)
    ndc_x = -1.0 + 2.0 * (px + 0.5) / width
    ndc_y = -1.0 + 2.0 * (py + 0.5) / height
    oo, dd = integ.camera_rays(ndc_x, ndc_y, jnp.asarray(c2w),
                               jnp.asarray(s2c), True)
    po = np.stack([np.asarray(c) for c in oo], -1)
    pd = np.stack([np.asarray(c) for c in dd], -1)
    r = TILES * PACKET_ROWS * LANES
    o, d = po[:r].astype(np.float32), pd[:r].astype(np.float32)

    rows = TILES * PACKET_ROWS
    comp = lambda a, i: jnp.asarray(a[:, i].reshape(rows, LANES))
    octs = jnp.zeros((TILES,), jnp.int32)
    n_nodes = bvh.nodes.shape[0]

    # D's walk length (data independent)
    skp = np.asarray(bvh.nodes[:, 7]).view(np.int32)
    meta = np.asarray(bvh.nodes[:, 6]).view(np.int32)
    ptr = 0
    d_iters = 0
    while 0 <= ptr < n_nodes:
        d_iters += 1
        ptr = ptr + 1 if (ptr % 3 != 2 and meta[ptr] < 0) else skp[ptr]
    print(f"D walk iterations: {d_iters}; A/B/C = 372.5 avg (sim)")

    for v in want:
        kern = make_kernel(v, n_nodes)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(TILES,),
            in_specs=[_hbm(bvh.nodes16), _hbm(bvh.tri8)]
            + [_ray_blk() for _ in range(6)],
            out_specs=_ray_blk(),
            scratch_shapes=_table_scratch(bvh.nodes16, bvh.tri8),
        )
        call = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        )

        @jax.jit
        def scan_call(ox, oy, oz, dxx, dyy, dzz):
            def step(c, _):
                ox, oy, oz = c
                out = call(octs, bvh.nodes16, bvh.tri8, ox, oy, oz,
                           dxx, dyy, dzz)
                return (ox + 1e-6, oy + 1e-6, oz - 1e-6), out[0, 0]

            _, outs = jax.lax.scan(step, (ox, oy, oz), None, length=SCAN)
            return outs

        args = [comp(o, 0), comp(o, 1), comp(o, 2),
                comp(d, 0), comp(d, 1), comp(d, 2)]
        out = jax.block_until_ready(scan_call(*args))
        args[0] = args[0] + 1e-5
        t0 = time.perf_counter()
        out = jax.block_until_ready(scan_call(*args))
        dt = (time.perf_counter() - t0) / SCAN
        iters = d_iters if v == "D" else 372.5
        per_iter = dt / TILES / iters * 1.7e9
        print(f"variant {v}: {dt * 1e3:7.2f} ms/call  "
              f"~{per_iter:6.0f} cycles/iter (@1.7GHz, {iters:.0f} iters)")


if __name__ == "__main__":
    main()
