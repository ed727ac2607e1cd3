"""Row-union visit counts vs packet tile shape (GLAZE_TILE candidates).

The walk's scheduling unit is a 128-lane row. With the default 128x16
tile a row is a 128x1 PIXEL STRIP; 64x32 makes it a 64x2 block and
32x64 a 32x4 block — smaller diameter, smaller node union. This sim
counts per-row union visits on the real bench geometry for primary rays
at the interactive scale (384x224) and at 1080p, using the validated
cost identity (launch time ~ visits x cycles/visit at fixed drain
engine), to rank the hardware sweep before the tunnel returns.

Usage: JAX_PLATFORMS=cpu python tools/sim_tileshape.py [max_groups]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from glaze_tpu.accel.bvh import build_host_octants
    from glaze_tpu.render import integrator as integ
    from glaze_tpu.scene import flatten as F
    from tools.make_sponza import build_scene
    from tools.sim_traversal import walk_visits

    max_groups = int(sys.argv[1]) if len(sys.argv) > 1 else 1500

    parsed = build_scene()
    scene, camera, host = F.flatten_scene(parsed)
    # host-side octant tables for the sim walker
    tri_pos = np.asarray(scene.bvh.tri)[:, 0:3]
    e1 = np.asarray(scene.bvh.tri)[:, 3:6]
    e2 = np.asarray(scene.bvh.tri)[:, 6:9]
    tv = np.stack([tri_pos, tri_pos + e1, tri_pos + e2], axis=1)
    flat_oct = build_host_octants(np.ascontiguousarray(tv, np.float32))

    for width, height in ((384, 224), (1920, 1088)):
        print(f"--- {width}x{height} primary rays ---")
        base = None
        for tw, th in ((128, 16), (64, 32), (32, 64), (16, 128)):
            integ.TILE_W, integ.TILE_H = tw, th
            px, py = integ.pixel_coords(width, height)
            c2w, s2c = integ.camera_matrices(camera, width, height)
            ndc_x = -1.0 + 2.0 * (px + 0.5) / width
            ndc_y = -1.0 + 2.0 * (py + 0.5) / height
            o, d = integ.camera_rays(ndc_x, ndc_y, jnp.asarray(c2w),
                                     jnp.asarray(s2c), True)
            o = np.stack([np.asarray(c) for c in o], -1)
            d = np.stack([np.asarray(c) for c in d], -1)
            n_int, n_leaf, n_groups, iters = walk_visits(
                flat_oct, o, d, group=128, max_groups=max_groups,
                tile=2048, tile_octant=True)
            tot = (n_int + n_leaf) / n_groups
            rel = "" if base is None else f"  ({base / tot:.2f}x fewer)"
            if base is None:
                base = tot
            print(f"tile {tw:3d}x{th:<3d}: {n_int/n_groups:7.1f} int + "
                  f"{n_leaf/n_groups:6.1f} leaf = {tot:7.1f} visits/row"
                  f"  [lockstep iters/tile {iters/ (n_groups/ (2048//128)):.1f}]{rel}")


if __name__ == "__main__":
    main()
