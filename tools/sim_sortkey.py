"""Bounce-phase sort-key search: can more DIRECTION bits in the Morton
key shrink row unions on the dominant (bounce closest-hit) phase?

Production key (integrator._trace_perm): [octant(3) | origin Morton(15)].
Candidates keep octant as the top bits (the per-packet octant slab DMA
requires octant-pure packets) and re-budget the low bits between origin
and direction. Rays are synthetic one-bounce cosine rays from the real
bench scene's 1080p primaries — the same construction sim_traversal uses
(the real captures need hardware).

Usage: JAX_PLATFORMS=cpu python tools/sim_sortkey.py [max_groups]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _interleave(cols, bits):
    """Bit-interleaves K quantized columns (each `bits` wide) into one
    Morton key. Generic (works for any bits/K — the production kernel's
    mask-based _spread3 only handles 5-bit inputs, which silently
    aliased the first version of this sim's 7-bit and 6D candidates)."""
    out = np.zeros(len(cols[0]), np.int64)
    k = len(cols)
    for b in range(bits):
        for i, c in enumerate(cols):
            out |= ((c.astype(np.int64) >> b) & 1) << (k * b + i)
    return out


def _morton3(q, bits):
    return _interleave([q[:, 0], q[:, 1], q[:, 2]], bits)


def _quant(v, lo, extent, bits):
    return np.clip(((v - lo) / extent * (1 << bits)).astype(np.int64),
                   0, (1 << bits) - 1)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from glaze_tpu.accel.bvh import build_host_octants
    from glaze_tpu.scene import flatten as F
    from tools.make_sponza import build_scene
    from tools.sim_traversal import gen_rays, walk_visits

    max_groups = int(sys.argv[1]) if len(sys.argv) > 1 else 1200

    parsed = build_scene()
    scene, camera, host = F.flatten_scene(parsed)
    tri = np.asarray(scene.bvh.tri)
    tv = np.stack([tri[:, 0:3], tri[:, 0:3] + tri[:, 3:6],
                   tri[:, 0:3] + tri[:, 6:9]], axis=1)
    flat_oct = build_host_octants(np.ascontiguousarray(tv, np.float32))

    (_, _), (bo, bd) = gen_rays(scene, camera, 1920, 1088)
    n = (len(bo) // 2048) * 2048
    bo, bd = bo[:n], bd[:n]
    print(f"{n} synthetic bounce rays on the bench scene")

    centre = np.asarray(scene.scene_centre)
    radius = float(np.asarray(scene.scene_radius))
    lo = centre - radius
    ext = 2.0 * radius

    octant = ((bd[:, 0] >= 0).astype(np.int64)
              | ((bd[:, 1] >= 0).astype(np.int64) << 1)
              | ((bd[:, 2] >= 0).astype(np.int64) << 2))

    def qo(bits):
        return [_quant(bo[:, i], lo[i], ext, bits) for i in range(3)]

    def qd(bits):
        return [_quant(bd[:, i], -1.0, 2.0, bits) for i in range(3)]

    def key_origin(bits):
        return _interleave(qo(bits), bits)

    def key_dir(bits):
        return _interleave(qd(bits), bits)

    cands = {
        "octant only": octant,
        "oct + origin5/axis (production)": (octant << 15) | key_origin(5),
        "oct + origin4 + dir2 (org-major)":
            (octant << 18) | (key_origin(4) << 6) | key_dir(2),
        "oct + dir2 + origin4 (dir-major)":
            (octant << 18) | (key_dir(2) << 12) | key_origin(4),
        "oct + dir3 + origin3":
            (octant << 18) | (key_dir(3) << 9) | key_origin(3),
        "oct + 6D interleave o5/d5":
            (octant << 30) | _interleave(qo(5) + qd(5), 5),
        "oct + origin7/axis":
            (octant << 21) | key_origin(7),
    }

    base = None
    for name, key in cands.items():
        order = np.argsort(key, kind="stable")
        o, d = bo[order], bd[order]
        n_int, n_leaf, n_groups, iters = walk_visits(
            flat_oct, o, d, group=128, max_groups=max_groups,
            tile=2048, tile_octant=True)
        tot = (n_int + n_leaf) / n_groups
        lock = iters / (n_groups / 16)
        rel = "" if base is None else f"  ({base / lock:.2f}x vs production)"
        if name.endswith("(production)"):
            base = lock
        print(f"{name:34s}: {tot:7.1f} visits/row, lockstep/tile "
              f"{lock:7.1f}{rel}")


if __name__ == "__main__":
    main()
