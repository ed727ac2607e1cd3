"""Does ray DENSITY move the row-union ceiling? (samples-in-flight probe)

The 128-lane row-union factor (PERF_LOG: 5.8x post-sort on the bench
bounce mix) is a function of how many spatially-close rays the Morton
sort can pack into each row. Tracing S samples per pixel in one wavefront
makes the sorted mix S× denser at zero sort cost — if ms/ray drops, a
samples-in-flight renderer mode wins the headline and time-to-256spp.

A/B: two captured launch buffers (different frame seeds, same camera)
traced separately vs concatenated+sorted as one batch, classic kernels.

Usage: python tools/bench_density.py [--phase=closest|anyhit]
         [a.npz b.npz]   (default /tmp/bench_rays_s3.npz + _s11.npz)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    phase = "closest"
    paths = []
    for a in sys.argv[1:]:
        if a.startswith("--phase="):
            phase = a.split("=")[1]
        elif a.endswith(".npz"):
            paths.append(a)
    if not paths:
        paths = ["/tmp/bench_rays_s3.npz", "/tmp/bench_rays_s11.npz"]

    import jax
    import jax.numpy as jnp

    from glaze_tpu.utils import enable_compilation_cache
    from tools.sim_fatleaf import world_tris, morton_key

    enable_compilation_cache()

    tv = world_tris()
    bmin = tv.min((0, 1))
    extent = np.maximum(tv.max((0, 1)) - bmin, 1e-20)

    def load(path):
        data = np.load(path)
        tag = [k[:-2] for k in data.files
               if k.endswith(".o") and phase in k][0]
        o = data[tag + ".o"].astype(np.float32)
        d = data[tag + ".d"].astype(np.float32)
        tmax = data.get(tag + ".tmax")
        active = data.get(tag + ".active")
        return o, d, tmax, active

    def sort(o, d, tmax, active):
        key = morton_key(o, d, bmin, extent)
        if active is not None:
            key = key + (~active).astype(np.int64) * (1 << 40)
        perm = np.argsort(key, kind="stable")
        o, d = o[perm], d[perm]
        tmax = (np.full(len(o), np.inf, np.float32) if tmax is None
                else tmax[perm].astype(np.float32))
        act = (np.ones(len(o), np.int32) if active is None
               else active[perm].astype(np.int32))
        return o, d, tmax, act

    from glaze_tpu.accel import build_bvh
    from glaze_tpu.accel.traverse_pallas import closest_hit_soa, any_hit_soa

    bvh, _ = build_bvh(tv)

    sets = [load(p) for p in paths]
    cat = tuple(np.concatenate([s[i] for s in sets])
                if sets[0][i] is not None else None for i in range(4))
    cases = [(f"single[{i}]", sort(*s)) for i, s in enumerate(sets)]
    cases.append((f"concat_x{len(sets)}", sort(*cat)))

    for name, (o, d, tmax, act) in cases:
        n = len(o)
        o3 = tuple(jnp.asarray(o[:, i]) for i in range(3))
        d3 = tuple(jnp.asarray(d[:, i]) for i in range(3))
        if phase == "closest":
            def run(eps):
                return closest_hit_soa(
                    bvh, tuple(c + eps for c in o3), d3)["t"]
        else:
            tm = jnp.asarray(tmax)
            ac = jnp.asarray(act)

            def run(eps):
                return any_hit_soa(bvh, tuple(c + eps for c in o3), d3,
                                   tm, active=ac).astype(jnp.float32)

        out = jax.block_until_ready(run(0.0))
        seed = int.from_bytes(os.urandom(4), "little") * 1e-13
        times, chain = [], 0.0
        for k in range(5):
            t0 = time.perf_counter()
            out = jax.block_until_ready(run(seed * (k + 1) + chain))
            dt = time.perf_counter() - t0
            chain = float(jnp.min(jnp.where(jnp.isfinite(out), out, 0.0))
                          ) * 1e-16
            times.append(dt)
        best = min(times[1:])
        print(f"{name:12s}: {best*1e3:8.1f} ms  {n:8d} rays  "
              f"{n/best/1e6:6.2f} Mrays/s  "
              f"({' '.join(f'{t*1e3:.0f}' for t in times)})", flush=True)


if __name__ == "__main__":
    main()
