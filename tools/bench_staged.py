"""Staged benchmark configs #1-#3 from BASELINE.json (`configs`).

BASELINE.md lists five staged configs; bench.py measures #4 (Sponza-class
1080p headline) and #5 (interactive fps keys). This harness records the
first three, one JSON line each:

  1. Converter + scene I/O: cube.obj -> .glaze round-trip + mattest parse
     (CPU-only).
  2. mattest, Lambert-only, 512x512 @ 64 spp offline (glaze-cli parity).
  3. mattest, full material set (glass/mirror/metal/GGX) with NEE,
     512x512 @ 256 spp. The per-material radiance match itself is pinned
     by tests/test_oracle.py (scalar oracle) and tests/test_goldens.py;
     here we record wall time + basic image sanity.

Usage: python tools/bench_staged.py [--configs 1,2,3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RES = "/root/reference/resources"


def config1():
    from glaze_tpu.converter import convert
    from glaze_tpu.parser import parse

    t0 = time.perf_counter()
    with tempfile.TemporaryDirectory() as d:
        out = os.path.join(d, "cube.glaze")
        convert(os.path.join(RES, "cube.obj"), out)
        p = parse(out)
        n_v = len(p.vertices())
    t_conv = time.perf_counter() - t0

    t0 = time.perf_counter()
    p = parse(os.path.join(RES, "mattest.glaze"))
    # chunk reads are lazy; touch every chunk so the timing covers the
    # full xz decompress + hash verify (what --benchmark times in the
    # reference converter)
    n_v = len(p.vertices())
    mats = len(p.materials())
    _ = (p.meshes(), p.textures(), p.lights(), p.cameras(), p.meta())
    t_parse = time.perf_counter() - t0
    return {"config": 1, "metric": "scene_io_s",
            "convert_roundtrip_s": round(t_conv, 3),
            "mattest_parse_all_chunks_s": round(t_parse, 3),
            "mattest_vertices": n_v, "mattest_materials": mats}


def _render(parsed, spp, lambert_only=False, res=512):
    import numpy as np

    from glaze_tpu.render.renderer import RayTraceRenderer

    if lambert_only:
        import dataclasses

        from glaze_tpu.core import MaterialType

        mats = [dataclasses.replace(m, mtype=MaterialType.LAMBERT)
                for m in parsed.materials()]
    w = h = res
    r = RayTraceRenderer(parsed, width=w, height=h, seed=7)
    if lambert_only:
        r.update_materials_and_lights(mats, parsed.lights())
    from glaze_tpu.render import integrator as integ

    t_setup = time.perf_counter()
    r.draw(1)  # compile + first sample
    t0 = time.perf_counter()
    r.draw(spp - 1)
    img = r.get_image()  # host transfer = completion barrier
    dt = time.perf_counter() - t0
    setup_plus_first = t0 - t_setup
    rays = w * h * (spp - 1) * integ.PT_STEPS  # launches per sample
    return {
        "wall_s": round(dt, 1),
        "setup_plus_first_sample_s": round(setup_plus_first, 1),
        "mrays_per_sec": round(rays / dt / 1e6, 3),
        "img_mean": round(float(np.asarray(img, np.float32).mean()), 2),
        "img_max": int(img.max()),
        "nonzero_frac": round(float((img > 0).mean()), 3),
    }


def config2(res=512, spp=64):
    from glaze_tpu.parser import parse

    parsed = parse(os.path.join(RES, "mattest.glaze"))
    out = _render(parsed, spp, lambert_only=True, res=res)
    out.update({"config": 2, "metric": f"mattest_lambert_{res}_{spp}spp"})
    return out


def config3(res=512, spp=256):
    from glaze_tpu.parser import parse

    parsed = parse(os.path.join(RES, "mattest.glaze"))
    out = _render(parsed, spp, res=res)
    out.update({"config": 3, "metric": f"mattest_full_{res}_{spp}spp"})
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="1,2,3")
    ap.add_argument("--res", type=int, default=512,
                    help="override render size (smoke tests)")
    ap.add_argument("--spp", type=int, default=None,
                    help="override spp (smoke tests)")
    args = ap.parse_args(argv)
    for c in args.configs.split(","):
        c = c.strip()
        if c == "1":
            res = config1()
        elif c == "2":
            res = config2(args.res, args.spp or 64)
        elif c == "3":
            res = config3(args.res, args.spp or 256)
        else:
            raise SystemExit(f"unknown config {c!r} (valid: 1, 2, 3)")
        print(json.dumps(res), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
