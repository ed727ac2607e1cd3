"""Interactive preview fps on the real device (BASELINE's >10 fps bar).

Drives RealtimeRenderer.draw_frame(pipelined=True) — one progressive
launch per frame with frames-in-flight presentation — on the Sponza-class
scene at several render scales, plus a live material edit mid-run (the
glaze-app workload).

Usage: python tools/bench_interactive.py [width height]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from glaze_tpu.render.realtime import RealtimeRenderer
    from glaze_tpu.utils import enable_compilation_cache
    from tools.make_sponza import build_scene

    enable_compilation_cache()
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
    height = int(sys.argv[2]) if len(sys.argv) > 2 else 1080

    parsed = build_scene()
    import os as _os
    scales = tuple(float(v) for v in _os.environ.get(
        "GLAZE_BENCH_SCALES", "0.2,0.25,0.5,1.0").split(","))
    for scale in scales:
        rr = RealtimeRenderer(parsed, width=width, height=height,
                              render_scale=scale, seed=5)
        rr.draw_frame(pipelined=True)  # compile
        rr.draw_frame(pipelined=True)
        n = 12
        t0 = time.perf_counter()
        for _ in range(n):
            rr.draw_frame(pipelined=True)
        dt = time.perf_counter() - t0
        fps = n / dt
        w, h = rr._scaled(width), rr._scaled(height)
        print(f"scale {scale:4.2f} ({w}x{h}): {fps:6.2f} fps "
              f"({dt / n * 1e3:.0f} ms/frame)")

        # live edit mid-run (accumulation restart) stays interactive
        mat = rr.materials()[1]
        mat.roughness_mul = 0.8
        t0 = time.perf_counter()
        rr.change_material(1, mat)
        rr.draw_frame(pipelined=True)
        print(f"  material edit -> next frame: "
              f"{(time.perf_counter() - t0) * 1e3:.0f} ms")

        # the reference's raster preview equivalent (flat primary pass)
        rr.use_raytracer = False
        rr.draw_frame(pipelined=True)
        rr.draw_frame(pipelined=True)
        t0 = time.perf_counter()
        for _ in range(n):
            rr.draw_frame(pipelined=True)
        dt = time.perf_counter() - t0
        print(f"  flat preview: {n / dt:6.2f} fps ({dt / n * 1e3:.0f} "
              f"ms/frame)")

        # camera drag: accumulation restarts every frame, so each launch
        # is all-primary (the viewport.rs mouse-look workload)
        rr.use_raytracer = True
        rr.look_around(1e-4, 0.0)
        rr.draw_frame(pipelined=True)  # compile the restart path
        rr.draw_frame(pipelined=True)
        t0 = time.perf_counter()
        for _ in range(n):
            rr.look_around(1e-4, 0.0)
            rr.draw_frame(pipelined=True)
        dt = time.perf_counter() - t0
        print(f"  camera drag (PT, restart/frame): {n / dt:6.2f} fps "
              f"({dt / n * 1e3:.0f} ms/frame)")


if __name__ == "__main__":
    main()
