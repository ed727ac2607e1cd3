"""Denoiser cost on the real device: ms/frame with the SVGF-style
display filter on vs off, at the interactive scales.

The filter (render/denoise.py) is elementwise padded-plane math the XLA
fuser eats for breakfast; this probe pins the actual per-frame cost so
the README claim ("denoise is ~free next to a launch") stays measured.

Usage: python tools/bench_denoise.py [width height]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_frames(rr, n=8):
    # perturb the camera per frame: the axon tunnel dedupes identical
    # (executable, inputs) pairs across processes (CLAUDE.md)
    rr.draw_frame(pipelined=True)
    rr.draw_frame(pipelined=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            rr.look_around(1e-4, 0.0)
            rr.draw_frame(pipelined=True)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


def main():
    from glaze_tpu.render.realtime import RealtimeRenderer
    from glaze_tpu.utils import enable_compilation_cache
    from tools.make_sponza import build_scene

    enable_compilation_cache()
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
    height = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    parsed = build_scene()
    for scale in (0.25, 1.0):
        rr = RealtimeRenderer(parsed, width=width, height=height,
                              render_scale=scale, seed=5)
        off = time_frames(rr)
        rr.denoise = True
        on = time_frames(rr)
        w, h = rr._scaled(width), rr._scaled(height)
        print(f"scale {scale:4.2f} ({w}x{h}): raw {off:7.1f} ms/frame, "
              f"denoised {on:7.1f} ms/frame (+{on - off:.1f} ms)",
              flush=True)


if __name__ == "__main__":
    main()
