"""Probe: where does a small-scale progressive frame's time go?

At render scale 0.2 the pipelined draw loop runs ~8.6 fps (116 ms/frame)
and the >10 fps progressive bar needs ~1.2x. Candidates: pure device
launch time vs per-frame presentation overhead (tunnel round trip +
243 KB image transfer) that a depth-1 pipeline cannot fully hide.

Measures, on the Sponza-class scene at GLAZE_BENCH_SCALE (default 0.2):
  A. pure device rate: N chained fused launch+display executions,
     fetching ONLY the final image (amortizes sync) — the fps ceiling
  B. the production pipelined draw loop (depth 1)
  C. a depth-2 prototype: present frame N-2 while N-1 and N are in
     flight — if B-A gap is presentation, C should close it
Run on hardware only.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from glaze_tpu.render.realtime import RealtimeRenderer
    from glaze_tpu.utils import enable_compilation_cache
    from tools.make_sponza import build_scene

    enable_compilation_cache()
    scale = float(os.environ.get("GLAZE_BENCH_SCALE", "0.2"))
    parsed = build_scene()
    rr = RealtimeRenderer(parsed, width=1920, height=1080,
                          render_scale=scale, seed=5)
    rt = rr._rt
    w, h = rt.width, rt.height
    print(f"scale {scale} -> {w}x{h}", flush=True)
    n = 12

    # A: pure device rate (fetch only the last image)
    img = rt.draw_frame(return_image=True)  # compile
    np.asarray(img[:1])
    t0 = time.perf_counter()
    for _ in range(n):
        img = rt.draw_frame(return_image=True)
    np.asarray(img[:1])
    dt = time.perf_counter() - t0
    print(f"A pure launches:   {n/dt:6.2f} fps ({dt/n*1e3:.0f} ms)", flush=True)

    # B: production depth-1 pipelined loop
    rr.draw_frame(pipelined=True)
    rr.draw_frame(pipelined=True)
    t0 = time.perf_counter()
    for _ in range(n):
        rr.draw_frame(pipelined=True)
    dt = time.perf_counter() - t0
    print(f"B depth-1 draw:    {n/dt:6.2f} fps ({dt/n*1e3:.0f} ms)", flush=True)

    # C: depth-2 prototype (present frame N-2)
    from collections import deque

    q = deque()
    q.append(rt.draw_frame(return_image=True))
    q.append(rt.draw_frame(return_image=True))
    np.asarray(q[0][:1])  # settle
    t0 = time.perf_counter()
    for _ in range(n):
        q.append(rt.draw_frame(return_image=True))
        np.asarray(q.popleft())  # full image fetch = the "present"
    dt = time.perf_counter() - t0
    print(f"C depth-2 present: {n/dt:6.2f} fps ({dt/n*1e3:.0f} ms)", flush=True)


if __name__ == "__main__":
    main()
