"""Adaptive-sampling default gate: multi-scene time-to-quality matrix
(VERDICT r4 next #4).

For each scene FAMILY (interior atrium = adaptive's measured worst
case, sky-heavy = its best case, mixed emissive = in between), measures
wall seconds to a fixed display-MSE with adaptive OFF vs ON and prints
one JSON line per cell plus the ratios. The offline default stays ON
only if ratio >= ~1.0 everywhere (no harm) and >= 1.2 somewhere
realistic; otherwise flip it off and keep adaptive opt-in.

Run on the TPU host:
    python tools/bench_adaptive_matrix.py [--spp-truth 192] [--rungs 24]
Results land in the PERF_LOG round-5 adaptive section.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "tests"))


def scenes():
    from tools.make_sponza import build_scene
    from test_adaptive import _sky_heavy_scene
    from golden_scenes import MatRowScene

    # target None = auto-calibrate to (8-spp MSE) / 4 — reachable
    # around 32 spp under 1/n convergence, whatever the scene's
    # absolute noise level
    return [
        ("atrium", build_scene(), 384, 216, None),
        ("sky_heavy", _sky_heavy_scene(), 256, 128, None),
        ("matrow", MatRowScene(), 384, 192, None),
    ]


def main():
    import numpy as np
    from glaze_tpu.render.renderer import RayTraceRenderer
    from glaze_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    rungs = int(os.environ.get("GLAZE_ADMAT_RUNGS", "36"))
    rng = np.random.default_rng(int.from_bytes(os.urandom(8), "little"))
    out = {}
    for name, parsed, w, h, target in scenes():
        tr = RayTraceRenderer(parsed, width=w, height=h, seed=777,
                              adaptive=False)
        truth = np.asarray(tr.draw(192), float)
        del tr
        if target is None:
            pr = RayTraceRenderer(parsed, width=w, height=h, seed=4242,
                                  adaptive=False)
            probe = np.asarray(pr.draw(8), float)
            del pr
            target = round(float(((probe - truth) ** 2).mean()) / 4.0, 1)

        def ttq(adaptive):
            rw = RayTraceRenderer(parsed, width=w, height=h, seed=1,
                                  adaptive=adaptive)
            rw.draw(4)  # compile outside the timed window
            del rw
            walls = []
            for _ in range(3):
                rr = RayTraceRenderer(parsed, width=w, height=h,
                                      seed=int(rng.integers(1, 2**31)),
                                      adaptive=adaptive)
                wall, reached = 0.0, None
                for _ in range(rungs):
                    t0 = time.perf_counter()
                    img = rr.draw(4)
                    wall += time.perf_counter() - t0
                    mse = float(((np.asarray(img, float) - truth) ** 2)
                                .mean())
                    if mse <= target:
                        reached = round(wall, 2)
                        break
                walls.append(reached)
            ok = [x for x in walls if x is not None]
            return (round(float(np.median(ok)), 2) if ok else None), walls

        t_off, w_off = ttq(False)
        t_on, w_on = ttq(True)
        ratio = (round(t_off / t_on, 3)
                 if t_off is not None and t_on else None)
        cell = {"scene": name, "target_mse": target,
                "ttq_off_s": t_off, "ttq_on_s": t_on,
                "off_all": w_off, "on_all": w_on,
                "speedup_on": ratio}
        out[name] = cell
        print(json.dumps(cell), flush=True)
    print(json.dumps({"summary": {
        k: v["speedup_on"] for k, v in out.items()}}), flush=True)


if __name__ == "__main__":
    main()
