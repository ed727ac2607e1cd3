"""Profiles the fused launch scan on the real device and prints the top
ops by EXCLUSIVE device time (xplane parse per the r1 recipe).

Usage: python tools/profile_launch.py [scene] [width] [steps]
"""

import glob
import gzip
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from glaze_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def main():
    scene_path = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/resources/mattest.glaze"
    width = height = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 6

    from glaze_tpu.render import integrator as integ
    from glaze_tpu.render.renderer import RayTraceRenderer

    if scene_path == "sponza":
        from tools.make_sponza import build_scene

        parsed = build_scene()
    else:
        from glaze_tpu.parser import parse

        parsed = parse(scene_path)
    r = RayTraceRenderer(parsed, width=width, height=height, seed=3)
    c2w, s2c = integ.camera_matrices(r.camera, width, height)
    kw = dict(width=width, height=height, is_persp=True, direct_only=False,
              steps=steps, alpha_rounds=r._alpha_rounds)
    rng = np.random.default_rng(7)

    def run(state):
        seeds = jnp.asarray(rng.integers(0, 2**32, steps, dtype=np.uint32))
        offs = jnp.asarray(rng.random((steps, 2), np.float32))
        return integ.render_steps(r.scene, state, seeds, offs,
                                  jnp.asarray(c2w), jnp.asarray(s2c), **kw)

    state = integ.init_state(width, height)
    state = run(state)
    jax.block_until_ready(state.count)

    outdir = "/tmp/glaze_xplane"
    os.system(f"rm -rf {outdir}")
    jax.profiler.start_trace(outdir)
    state = run(state)
    jax.block_until_ready(state.count)
    jax.profiler.stop_trace()

    # parse the xplane: exclusive times per op line on the device planes
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(f"{outdir}/**/*.xplane.pb", recursive=True)
    spaces = xplane_pb2.XSpace()
    spaces.ParseFromString(open(files[0], "rb").read())
    totals = {}
    line_totals = {}
    for plane in spaces.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            line_totals[line.name] = line_totals.get(line.name, 0) + sum(
                e.duration_ps for e in line.events)
            # async-activity lines (copy/slice spans cover their whole
            # start->done window, not cost) would dwarf real compute
            if "async" in line.name.lower() or "copy" in line.name.lower():
                continue
            # module-level events duplicate the op events (separate line)
            if "module" in line.name.lower():
                continue
            evs = sorted(line.events, key=lambda e: e.offset_ps)
            # exclusive time via an interval stack
            stack = []
            for e in evs:
                start, end = e.offset_ps, e.offset_ps + e.duration_ps
                name = ev_meta[e.metadata_id].name
                while stack and stack[-1][1] <= start:
                    stack.pop()
                if stack:
                    pname = stack[-1][2]
                    totals[pname] = totals.get(pname, 0) - e.duration_ps
                totals[name] = totals.get(name, 0) + e.duration_ps
                stack.append((start, end, name))
    print("line totals (inclusive, ms/launch):")
    for name, ps in sorted(line_totals.items(), key=lambda kv: -kv[1])[:12]:
        print(f"  {ps / 1e9 / steps:9.2f} ms  {name[:80]}")
    import re as _re
    cats = {}
    for name, ps in totals.items():
        if ps <= 0:
            continue
        m = _re.search(r"= ([a-z0-9\[\],]+)[^(]*\(([a-z0-9\[\],]+)", name)
        key = f"{m.group(1)} <- {m.group(2)}" if m else name[:60]
        cats[key] = cats.get(key, 0) + ps
    print("by shape signature (ms/launch):")
    for k, ps in sorted(cats.items(), key=lambda kv: -kv[1])[:18]:
        print(f"  {ps / 1e9 / steps:9.2f} ms  {k[:100]}")
    total = sum(v for v in totals.values() if v > 0)
    print(f"total device time {total / 1e9:.1f} ms over {steps} launches")
    ranked = [kv for kv in sorted(totals.items(), key=lambda kv: -kv[1])
              if kv[1] > 0]
    for name, ps in ranked[:24]:
        print(f"  {ps / 1e9 / steps:9.2f} ms/launch  {100 * ps / total:5.1f}%"
              f"  {name[:90]}")
    if len(ranked) > 24:
        tail = sum(ps for _, ps in ranked[24:])
        print(f"  {tail / 1e9 / steps:9.2f} ms/launch  "
              f"{100 * tail / total:5.1f}%"
              f"  <{len(ranked) - 24} ops below the top 24>")


if __name__ == "__main__":
    main()
