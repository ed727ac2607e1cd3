"""glaze-cli: offline renderer (port of /root/reference/cli/src/main.rs).

Same flags and defaults: input scene, output image (.png/.jpg),
``--res WxH`` (1920x1080), ``--spp`` (256), ``--integrator {direct,pt}``.

Usage: ``python -m glaze_tpu.cli scene.glaze out.png --res 512x512 --spp 64``
"""

from __future__ import annotations

import argparse
import sys
import time


def parse_resolution(s: str):
    try:
        w, h = s.lower().split("x")
        return int(w), int(h)
    except ValueError as e:
        raise argparse.ArgumentTypeError(f"bad resolution {s!r}, expected WxH") from e


def build_parser():
    p = argparse.ArgumentParser(
        prog="glaze-cli",
        description="Renders a .glaze scene to an image (TPU-native glaze).",
    )
    p.add_argument("input", help="input .glaze scene")
    p.add_argument("output", help="output image (.png/.jpg)")
    p.add_argument(
        "-r", "--res", "--resolution",
        type=parse_resolution, default=(1920, 1080), dest="res",
        help="resolution WxH (default 1920x1080)",
    )
    p.add_argument(
        "-s", "--spp", type=int, default=256, help="samples per pixel (default 256)"
    )
    p.add_argument(
        "-i", "--integrator", choices=("direct", "pt"), default="pt",
        help="integrator (default pt)",
    )
    p.add_argument("--seed", type=int, default=None, help="deterministic RNG seed")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from glaze_tpu.parser import parse
    from glaze_tpu.render.renderer import Integrator, RayTraceRenderer
    from glaze_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    t0 = time.time()
    parsed = parse(args.input)
    width, height = args.res
    integrator = Integrator.DIRECT if args.integrator == "direct" else Integrator.PATH_TRACE
    renderer = RayTraceRenderer(
        parsed, width=width, height=height, integrator=integrator, seed=args.seed
    )
    setup_ms = (time.time() - t0) * 1000.0
    print(f"Setup time: {setup_ms:.0f}ms", file=sys.stderr)

    total = args.spp * integrator.steps_per_sample
    t0 = time.time()

    def progress(done):
        pct = 100.0 * done / total
        print(f"\rRendering... {pct:5.1f}%", end="", file=sys.stderr, flush=True)

    renderer.draw(args.spp, progress)
    print(file=sys.stderr)
    render_ms = (time.time() - t0) * 1000.0
    rays = width * height * total
    print(
        f"Render time: {render_ms:.0f}ms "
        f"({rays / max(render_ms, 1e-9) / 1e3:.1f} Mrays/s)",
        file=sys.stderr,
    )
    renderer.save(args.output)
    print(f"Saved {args.output}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
