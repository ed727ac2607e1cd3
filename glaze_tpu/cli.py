"""glaze-cli: offline renderer (port of /root/reference/cli/src/main.rs).

Same flags and defaults: input scene, output image (.png/.jpg),
``--res WxH`` (1920x1080), ``--spp`` (256), ``--integrator {direct,pt}``.

Usage: ``python -m glaze_tpu.cli scene.glaze out.png --res 512x512 --spp 64``
"""

from __future__ import annotations

import argparse
import os
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
    p.add_argument(
        "--mesh", action="store_true",
        help="shard the render over ALL visible devices (pixel-axis "
             "mesh, collective-free; parity with the single-device path "
             "at n=1, linear scaling beyond — docs/PERF_LOG.md)",
    )
    p.add_argument(
        "--checkpoint", metavar="PATH",
        help="progressive-state checkpoint (.npz): resume from PATH if it "
             "exists, save every --checkpoint-every samples and on Ctrl-C "
             "(bit-exact resume; the reference restarts from scratch)",
    )
    p.add_argument(
        "--checkpoint-every", type=int, default=32, metavar="SPP",
        help="samples between checkpoint saves (default 32)",
    )
    p.add_argument(
        "--sif", type=int, default=None, metavar="N",
        help="samples in flight per pixel (default env GLAZE_SIF or 1): "
             "N independent path states advance per launch — a denser "
             "sorted wavefront traces faster per ray on incoherent "
             "bounces, at N x launch memory (docs/PERF_LOG.md)",
    )
    p.add_argument(
        "--coherent", nargs="?", const="frame", default=None,
        choices=("off", "frame", "tile"), metavar="off|frame|tile",
        help="coherent sampling: pixels share RNG chains (frame-wide, or "
             "per 2048-ray packet tile), so bounce/NEE directions are "
             "spatially coherent and trace ~2.4x faster. Per-pixel "
             "estimates stay unbiased with unchanged per-pixel variance "
             "(multi-scene equal-spp gate: tests/test_coherent_quality); "
             "per-sample noise is blotchy instead of high-frequency, "
             "which converges away with spp. DEFAULT: frame (the "
             "shipped configuration); --coherent off restores fully "
             "independent per-pixel chains",
    )
    p.add_argument(
        "--sampler", choices=("pcg", "ld"), default=None,
        help="sub-pixel sampler: pcg = the reference's hash chain (the "
             "DEFAULT — the r5 multi-seed A/B shows no ld separation "
             "under the shipped coherent mode); ld = per-pixel "
             "Owen-scrambled Sobol (stratified path decisions — wins "
             "~1.2x with --coherent off). Env GLAZE_SAMPLER overrides",
    )
    p.add_argument(
        "--adaptive", choices=("on", "off"), default=None,
        help="per-tile adaptive stopping: display-converged tiles stop "
             "sampling so wall time concentrates on the noisy ones "
             "(per-pixel estimates unchanged). Default off (no measured "
             "time-to-quality win on the staged scenes, docs/PERF_LOG.md "
             "round 5); the reference refines uniformly",
    )
    p.add_argument(
        "--denoise", action="store_true",
        help="apply the edge-aware SVGF-style reconstruction filter to "
             "the SAVED image (render/denoise.py; display-time only — "
             "the accumulation itself stays unbiased, and the filter "
             "fades to identity as spp grows)",
    )
    p.add_argument(
        "--profile", nargs="?", const="glaze_profile", default=None,
        metavar="DIR",
        help="dump a jax.profiler trace (xprof/tensorboard xplane) of the "
             "render to DIR and print per-phase wall-clock",
    )
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from glaze_tpu.parser import parse
    from glaze_tpu.render.renderer import Integrator, RayTraceRenderer
    from glaze_tpu.utils import (
        Timer,
        enable_compilation_cache,
        init_logging,
        profiler_trace,
        setup_debug_modes,
    )

    init_logging()
    enable_compilation_cache()
    if setup_debug_modes():
        print("GLAZE_DEBUG: NaN checks + runtime validation on",
              file=sys.stderr)

    timer = Timer()
    from glaze_tpu.converter import ensure_glaze

    parsed = parse(ensure_glaze(args.input))
    timer.mark("parse")
    width, height = args.res
    integrator = Integrator.DIRECT if args.integrator == "direct" else Integrator.PATH_TRACE
    renderer = RayTraceRenderer(
        parsed, width=width, height=height, integrator=integrator,
        seed=args.seed, samples_in_flight=args.sif,
        mesh="auto" if args.mesh else None,
        coherent=args.coherent,  # None -> shipped default ('frame')
        sampler=args.sampler,  # None -> env GLAZE_SAMPLER or 'pcg'
        adaptive=(None if args.adaptive is None
                  else args.adaptive == "on"),
    )
    timer.mark("upload+bvh")
    setup_ms = (timer.marks["parse"] + timer.marks["upload+bvh"]) * 1000.0
    print(f"Setup time: {setup_ms:.0f}ms", file=sys.stderr)

    done_spp = 0
    scene_id = ""
    if args.checkpoint:
        import hashlib

        with open(ensure_glaze(args.input), "rb") as f:
            scene_id = hashlib.sha256(f.read()).hexdigest()
    if args.checkpoint and os.path.exists(args.checkpoint):
        try:
            renderer.load_checkpoint(args.checkpoint, scene_id=scene_id)
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        # the checkpoint's resolution/integrator/sif win over the flags
        # (load_checkpoint already adopted them) — resync the locals so
        # progress and Mrays math follow the render that actually runs
        if (renderer.integrator is not integrator
                or (renderer.width, renderer.height) != (width, height)):
            print(f"Resume overrides flags: {renderer.width}x"
                  f"{renderer.height} {renderer.integrator.name_str}",
                  file=sys.stderr)
        integrator = renderer.integrator
        width, height = renderer.width, renderer.height
        done_spp = min(renderer.completed_spp, args.spp)
        print(f"Resumed {args.checkpoint}: {done_spp} spp done",
              file=sys.stderr)

    # the progress callback counts LAUNCHES; each launch advances
    # samples_in_flight path states per pixel
    def launches(spp):
        return -(-spp * integrator.steps_per_sample
                 // renderer.samples_in_flight)

    total = launches(args.spp)
    base = launches(done_spp)
    t0 = time.time()

    def progress(done):
        pct = min(100.0, 100.0 * (base + done) / total)
        print(f"\rRendering... {pct:5.1f}%", end="", file=sys.stderr, flush=True)

    def save_checkpoint():
        # atomic: np.savez appends .npz to extensionless tmp names, so
        # keep the suffix and rename over the target
        tmp = args.checkpoint + ".tmp.npz"
        renderer.save_checkpoint(tmp, scene_id=scene_id)
        os.replace(tmp, args.checkpoint)

    with profiler_trace(args.profile or "", enabled=args.profile is not None):
        remaining = args.spp - done_spp
        step = args.checkpoint_every if args.checkpoint else remaining
        # align chunks to whole sif groups: draw(n) runs
        # ceil(n*steps/sif) launches, so a chunk size that is not a sif
        # multiple makes per-chunk ceils sum past launches(spp)
        sif = renderer.samples_in_flight
        step = -(-max(step, 1) // sif) * sif
        try:
            while remaining > 0:
                n = min(step, remaining)
                renderer.draw(n, progress)
                remaining -= n
                base = launches(args.spp - remaining)
                if args.checkpoint and remaining > 0:
                    save_checkpoint()
        except KeyboardInterrupt:
            if args.checkpoint:
                save_checkpoint()
                print(f"\nInterrupted: checkpoint saved to "
                      f"{args.checkpoint}", file=sys.stderr)
                return 130
            raise
        if args.checkpoint:
            save_checkpoint()
    timer.mark("render")
    print(file=sys.stderr)
    render_ms = timer.marks["render"] * 1000.0
    # rays traced THIS run: launches drawn x sif states/pixel/launch
    rays = (width * height * renderer.samples_in_flight
            * (total - launches(done_spp)))
    print(
        f"Render time: {render_ms:.0f}ms "
        f"({rays / max(render_ms, 1e-9) / 1e3:.1f} Mrays/s)",
        file=sys.stderr,
    )
    # display-time only: the accumulation (and any checkpoint) is saved
    # raw; the filter is applied once, to the written image.
    renderer.denoise = args.denoise
    renderer.save(args.output)
    timer.mark("save")
    if args.profile is not None:
        phases = "  ".join(
            f"{k}={v * 1e3:.0f}ms" for k, v in timer.marks.items()
        )
        print(f"Phases: {phases}", file=sys.stderr)
        print(f"Profile trace written to {args.profile}/", file=sys.stderr)
    print(f"Saved {args.output}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
