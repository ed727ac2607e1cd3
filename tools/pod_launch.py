"""Multi-host pod launcher: glaze-cli semantics across a TPU pod slice.

Run ONE copy per host (see docs/POD_RUNBOOK.md):

    python tools/pod_launch.py scene.glaze out.png --res 1920x1080 \
        --spp 256 [--coordinator HOST:PORT --num-processes N \
        --process-id RANK] [--checkpoint pod.npz --ckpt-every 32]

Every process runs the SAME program with the SAME seeds (multi-controller
SPMD); the pixel axis shards over the global mesh, the hot loop is
collective-free (parallel/mesh.py), and the only cross-host traffic is
the checkpoint/output gather. CPU rehearsal of the identical flow:
tools/multihost_cpu_demo.py (exercised by tests/test_multihost.py).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _gathered_state(state):
    """Globally-sharded PathState -> fully-local copy on every host."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    leaves, treedef = jax.tree.flatten(state)
    out = []
    for x in leaves:
        if getattr(x, "is_fully_addressable", True):
            out.append(jnp.asarray(x))
        else:
            out.append(jnp.asarray(
                multihost_utils.process_allgather(x, tiled=True)))
    return jax.tree.unflatten(treedef, out)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--res", default="1920x1080")
    ap.add_argument("--spp", type=int, default=256)
    ap.add_argument("--integrator", choices=("direct", "pt"), default="pt")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--coordinator", default=None,
                    help="coordinator host:port (omit on Cloud TPU pods "
                         "— auto-detected from the metadata env)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--checkpoint", default=None,
                    help="gathered-state checkpoint path (.npz); resumes "
                         "if it exists")
    ap.add_argument("--ckpt-every", type=int, default=32,
                    help="samples between checkpoint saves (default 32)")
    args = ap.parse_args(argv)

    from glaze_tpu.parallel import distributed
    from glaze_tpu.utils import log as glog

    glog.init()
    distributed.init(args.coordinator, args.num_processes, args.process_id)

    import jax
    import numpy as np

    rank = jax.process_index()
    n_proc = jax.process_count()
    if rank == 0:
        print(f"pod_launch: {n_proc} processes, "
              f"{len(jax.devices())} global devices", file=sys.stderr)

    from glaze_tpu.converter import ensure_glaze
    from glaze_tpu.parallel import mesh as pmesh
    from glaze_tpu.parser import parse
    from glaze_tpu.render.renderer import Integrator, RayTraceRenderer

    w, h = (int(v) for v in args.res.split("x"))
    t0 = time.perf_counter()
    parsed = parse(ensure_glaze(args.input))
    integrator = (Integrator.DIRECT if args.integrator == "direct"
                  else Integrator.PATH_TRACE)
    m = pmesh.make_mesh()
    r = RayTraceRenderer(parsed, width=w, height=h, integrator=integrator,
                         seed=args.seed, mesh=m)
    if rank == 0:
        print(f"setup {time.perf_counter() - t0:.1f}s "
              f"(mesh {int(m.devices.size)} devices)", file=sys.stderr)

    done = 0
    if args.checkpoint and os.path.exists(args.checkpoint):
        r.load_checkpoint(args.checkpoint)
        done = r.completed_spp
        if rank == 0:
            print(f"resumed {args.checkpoint}: {done} spp done",
                  file=sys.stderr)

    def save_ckpt():
        if not args.checkpoint:
            return
        local = _gathered_state(r._state)      # all ranks participate
        orig, r._state = r._state, local
        try:
            if rank == 0:
                tmp = args.checkpoint + ".tmp.npz"
                r.save_checkpoint(tmp)
                os.replace(tmp, args.checkpoint)  # atomic (cli.py parity)
        finally:
            r._state = orig
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("pod ckpt")

    remaining = args.spp - done
    step = args.ckpt_every if args.checkpoint else max(remaining, 1)
    try:
        while remaining > 0:
            n = min(step, remaining)
            t0 = time.perf_counter()
            r.draw(n, return_image=False)
            remaining -= n
            done += n
            if rank == 0:
                dt = time.perf_counter() - t0
                print(f"{done}/{args.spp} spp  ({n / dt:.2f} spp/s)",
                      file=sys.stderr)
            if remaining > 0:
                save_ckpt()
    except KeyboardInterrupt:
        save_ckpt()
        if rank == 0:
            print(f"interrupted at {done} spp — checkpoint saved",
                  file=sys.stderr)
        raise SystemExit(130)

    save_ckpt()
    local = _gathered_state(r._state)
    orig, r._state = r._state, local
    if rank == 0:
        from PIL import Image

        Image.fromarray(r.get_image()).save(args.output)
        print(f"saved {args.output}", file=sys.stderr)
    r._state = orig


if __name__ == "__main__":
    main()
