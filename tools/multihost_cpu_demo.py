"""Multi-process multi-host render demo on CPU devices.

Proves the jax.distributed path (parallel/distributed.py) actually
executes a sharded render across PROCESSES — stronger evidence than the
single-process 8-device dryrun, since cross-process collectives ride the
real distributed runtime (the DCN analogue).

Run (spawns its own sibling processes):
    JAX_PLATFORMS=cpu python tools/multihost_cpu_demo.py

GLAZE_DEMO_NPROC processes (default 2) each host GLAZE_DEMO_LOCDEV CPU
devices (default 2); the global mesh spans their product; the
pixel-sharded render must bit-match the single-process render of the
same scene. The demo also exercises the pod checkpoint flow: the
sharded state is gathered, saved by process 0, reloaded, re-sharded,
and advanced — matching the single-device continuation.
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PORT = int(os.environ.get("GLAZE_DEMO_PORT", "52431"))
NPROC = int(os.environ.get("GLAZE_DEMO_NPROC", "2"))
LOCAL_DEVICES = int(os.environ.get("GLAZE_DEMO_LOCDEV", "2"))


def worker(rank: int) -> None:
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={LOCAL_DEVICES}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    from glaze_tpu.parallel import distributed

    ok = distributed.init(coordinator=f"127.0.0.1:{PORT}",
                          num_processes=NPROC, process_id=rank)
    assert ok, "distributed.init did not bring up a multi-process runtime"
    assert jax.process_count() == NPROC
    assert len(jax.devices()) == NPROC * LOCAL_DEVICES

    import numpy as np
    import jax.numpy as jnp

    import __graft_entry__ as graft
    from glaze_tpu.parallel import mesh as pmesh
    from glaze_tpu.render import integrator as integ

    w = h = 32
    scene, camera = graft._tiny_scene(w, h)
    c2w, s2c = integ.camera_matrices(camera, w, h)
    seeds = jnp.asarray(np.asarray([3, 5], np.uint32))
    offs = jnp.asarray(np.full((2, 2), 0.5, np.float32))
    kw = dict(width=w, height=h, is_persp=True, direct_only=False, steps=2)

    # single-device reference (local, no sharding)
    ref = integ.render_steps(scene, integ.init_state(w, h), seeds, offs,
                             jnp.asarray(c2w), jnp.asarray(s2c), **kw)
    ref_accum = np.asarray(jax.device_get(ref.accum[0]))

    # global pixel-sharded render over the 2-process mesh
    m = pmesh.make_mesh()
    assert m.devices.size == NPROC * LOCAL_DEVICES
    scene_sh = pmesh.place_replicated(scene, m)
    st = pmesh.render_steps_sharded(scene_sh, integ.init_state(w, h),
                                    seeds, offs, jnp.asarray(c2w),
                                    jnp.asarray(s2c), m, **kw)
    # gather the globally-sharded accumulator to every host
    from jax.experimental import multihost_utils

    got = np.asarray(multihost_utils.process_allgather(
        st.accum[0], tiled=True))
    np.testing.assert_allclose(got, ref_accum, rtol=1e-5, atol=1e-6)

    # pod checkpoint flow (docs/POD_RUNBOOK.md): gather the sharded
    # state to every host, process 0 writes the checkpoint, all
    # processes reload it, re-shard, and advance one more window — the
    # continuation must match the single-device continuation.
    ckpt = os.environ.get("GLAZE_DEMO_CKPT", "")
    if ckpt:
        leaves, treedef = jax.tree.flatten(st)
        gathered = [np.asarray(multihost_utils.process_allgather(
            x, tiled=True)) for x in leaves]
        if rank == 0:
            np.savez(ckpt + ".tmp.npz",
                     **{f"leaf_{i}": g for i, g in enumerate(gathered)})
            os.replace(ckpt + ".tmp.npz", ckpt)  # atomic, cli.py parity
        multihost_utils.sync_global_devices("ckpt written")
        z = np.load(ckpt)
        restored = jax.tree.unflatten(
            treedef, [jnp.asarray(z[f"leaf_{i}"])
                      for i in range(len(gathered))])
        seeds2 = jnp.asarray(np.asarray([11, 13], np.uint32))
        st2 = pmesh.render_steps_sharded(scene_sh, restored, seeds2, offs,
                                         jnp.asarray(c2w),
                                         jnp.asarray(s2c), m, **kw)
        ref2 = integ.render_steps(scene, ref, seeds2, offs,
                                  jnp.asarray(c2w), jnp.asarray(s2c), **kw)
        got2 = np.asarray(multihost_utils.process_allgather(
            st2.accum[0], tiled=True))
        np.testing.assert_allclose(
            got2, np.asarray(jax.device_get(ref2.accum[0])),
            rtol=1e-5, atol=1e-6)

    if rank == 0:
        print(f"multihost demo OK: {NPROC} processes x {LOCAL_DEVICES} "
              f"devices, sharded == single-device (max|d|="
              f"{np.abs(got - ref_accum).max():.2e})"
              + (", checkpoint resume parity OK" if ckpt else ""))


def main():
    if "GLAZE_DEMO_RANK" in os.environ:
        worker(int(os.environ["GLAZE_DEMO_RANK"]))
        return
    procs = []
    for rank in range(NPROC):
        env = dict(os.environ, GLAZE_DEMO_RANK=str(rank), PYTHONPATH="",
                   JAX_PLATFORMS="cpu")
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env,
            stdout=None if rank == 0 else subprocess.DEVNULL,
            stderr=subprocess.STDOUT if rank == 0 else subprocess.DEVNULL))
    # If one worker dies early, its sibling would block forever inside
    # a collective — poll and kill the survivors instead of leaking them.
    import time

    deadline = time.monotonic() + 540
    rcs = [None] * NPROC
    try:
        while time.monotonic() < deadline:
            for i, p in enumerate(procs):
                rcs[i] = p.poll()
            live = [r is None for r in rcs]
            if not any(live):
                break
            if any(r not in (None, 0) for r in rcs):
                break  # a worker failed; stop waiting for the rest
            time.sleep(0.5)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait(timeout=30)
    rcs = [p.poll() for p in procs]
    if any(rcs):
        raise SystemExit(f"worker exit codes: {rcs}")


if __name__ == "__main__":
    main()
