"""Real multi-process distributed rendering (tools/multihost_cpu_demo.py):
2 processes x 2 CPU devices, jax.distributed + Gloo collectives, pixel-
sharded render must bit-match single-device. This covers what the
in-process 8-device dryrun cannot: the cross-process runtime path of
parallel/distributed.py (the DCN analogue)."""

import os
import subprocess
import sys


def test_two_process_render_matches_single(tmp_path):
    env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu",
               GLAZE_DEMO_PORT="52733")
    env.pop("GLAZE_DEMO_RANK", None)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "multihost_cpu_demo.py")],
        env=env, capture_output=True, text=True, timeout=540)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "multihost demo OK" in r.stdout


def test_four_process_render_and_checkpoint(tmp_path):
    """4 processes x 2 devices (the v4/v5 4-host pod-slice shape) +
    the pod checkpoint flow: gather -> rank-0 atomic save -> all-rank
    reload -> re-shard -> continue, matching single-device."""
    ckpt = str(tmp_path / "pod_ckpt.npz")
    env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu",
               GLAZE_DEMO_PORT="52737", GLAZE_DEMO_NPROC="4",
               GLAZE_DEMO_LOCDEV="2", GLAZE_DEMO_CKPT=ckpt)
    env.pop("GLAZE_DEMO_RANK", None)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "multihost_cpu_demo.py")],
        env=env, capture_output=True, text=True, timeout=540)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "multihost demo OK: 4 processes" in r.stdout
    assert "checkpoint resume parity OK" in r.stdout


def test_imports_do_not_initialize_backend():
    """jax.distributed.initialize() must be callable after importing the
    whole framework — module-level jnp constants would commit device
    buffers at import and break multi-host init ordering (regression
    guard for the ops/rng + ops/spectra fix)."""
    import subprocess
    import sys

    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from jax._src import xla_bridge\n"
        "import glaze_tpu\n"
        "from glaze_tpu.parallel import distributed, mesh\n"
        "import glaze_tpu.render.integrator\n"
        "import glaze_tpu.render.realtime\n"
        "import glaze_tpu.render.preview\n"
        "import glaze_tpu.converter\n"
        "assert not xla_bridge.backends_are_initialized(), \\\n"
        "    'an import committed device buffers'\n"
        "print('import-pure')\n"
    )
    env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run([sys.executable, "-c", code], env=env, cwd=root,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0 and "import-pure" in r.stdout, (
        r.stdout[-1000:] + r.stderr[-1000:])
