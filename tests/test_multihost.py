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
