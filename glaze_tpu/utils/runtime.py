"""Runtime helpers.

The reference's startup cost is SPIR-V compilation at build time; ours is
XLA compilation at run time. The persistent compilation cache makes repeat
CLI invocations skip it (the equivalent of shipping prebuilt .spv).
"""

from __future__ import annotations

import os
import time


def enable_compilation_cache(path: str | None = None):
    """Enables JAX's persistent compilation cache (idempotent)."""
    import jax

    if path is None:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
        # fall back to a temp dir if the repo dir is read-only
        try:
            os.makedirs(path, exist_ok=True)
        except OSError:
            import tempfile

            path = os.path.join(tempfile.gettempdir(), "glaze_tpu_jax_cache")
            os.makedirs(path, exist_ok=True)
    else:
        os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these flags


class Timer:
    """Wall-clock phase timer (the CLI's setup/render ms reporting,
    cli/src/main.rs:96-120)."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.marks = {}

    def mark(self, name: str):
        now = time.perf_counter()
        self.marks[name] = now - self.t0
        self.t0 = now
        return self.marks[name]
