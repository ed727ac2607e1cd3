"""Runtime helpers.

The reference's startup cost is SPIR-V compilation at build time; ours is
XLA compilation at run time. The persistent compilation cache makes repeat
CLI invocations skip it (the equivalent of shipping prebuilt .spv).
"""

from __future__ import annotations

import os
import time


def enable_compilation_cache(path: str | None = None):
    """Enables JAX's persistent compilation cache (idempotent).

    GLAZE_XLA_CACHE overrides the location; "0" disables entirely. The
    cache CORRUPTS under concurrent writers (observed: hard aborts
    inside compilation_cache reads after bench + pytest ran in
    parallel) — point concurrent jobs at distinct directories."""
    import jax

    env = os.environ.get("GLAZE_XLA_CACHE")
    if env == "0":
        return
    if path is None and env:
        path = env
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


def setup_debug_modes(force: bool | None = None) -> bool:
    """The reference's validation layers (debug.rs:83-165), TPU-style:
    with ``GLAZE_DEBUG=1`` (or ``force=True``) every jit checks for NaNs
    (jax_debug_nans re-runs the offending op un-jitted and points at it)
    and JAX's internal invariant checks are on. Returns whether enabled.

    The reference auto-enables validation in debug builds with a
    FORCE_VALIDATIONS escape hatch; Python has no debug build, so the env
    var is the hatch."""
    import jax

    enabled = (os.environ.get("GLAZE_DEBUG", "") not in ("", "0")
               if force is None else force)
    if enabled:
        jax.config.update("jax_debug_nans", True)
        jax.config.update("jax_enable_checks", True)
    return enabled


class profiler_trace:
    """Context manager: dumps a jax.profiler trace (xplane) to ``path``
    when ``enabled`` — the xprof/tensorboard-compatible analogue of GPU
    timestamps the reference never had (SURVEY §5 tracing row)."""

    def __init__(self, path: str, enabled: bool = True):
        self.path = path
        self.enabled = enabled

    def __enter__(self):
        if self.enabled:
            import jax

            os.makedirs(self.path, exist_ok=True)
            jax.profiler.start_trace(self.path)
        return self

    def __exit__(self, *exc):
        if self.enabled:
            import jax

            jax.profiler.stop_trace()
        return False


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
