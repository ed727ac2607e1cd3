"""Runtime utilities: compilation cache, profiling, debug modes."""

from glaze_tpu.utils.runtime import (
    Timer,
    enable_compilation_cache,
    profiler_trace,
    setup_debug_modes,
)

__all__ = [
    "Timer",
    "enable_compilation_cache",
    "profiler_trace",
    "setup_debug_modes",
]
