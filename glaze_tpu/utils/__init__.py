"""Runtime utilities: compilation cache, profiling, debug modes, logging."""

from glaze_tpu.utils.log import get_logger, init as init_logging
from glaze_tpu.utils.runtime import (
    Timer,
    enable_compilation_cache,
    profiler_trace,
    setup_debug_modes,
)

__all__ = [
    "Timer",
    "get_logger",
    "init_logging",
    "enable_compilation_cache",
    "profiler_trace",
    "setup_debug_modes",
]
