"""Runtime utilities: compilation cache, profiling, logging."""

from glaze_tpu.utils.runtime import enable_compilation_cache, Timer

__all__ = ["enable_compilation_cache", "Timer"]
