import os
import sys

# Multi-device CPU mesh for sharding tests; must be set before JAX backend
# initialization. NOTE: this image force-registers the TPU ("axon") PJRT
# plugin via sitecustomize and overwrites JAX_PLATFORMS, so the env var
# alone is not enough — jax.config.update below reclaims the CPU backend.
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

# Isolate the BVH build-product disk cache: tests must exercise the real
# builders, not whatever a previous run left in ~/.cache.
os.environ["GLAZE_CACHE_DIR"] = "0"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# The persistent XLA cache aborts the process on corrupt/racy entries
# (Fatal Python error inside compilation_cache reads — observed twice in
# full-suite runs; app/cli tests enable the cache dir via their mains).
# Tests pay the recompiles instead of risking a mid-suite hard abort.
try:
    jax.config.update("jax_enable_compilation_cache", False)
except Exception:
    pass

import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference/resources"

# XLA:CPU's compiler has been observed to SEGFAULT compiling a large
# render_steps graph late in long suite runs (reproduced with nothing
# else on the machine; the same test passes standalone, so the trigger
# is accumulated in-process compiler/executable state, not the graph).
# Dropping every cached executable periodically keeps the process state
# small; the handful of re-compiles costs far less than a dead suite.
_CLEAR_EVERY = int(os.environ.get("GLAZE_TEST_CLEAR_EVERY", "40"))
_test_counter = {"n": 0}


@pytest.fixture(autouse=True)
def _periodic_jax_cache_clear():
    yield
    _test_counter["n"] += 1
    if _CLEAR_EVERY > 0 and _test_counter["n"] % _CLEAR_EVERY == 0:
        jax.clear_caches()


@pytest.fixture
def mattest_path():
    path = os.path.join(REFERENCE_DIR, "mattest.glaze")
    if not os.path.exists(path):
        pytest.skip("mattest.glaze not available")
    return path
