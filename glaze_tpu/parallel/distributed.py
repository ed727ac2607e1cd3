"""Multi-host distributed rendering (the communication backend the
reference never had — SURVEY 2.8 / §5 "distributed communication backend").

Topology: ``jax.distributed`` brings up the DCN-coordinated multi-host
runtime; the render mesh then spans every chip of every host and the
existing pixel-axis (or sample-axis) sharding from
:mod:`glaze_tpu.parallel.mesh` partitions the launch across the pod —
traversal and shading are embarrassingly parallel, so the only cross-chip
traffic is the accumulation reduce/gather at display time, which XLA
routes over ICI within a slice and DCN across slices.

Usage (one process per host, e.g. under a pod launcher)::

    from glaze_tpu.parallel import distributed
    distributed.init()                       # env-driven (TPU pods)
    # or explicitly:
    distributed.init(coordinator="host0:9876", num_processes=4,
                     process_id=rank)
    mesh = make_mesh()                       # now spans the whole pod
"""

from __future__ import annotations

import os


_initialized = False


def init(coordinator: str | None = None, num_processes: int | None = None,
         process_id: int | None = None) -> bool:
    """Initializes ``jax.distributed`` for multi-host meshes (idempotent).

    With no arguments, relies on the TPU pod metadata / cluster env vars
    jax.distributed auto-detects. Returns True when a multi-process
    runtime is active after the call, False for single-process runs
    (safe no-op: a lone process renders exactly as before).
    """
    global _initialized
    import jax

    if _initialized:
        return jax.process_count() > 1
    explicit = coordinator is not None
    env_driven = any(
        v in os.environ
        for v in ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
                  "MEGASCALE_COORDINATOR_ADDRESS")
    )
    if not explicit and not env_driven:
        return False  # single host, nothing to initialize
    from jax._src import xla_bridge

    if xla_bridge.backends_are_initialized():
        # too late to join a cluster in this process; render single-host
        import warnings

        warnings.warn("distributed.init() called after JAX backend "
                      "initialization; continuing single-host")
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    return jax.process_count() > 1


def local_pixel_slice(width: int, height: int):
    """This process's contiguous slice of the (padded, tile-swizzled)
    pixel axis — hosts feed only their addressable shard of the state
    (jax.make_array_from_single_device_arrays workflows)."""
    import jax

    from glaze_tpu.render import integrator as integ

    p = integ.pixel_count(width, height)
    n = jax.process_count()
    i = jax.process_index()
    per = p // n
    return slice(i * per, (i + 1) * per if i < n - 1 else p)
