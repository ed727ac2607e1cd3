"""Multi-chip execution over a jax.sharding.Mesh."""

from glaze_tpu.parallel.mesh import (
    make_mesh,
    render_steps_sharded,
    shard_state,
    unshard_state,
)

__all__ = ["make_mesh", "render_steps_sharded", "shard_state", "unshard_state"]
