"""Multi-chip execution over a jax.sharding.Mesh (single- and
multi-host; see :mod:`glaze_tpu.parallel.distributed`)."""

from glaze_tpu.parallel import distributed
from glaze_tpu.parallel.mesh import (
    init_state_spp,
    make_mesh,
    make_mesh_2d,
    reduce_spp,
    render_steps_2d_sharded,
    render_steps_sharded,
    render_steps_spp_sharded,
    shard_state,
    unshard_state,
)

__all__ = [
    "distributed",
    "init_state_spp",
    "make_mesh",
    "make_mesh_2d",
    "reduce_spp",
    "render_steps_2d_sharded",
    "render_steps_sharded",
    "render_steps_spp_sharded",
    "shard_state",
    "unshard_state",
]
