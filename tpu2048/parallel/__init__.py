"""Distributed/parallel layer (SURVEY.md §2b): mesh, shardings, multi-host."""

from tpu2048.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    MeshConfig,
    create_mesh,
    data_sharding,
    distributed_init,
    dqn_loop_sharding,
    is_primary_host,
    param_partition_spec,
    place_loop_state,
    replicated,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "MeshConfig",
    "create_mesh",
    "data_sharding",
    "distributed_init",
    "dqn_loop_sharding",
    "is_primary_host",
    "param_partition_spec",
    "place_loop_state",
    "replicated",
]
