from genie2_tpu.parallel.mesh import (
    batch_sharding,
    constrain,
    create_mesh,
    mesh_from_arg,
    pair_sharding,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "constrain",
    "pair_sharding",
    "create_mesh",
    "mesh_from_arg",
    "replicate",
    "replicated",
    "shard_batch",
]
