from genie2_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    mesh_from_arg,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "create_mesh",
    "mesh_from_arg",
    "replicate",
    "replicated",
    "shard_batch",
]
