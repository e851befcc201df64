from genie2_tpu.parallel.mesh import (
    batch_sharding,
    constrain,
    create_mesh,
    data_axis_size,
    mesh_from_arg,
    pair_sharding,
    replicate,
    replicated,
    shard_batch,
)
from genie2_tpu.parallel.tensor_parallel import (
    create_tp_mesh,
    place_params,
    place_train_state,
    tp_shardings,
    tp_spec,
    tp_stats,
)

__all__ = [
    "batch_sharding",
    "constrain",
    "pair_sharding",
    "create_mesh",
    "create_tp_mesh",
    "data_axis_size",
    "mesh_from_arg",
    "place_params",
    "place_train_state",
    "replicate",
    "replicated",
    "shard_batch",
    "tp_shardings",
    "tp_spec",
    "tp_stats",
]
