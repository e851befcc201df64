"""Device mesh and sharding layer.

The reference's entire distribution story is Lightning DDP (NCCL gradient
all-reduce, train.py:54-65) for training and one-OS-process-per-GPU task
fan-out for sampling (multiprocessor.py:59-100). Here both collapse into a
single jax.sharding.Mesh:

  * training: batch leaves sharded over the 'data' axis, params replicated;
    XLA emits the gradient all-reduce (psum) over ICI.
  * sampling: the (length-bucketed) sample batch is sharded over 'data',
    replacing the process fan-out entirely.

The mesh is 1-D today because the flagship model is ~15.7M params (DP is
the honest strategy at this scale); pair-tensor sequence sharding can be
added as a second axis without changing callers.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_data: int = -1, devices: Optional[Sequence] = None) -> Mesh:
    """A 1-D data-parallel mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data == -1:
        n_data = len(devices)
    return Mesh(np.array(devices[:n_data]), ("data",))


def mesh_from_arg(num_devices: int = -1) -> Optional[Mesh]:
    """Resolve a CLI --num_devices flag into a mesh (None = single device,
    no sharding). -1 means all available devices."""
    n = len(jax.devices()) if num_devices == -1 else num_devices
    if n <= 1:
        return None
    if n > len(jax.devices()):
        raise ValueError(f"--num_devices {n} > available {len(jax.devices())}")
    return create_mesh(n)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a host batch dict with the leading axis sharded over 'data'.
    All leaves must have a leading batch axis divisible by the mesh size."""
    sharding = batch_sharding(mesh)
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (e.g. params / schedule) over the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
