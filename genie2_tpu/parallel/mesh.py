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


def create_mesh(
    n_data: int = -1,
    devices: Optional[Sequence] = None,
    n_seq: int = 1,
    n_model: int = 1,
) -> Mesh:
    """A data-parallel mesh over the given (default: all) devices.

    Inner axes (size-1 axes are dropped, so callers never see dummy
    dimensions):

      * n_seq > 1 adds a 'seq' axis for sequence-sharding the pair
        tensor (SURVEY §5 long-context row; parallel.pair_sharding),
      * n_model > 1 adds a 'model' axis for tensor parallelism
        (parallel/tensor_parallel.py; create_tp_mesh delegates here),
      * both > 1 compose into a 3-D ('data', 'seq', 'model') mesh —
        long context AND sharded weights together. 'model' is innermost
        (its per-layer psums are the most latency-sensitive), 'seq'
        next, so both inner axes ride the fastest ICI links."""
    devices = list(devices if devices is not None else jax.devices())
    n_inner = n_seq * n_model
    if n_data == -1:
        n_data = len(devices) // n_inner
    if n_data < 1:
        raise ValueError(
            f"mesh needs at least {max(n_inner, 1)} devices "
            f"({n_seq=}, {n_model=}), have {len(devices)}"
        )
    need = n_data * n_inner
    if need > len(devices):
        raise ValueError(
            f"mesh ({n_data} data x {n_seq} seq x {n_model} model) needs "
            f"{need} devices, have {len(devices)}"
        )
    if n_inner == 1:
        return Mesh(np.array(devices[:n_data]), ("data",))
    if n_seq > 1 and n_model > 1:
        return Mesh(
            np.array(devices[:need]).reshape(n_data, n_seq, n_model),
            ("data", "seq", "model"),
        )
    axis = "model" if n_model > 1 else "seq"
    return Mesh(
        np.array(devices[:need]).reshape(n_data, n_inner), ("data", axis)
    )


def mesh_from_arg(
    num_devices: int = -1, n_seq: int = 1, n_model: int = 1
) -> Optional[Mesh]:
    """Resolve a CLI --num_devices flag into a mesh (None = single device,
    no sharding). -1 means all available devices. n_seq > 1 adds a 'seq'
    axis sequence-sharding each sample's pair tensor (long-context
    inference); n_model > 1 adds a 'model' axis tensor-sharding the
    weights (parallel/tensor_parallel.py). Both together build the 3-D
    ('data', 'seq', 'model') mesh — long context and sharded weights
    compose (each orthogonal: the P specs name different axes)."""
    n = len(jax.devices()) if num_devices == -1 else num_devices
    n_inner = n_seq * n_model
    if n < n_inner:
        # An explicit sharding request must not be silently ignored.
        raise ValueError(
            f"--mesh_seq {n_seq} x --mesh_model {n_model} needs at least "
            f"{n_inner} devices; --num_devices resolves to {n}"
        )
    if n <= 1:
        return None
    if n > len(jax.devices()):
        raise ValueError(f"--num_devices {n} > available {len(jax.devices())}")
    if n % n_inner:
        raise ValueError(
            f"--num_devices {n} not divisible by "
            f"--mesh_seq {n_seq} x --mesh_model {n_model} = {n_inner}"
        )
    return create_mesh(n // n_inner, n_seq=n_seq, n_model=n_model)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def data_axis_size(mesh: Mesh) -> int:
    """Size of the 'data' axis — the divisor for batch/particle counts.
    Batches and particles shard over 'data' only; 'seq'/'model' axes
    replicate them (the pair tensor / the weights shard there instead)."""
    return dict(mesh.shape).get("data", mesh.devices.size)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pair_sharding(mesh: Optional[Mesh]) -> Optional[NamedSharding]:
    """Sharding for residue-indexed activations: batch over 'data', the
    first residue axis over 'seq', everything else replicated. Applies
    uniformly to the single rep [B,N,c], the pair rep [B,I,J,c] (i-axis
    sharded) and masks [B,N(,N)] — trailing dims default to replicated.
    Returns None when the mesh has no 'seq' axis (constraint becomes a
    no-op in the model)."""
    if mesh is None or "seq" not in mesh.axis_names or mesh.shape["seq"] == 1:
        return None
    return NamedSharding(mesh, P("data", "seq"))


def constrain(x, sharding: Optional[NamedSharding]):
    """jax.lax.with_sharding_constraint that tolerates sharding=None."""
    if sharding is None:
        return x
    return jax.lax.with_sharding_constraint(x, sharding)


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a host batch dict with the leading axis sharded over 'data'.
    All leaves must have a leading batch axis divisible by the mesh size.

    Multi-host (jax.process_count() > 1): `batch` is the GLOBAL batch —
    every process generates the identical batch (the data order is a pure
    function of (seed, epoch, step), train/loop.py) and feeds only the rows
    landing on its addressable devices. This replaces the reference's
    Lightning/DDP per-rank DistributedSampler (train.py:54-65)."""
    sharding = batch_sharding(mesh)
    n_data = data_axis_size(mesh)
    for k, v in batch.items():
        if hasattr(v, "shape") and v.shape and v.shape[0] % n_data:
            raise ValueError(
                f"batch axis {v.shape[0]} (key {k!r}) not divisible by the "
                f"mesh 'data' axis ({n_data}); pick a divisible batchSize "
                "or shrink meshData"
            )
    n_proc = jax.process_count()
    if n_proc == 1:
        return {k: jax.device_put(v, sharding) for k, v in batch.items()}

    pid = jax.process_index()
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        if v.shape[0] % n_proc:
            raise ValueError(
                f"global batch axis {v.shape[0]} not divisible by "
                f"{n_proc} processes (key {k!r})"
            )
        per = v.shape[0] // n_proc
        local = v[pid * per : (pid + 1) * per]
        out[k] = jax.make_array_from_process_local_data(
            sharding, local, global_shape=v.shape
        )
    return out


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (e.g. params / schedule) over the mesh.

    Multi-host: every process must hold an identical host copy (true for
    seed-initialized params and restored checkpoints)."""
    sharding = replicated(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        tree,
    )
