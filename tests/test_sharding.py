"""Mesh-sharded sampling tests: the sample batch sharded over the 'data'
axis must produce exactly the single-device trajectory (this replaces the
reference's process-per-GPU fan-out)."""

import jax
import jax.numpy as jnp
import numpy as np

from genie2_tpu.diffusion import Schedule
from genie2_tpu.features import batchify, create_empty_features, to_device
from genie2_tpu.parallel import (
    batch_sharding,
    create_mesh,
    replicate,
    shard_batch,
)
from genie2_tpu.sampling import ancestral_sample
from tests.test_sampler import make_model_and_params, tiny_config


def test_sharded_sampling_matches_single_device():
    config = tiny_config(n_timestep=6)
    model, params = make_model_and_params(config, length=16)
    schedule = Schedule.create(6)
    batch = batchify([create_empty_features([16]) for _ in range(8)])

    feats1 = to_device(batch)
    out1 = ancestral_sample(
        model.apply, params, schedule, feats1, jax.random.PRNGKey(0),
        jnp.float32(0.6), 6,
    )

    mesh = create_mesh()
    assert mesh.devices.size == 8
    feats8 = shard_batch({k: np.asarray(v) for k, v in batch.items()}, mesh)
    params8 = replicate(params, mesh)
    out8 = ancestral_sample(
        model.apply, params8, schedule, feats8, jax.random.PRNGKey(0),
        jnp.float32(0.6), 6,
    )
    # Output carries the batch sharding.
    assert out8.sharding.is_equivalent_to(batch_sharding(mesh), out8.ndim)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out8), atol=1e-5)


def test_profiler_trace_smoke(tmp_path):
    from genie2_tpu.utils.profiling import StepTimer, trace

    logdir = str(tmp_path / "trace")
    with trace(logdir):
        _ = jnp.sum(jnp.ones((64, 64)) @ jnp.ones((64, 64)))
    import os

    assert os.path.isdir(logdir)
    timer = StepTimer(warmup=1)
    for _ in range(4):
        with timer.step():
            float(jnp.sum(jnp.ones(8)))
    summary = timer.summary()
    assert summary["n"] == 3 and summary["mean_s"] > 0
