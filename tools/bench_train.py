"""Training throughput benchmark: residues/s/chip (BASELINE.md metric).

Runs the jitted data-parallel training step on synthetic AFDB-like data
(random-walk CA traces padded to max_n_res) and reports residues/s.
Run exclusively on the TPU. Env knobs: TRAIN_BATCH (4), TRAIN_LEN (256),
TRAIN_STEPS (20).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    from genie2_tpu.config import Config
    from genie2_tpu.diffusion import Schedule
    from genie2_tpu.features import to_device
    from genie2_tpu.train import create_train_state, make_train_step, synthetic_dataset
    from genie2_tpu.utils.model_io import init_params

    # Production point: bf16 + batch 1 (B=1 is the measured per-chip
    # throughput optimum, BENCH_NOTES.md round 2; the mesh supplies
    # global batch). Override with TRAIN_DTYPE / TRAIN_BATCH.
    dtype = os.environ.get("TRAIN_DTYPE", "bf16")
    batch = int(os.environ.get("TRAIN_BATCH", "1"))
    length = int(os.environ.get("TRAIN_LEN", "256"))
    n_steps = int(os.environ.get("TRAIN_STEPS", "20"))

    overrides = {"maximumNumResidues": length, "batchSize": batch}
    if os.environ.get("TRAIN_REMAT", "1") == "0":
        overrides["remat"] = False
    config = Config(overrides=overrides)
    from genie2_tpu.nn import Denoiser

    model = Denoiser.from_config(config)
    schedule = Schedule.create(config.diffusion["n_timestep"])
    params = init_params(model, config)
    state, tx = create_train_state(params, config.optimization["lr"])
    step_fn = make_train_step(model, schedule, tx, 1.0, compute_dtype=dtype)

    ds = synthetic_dataset(batch * 2, max_n_res=length, min_n_res=length)
    batch_np = next(ds.epoch(batch, np.random.default_rng(0)))
    feats = to_device(batch_np)
    residues_per_batch = int(batch_np["residue_mask"].sum())

    key = jax.random.PRNGKey(0)

    def sync(metrics):
        return float(np.asarray(jax.device_get(metrics["weighted_loss"])))

    key, sub = jax.random.split(key)
    t0 = time.perf_counter()
    state, metrics = step_fn(state, feats, sub)
    sync(metrics)
    compile_s = time.perf_counter() - t0

    # Second warmup block: the first post-compile executions on the tunneled
    # backend pay a large one-time on-chip load cost.
    for _ in range(3):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, feats, sub)
    sync(metrics)

    t0 = time.perf_counter()
    for _ in range(n_steps):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, feats, sub)
    sync(metrics)
    dt = (time.perf_counter() - t0) / n_steps

    print(
        json.dumps(
            {
                "metric": f"train_residues_per_s_L{length}_B{batch}_{dtype}",
                "value": round(residues_per_batch / dt, 1),
                "unit": "residues/s/chip",
                "extra": {
                    "step_ms": round(dt * 1e3, 2),
                    "compile_s": round(compile_s, 1),
                    "device": str(jax.devices()[0]),
                },
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
