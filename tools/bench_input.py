"""Input-pipeline overlap benchmark (VERDICT Missing #5 done-criterion).

Measures steady-state train-step time in three input modes and reports the
pipeline overhead of each vs the device-only floor:

  device   — one fixed, pre-placed batch (no input pipeline at all)
  sync     — real PDB files parsed once, then per-step host work
             (augment/pad/stack + device_put) inline with the step
  prefetch — same disk dataset through the background-thread prefetcher
             (depth from PREFETCH_DEPTH, default 2)

"No regression" = the prefetch column matches the device floor: host input
work fully hidden behind the device step.

Env knobs: INPUT_LEN (128), INPUT_BATCH (4), INPUT_STEPS (30),
INPUT_DEVICES (1; >1 uses a CPU mesh of that many virtual devices),
PREFETCH_DEPTH (2). Runs on CPU by default (INPUT_PLATFORM=cpu) so the
1-dev vs 8-dev comparison works anywhere; set INPUT_PLATFORM=tpu on the
real chip.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_platform = os.environ.get("INPUT_PLATFORM", "cpu")
_n_devices = int(os.environ.get("INPUT_DEVICES", "1"))
if _platform == "cpu":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", max(_n_devices, 1))
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tests", ".jax_test_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402


def main():
    from genie2_tpu.config import Config
    from genie2_tpu.diffusion import Schedule
    from genie2_tpu.features import save_features_to_pdb, to_device
    from genie2_tpu.nn import Denoiser
    from genie2_tpu.parallel import create_mesh, replicate, shard_batch
    from genie2_tpu.train import (
        MotifAugmentConfig,
        StructureDataset,
        create_train_state,
        make_train_step,
        prefetch,
        synthetic_dataset,
    )
    from genie2_tpu.utils.model_io import init_params

    length = int(os.environ.get("INPUT_LEN", "128"))
    batch = int(os.environ.get("INPUT_BATCH", "4"))
    n_steps = int(os.environ.get("INPUT_STEPS", "30"))
    depth = int(os.environ.get("PREFETCH_DEPTH", "2"))

    overrides = {"maximumNumResidues": length, "batchSize": batch}
    if os.environ.get("INPUT_TINY") == "1":
        # Small model for CPU sanity runs; the flagship compile takes
        # minutes on CPU and the pipeline-overlap question is model-free.
        overrides.update(
            {
                "singleFeatureDimension": 32,
                "pairFeatureDimension": 16,
                "positionalEmbeddingDimension": 8,
                "chainEmbeddingDimension": 4,
                "timestepEmbeddingDimension": 8,
                "templateDistanceNumBins": 5,
                "numPairTransformLayers": 1,
                "triangularMultiplicativeHiddenDimension": 8,
                "numStructureLayers": 2,
                "ipaHiddenDimension": 4,
                "ipaNumHeads": 2,
                "ipaNumQkPoints": 2,
                "ipaNumVPoints": 2,
                "remat": False,
            }
        )
    config = Config(overrides=overrides)
    model = Denoiser.from_config(config)
    schedule = Schedule.create(config.diffusion["n_timestep"])
    params = init_params(model, config)
    state0, tx = create_train_state(params, config.optimization["lr"])
    step_fn = make_train_step(model, schedule, tx, 1.0)

    mesh = create_mesh() if _n_devices > 1 else None
    if mesh is not None:
        state0 = replicate(state0, mesh)

    def place(b):
        return shard_batch(b, mesh) if mesh is not None else to_device(b)

    # Disk dataset: synthetic structures written as real PDB files, parsed
    # back through the production parser, with motif augmentation on.
    mem = synthetic_dataset(batch * 8, max_n_res=length, min_n_res=length)
    tmpdir = tempfile.mkdtemp(prefix="bench_input_")
    for i, feats in enumerate(mem._cache):
        save_features_to_pdb(feats, os.path.join(tmpdir, f"s{i:04d}.pdb"))
    paths = sorted(
        os.path.join(tmpdir, f) for f in os.listdir(tmpdir) if f.endswith(".pdb")
    )
    disk = StructureDataset(
        paths, max_n_res=length, max_n_chain=1, motif=MotifAugmentConfig()
    )

    def endless(depth_):
        def gen():
            e = 0
            while True:
                rng = np.random.default_rng([0, e])
                yield from disk.epoch(batch, rng)
                e += 1

        return prefetch(gen(), place, depth_)

    key = jax.random.PRNGKey(0)

    def sync_loss(metrics):
        return float(np.asarray(jax.device_get(metrics["weighted_loss"])))

    def run(mode):
        nonlocal key
        state = state0
        it = None
        if mode == "device":
            fixed = place(next(disk.epoch(batch, np.random.default_rng(0))))
            get = lambda: fixed  # noqa: E731
        else:
            it = endless(depth if mode == "prefetch" else 0)
            get = lambda: next(it)  # noqa: E731
        # Warmup: compile + on-chip load.
        for _ in range(4):
            key, sub = jax.random.split(key)
            state, metrics = step_fn(state, get(), sub)
        sync_loss(metrics)
        t0 = time.perf_counter()
        for _ in range(n_steps):
            key, sub = jax.random.split(key)
            state, metrics = step_fn(state, get(), sub)
        sync_loss(metrics)
        dt = (time.perf_counter() - t0) / n_steps * 1e3
        if hasattr(it, "close"):
            it.close()
        return dt

    results = {mode: run(mode) for mode in ("device", "sync", "prefetch")}
    shutil.rmtree(tmpdir, ignore_errors=True)

    floor = results["device"]
    print(
        json.dumps(
            {
                "metric": f"input_pipeline_overhead_L{length}_B{batch}_{_n_devices}dev",
                "value": round((results["prefetch"] / floor - 1) * 100, 2),
                "unit": "% step-time overhead (prefetch vs device-only floor)",
                "extra": {
                    "device_ms": round(floor, 2),
                    "sync_ms": round(results["sync"], 2),
                    "prefetch_ms": round(results["prefetch"], 2),
                    "sync_overhead_pct": round((results["sync"] / floor - 1) * 100, 2),
                    "n_devices": _n_devices,
                    "platform": _platform,
                },
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
