"""Locate the flagship-campaign training-loop overhead on chip.

The round-4 campaign trained at ~66 ms/step while tools/bench_train.py
measures the SAME padded shapes at 23.9 ms/step — padding cannot explain a
steps/s gap (shapes are static), so ~2.8x of per-step time lives somewhere
in the loop around the jitted step. This tool times four variants of the
same (model, schedule, optimizer, EMA) to attribute it:

  A fixed      device-resident batch, fold_in per step — the bench_train
               lower bound, plus the EMA update the bench omits
  B pipeline   real StructureDataset batches through prefetch(place) —
               adds host-side batch assembly + host->device transfer
  C nolog      Trainer.fit with logging effectively disabled
               (log_every_n_step=10**9) — the full loop minus metric
               fetches
  D full       Trainer.fit with the campaign's logEverySteps=50

Each variant runs the identical number of optimizer steps on identical
shapes. Run exclusively on the TPU (CLAUDE.md gotcha #5); CPU tiny mode
for shape validation: DIAG_TINY=1.

Usage: python tools/diagnose_train_gap.py [n_steps]   (default 200)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    tiny = os.environ.get("DIAG_TINY") == "1"
    if tiny:
        jax.config.update("jax_platforms", "cpu")

    from genie2_tpu.config import Config
    from genie2_tpu.diffusion import Schedule
    from genie2_tpu.features import to_device
    from genie2_tpu.nn import Denoiser
    from genie2_tpu.train import (
        create_train_state,
        make_train_step,
        synthetic_dataset,
    )
    from genie2_tpu.train.prefetch import prefetch
    from genie2_tpu.utils.model_io import init_params

    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    if tiny:
        n_steps = min(n_steps, 8)

    length = 40 if tiny else 256
    overrides = {
        "maximumNumResidues": length,
        "batchSize": 1,
        "computeDtype": "fp32" if tiny else "bf16",
        "emaDecay": 0.999,
    }
    if tiny:
        overrides.update(
            {
                "numTimesteps": 8,
                "singleFeatureDimension": 16,
                "pairFeatureDimension": 8,
                "positionalEmbeddingDimension": 8,
                "chainEmbeddingDimension": 4,
                "timestepEmbeddingDimension": 8,
                "relativePositionK": 4,
                "templateDistanceNumBins": 5,
                "numPairTransformLayers": 1,
                "numStructureLayers": 1,
            }
        )
    config = Config(overrides=overrides)
    dtype = config.training.get("compute_dtype", "fp32")

    model = Denoiser.from_config(config)
    schedule = Schedule.create(config.diffusion["n_timestep"])
    params = init_params(model, config)
    state0, tx = create_train_state(
        params, config.optimization["lr"], ema_decay=0.999
    )
    step_fn = make_train_step(
        model, schedule, tx, 1.0, compute_dtype=dtype, ema_decay=0.999
    )

    # The same mixed-length corpus shape the campaign trains on; padded
    # shapes are static so every variant compiles exactly one program.
    ds = synthetic_dataset(4 * n_steps, max_n_res=length, min_n_res=20)

    def sync(metrics):
        return float(np.asarray(jax.device_get(metrics["weighted_loss"])))

    base_key = jax.random.PRNGKey(0)
    results = {}

    # Warmup: compile + the tunnel's one-time on-chip program load.
    fixed = to_device(next(ds.epoch(1, np.random.default_rng(1))))
    state, metrics = step_fn(state0, fixed, base_key)
    sync(metrics)
    for _ in range(3):
        state, metrics = step_fn(state, fixed, jax.random.fold_in(base_key, 1))
    sync(metrics)

    run_abcd = os.environ.get("DIAG_SKIP_ABCD") != "1"

    # --- A: fixed device-resident batch -----------------------------------
    state = state0
    if run_abcd:
        t0 = time.perf_counter()
        for i in range(n_steps):
            state, metrics = step_fn(
                state, fixed, jax.random.fold_in(base_key, i)
            )
        sync(metrics)
        results["A_fixed_ms"] = (time.perf_counter() - t0) / n_steps * 1e3

    # --- B: real pipeline (prefetch + place), bench-style step loop -------
    def place(batch):
        return int(batch["residue_mask"].sum()), to_device(batch)

    if run_abcd:
        state = state0
        it = prefetch(ds.epoch(1, np.random.default_rng(2)), place, 2)
        t0 = time.perf_counter()
        done = 0
        for i, (_, device_batch) in enumerate(it):
            state, metrics = step_fn(
                state, device_batch, jax.random.fold_in(base_key, i)
            )
            done += 1
            if done >= n_steps:
                break
        sync(metrics)
        results["B_pipeline_ms"] = (time.perf_counter() - t0) / done * 1e3
        if hasattr(it, "close"):
            it.close()

    # --- C/D: the full Trainer.fit loop -----------------------------------
    # One epoch over n_steps structures == n_steps optimizer steps; the
    # only difference between C and D is the metric-fetch cadence.
    import shutil
    import tempfile

    from genie2_tpu.train.loop import Trainer

    for label, log_every in (
        ("C_fit_nolog_ms", 10**9),
        ("D_fit_log50_ms", 50),
    ) if run_abcd else ():
        workdir = tempfile.mkdtemp(prefix="diag_train_")
        cfg = Config(
            overrides={
                **overrides,
                "name": "diag",
                "rootDirectory": workdir,
                "numEpoches": 1,
                "logEverySteps": log_every,
                "checkpointEveryEpoches": 10**9,
                "saveStateEverySteps": 0,
            }
        )
        trainer = Trainer(cfg, use_mesh=False)
        # fit() always checkpoints + saves resume state on the final epoch
        # (loop.py:427-429); a full-train-state fetch through the ~32 MB/s
        # tunnel adds SECONDS inside the measured window (this was most of
        # the round-5 first-run C=237/D=172 ms readings — tool artifact,
        # not loop cost). Stub both; this tool times the step loop.
        trainer.save_checkpoint = lambda *a, **k: None
        trainer.save_state = lambda *a, **k: None
        # Warmup epoch: compiles the trainer's own step program (each
        # make_train_step closure is a fresh jit cache entry) + the
        # tunnel's one-time on-chip load, off the measured epoch.
        trainer.fit(
            synthetic_dataset(4, max_n_res=length, min_n_res=20), n_epoch=1
        )
        int(np.asarray(jax.device_get(trainer.state.step)))  # drain queue
        t0 = time.perf_counter()
        trainer.fit(
            synthetic_dataset(n_steps, max_n_res=length, min_n_res=20),
            n_epoch=1,
        )
        # fit() does not sync; on the tunnel block_until_ready is a no-op,
        # so fetch a value dependent on the last step (gotcha #2).
        int(np.asarray(jax.device_get(trainer.state.step)))
        results[label] = (time.perf_counter() - t0) / n_steps * 1e3
        trainer.logger.finish()
        shutil.rmtree(workdir, ignore_errors=True)

    # --- E (DIAG_E=1): fit with saves stubbed + per-step issue trace ------
    # Separates the two confounds in C/D (round 5): (a) fit()'s final
    # save_state lands INSIDE the timed window (a sync fetch of the full
    # train state through the ~32 MB/s tunnel — tool artifact, not loop
    # cost); (b) the instantaneous rate decays across the run, which a
    # single average cannot attribute. E stubs every save and records the
    # host time at which each step is ISSUED: growing inter-issue deltas
    # mean the HOST slows down; flat deltas with a big tail-sync mean the
    # device/tunnel queue is the bottleneck.
    if os.environ.get("DIAG_E") == "1":
        workdir = tempfile.mkdtemp(prefix="diag_train_")
        cfg = Config(
            overrides={
                **overrides,
                "name": "diag",
                "rootDirectory": workdir,
                "numEpoches": 1,
                "logEverySteps": 10**9,
                "checkpointEveryEpoches": 10**9,
                "saveStateEverySteps": 0,
            }
        )
        trainer = Trainer(cfg, use_mesh=False)
        trainer.save_checkpoint = lambda *a, **k: None
        trainer.save_state = lambda *a, **k: None
        issue_times = []
        orig_step = trainer._step_fn

        def traced_step(*a, **k):
            issue_times.append(time.perf_counter())
            return orig_step(*a, **k)

        trainer._step_fn = traced_step
        trainer.fit(
            synthetic_dataset(4, max_n_res=length, min_n_res=20), n_epoch=1
        )
        int(np.asarray(jax.device_get(trainer.state.step)))
        issue_times.clear()
        t0 = time.perf_counter()
        trainer.fit(
            synthetic_dataset(n_steps, max_n_res=length, min_n_res=20),
            n_epoch=1,
        )
        t_issued = time.perf_counter()
        int(np.asarray(jax.device_get(trainer.state.step)))
        t_done = time.perf_counter()
        d = np.diff(np.asarray(issue_times)) * 1e3
        results["E_fit_nosave_ms"] = round((t_done - t0) / n_steps * 1e3, 2)
        results["E_issue_ms_first50_mean"] = round(float(d[:50].mean()), 2)
        results["E_issue_ms_last50_mean"] = round(float(d[-50:].mean()), 2)
        results["E_issue_ms_max"] = round(float(d.max()), 2)
        results["E_tail_sync_ms"] = round((t_done - t_issued) * 1e3, 1)
        trainer.logger.finish()
        shutil.rmtree(workdir, ignore_errors=True)

    # --- F (DIAG_F=K): fit with scanSteps=K, saves stubbed ---------------
    # The round-5 fix for the host-bound loop: K optimizer steps per
    # lax.scan dispatch (train/state.make_train_scan_step). F vs E is the
    # amortization win.
    scan_k = int(os.environ.get("DIAG_F", "0"))
    if scan_k > 1:
        workdir = tempfile.mkdtemp(prefix="diag_train_")
        cfg = Config(
            overrides={
                **overrides,
                "name": "diag",
                "rootDirectory": workdir,
                "numEpoches": 1,
                "logEverySteps": 10**9,
                "checkpointEveryEpoches": 10**9,
                "saveStateEverySteps": 0,
                "scanSteps": scan_k,
            }
        )
        trainer = Trainer(cfg, use_mesh=False)
        trainer.save_checkpoint = lambda *a, **k: None
        trainer.save_state = lambda *a, **k: None
        trainer.fit(
            synthetic_dataset(2 * scan_k, max_n_res=length, min_n_res=20),
            n_epoch=1,
        )
        int(np.asarray(jax.device_get(trainer.state.step)))
        t0 = time.perf_counter()
        trainer.fit(
            synthetic_dataset(n_steps, max_n_res=length, min_n_res=20),
            n_epoch=1,
        )
        int(np.asarray(jax.device_get(trainer.state.step)))
        results[f"F_fit_scan{scan_k}_ms"] = round(
            (time.perf_counter() - t0) / n_steps * 1e3, 2
        )
        trainer.logger.finish()
        shutil.rmtree(workdir, ignore_errors=True)

    results = {k: round(v, 2) for k, v in results.items()}
    results["n_steps"] = n_steps
    results["note"] = (
        "all variants warm; B-A = pipeline cost, C-B = loop overhead, "
        "D-C = logging cost, A - bench_train = EMA cost."
    )
    print(json.dumps(results), flush=True)
    if not tiny:
        sys.stdout.flush()
        os._exit(0)  # CLAUDE.md gotcha #11


if __name__ == "__main__":
    main()
