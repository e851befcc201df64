"""Multi-host (DCN) training dryrun (VERDICT Missing #6 / Next #9).

The reference trains across nodes via Lightning DDP `--num_nodes`
(/root/reference/genie/train.py:54-65). The TPU-native equivalent is
jax.distributed.initialize() + one global Mesh spanning all processes,
with per-host data feeding through `parallel.shard_batch` (each process
generates the identical deterministic global batch and materializes only
its addressable rows).

No multi-host hardware exists here, so this script proves the path on
CPU: it runs the SAME data-parallel training program

  (a) in ONE process with 8 virtual devices, and
  (b) in TWO coordinated processes x 4 virtual devices each
      (jax.distributed over a localhost coordinator),

and asserts the per-step global losses match. Usage:

  python tools/multihost_dryrun.py               # orchestrate a+b, compare
  python tools/multihost_dryrun.py --worker I    # internal: one process

Exit code 0 and a JSON line with "ok": true on success.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PROC = 2
LOCAL_DEVICES = 4
N_STEPS = 3
PORT = int(os.environ.get("MULTIHOST_PORT", "12975"))


def run_steps():
    """The training program: identical in every mode. Returns the per-step
    global weighted losses."""
    import jax
    import numpy as np

    from genie2_tpu.config import Config
    from genie2_tpu.diffusion import Schedule
    from genie2_tpu.nn import Denoiser
    from genie2_tpu.parallel import create_mesh, replicate, shard_batch
    from genie2_tpu.train import create_train_state, make_train_step, synthetic_dataset
    from genie2_tpu.utils.model_io import init_params

    config = Config(
        overrides={
            "singleFeatureDimension": 16,
            "pairFeatureDimension": 8,
            "positionalEmbeddingDimension": 8,
            "chainEmbeddingDimension": 4,
            "timestepEmbeddingDimension": 8,
            "templateDistanceNumBins": 5,
            "numPairTransformLayers": 1,
            "triangularMultiplicativeHiddenDimension": 4,
            "numStructureLayers": 1,
            "ipaHiddenDimension": 4,
            "ipaNumHeads": 2,
            "ipaNumQkPoints": 2,
            "ipaNumVPoints": 2,
            "numTimesteps": 10,
            "maximumNumResidues": 24,
            "remat": False,
        }
    )
    model = Denoiser.from_config(config)
    schedule = Schedule.create(config.diffusion["n_timestep"])
    params = init_params(model, config, seed=0)
    state, tx = create_train_state(params, lr=1e-3)
    step_fn = make_train_step(model, schedule, tx, 1.0)

    mesh = create_mesh()
    assert mesh.devices.size == N_PROC * LOCAL_DEVICES, mesh
    state = replicate(state, mesh)

    ds = synthetic_dataset(16, max_n_res=24)
    base_key = jax.random.PRNGKey(7)
    losses = []
    for step in range(N_STEPS):
        # Every process generates the identical global batch (pure function
        # of the seed/step); shard_batch feeds only addressable rows.
        rng = np.random.default_rng([3, step])
        batch = next(ds.epoch(8, rng))
        device_batch = shard_batch(batch, mesh)
        state, metrics = step_fn(state, device_batch, jax.random.fold_in(base_key, step))
        losses.append(float(np.asarray(metrics["weighted_loss"])))
    return losses


def worker(process_id: int):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", LOCAL_DEVICES)
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, "tests", ".jax_test_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.distributed.initialize(
        coordinator_address=f"localhost:{PORT}",
        num_processes=N_PROC,
        process_id=process_id,
    )
    assert jax.process_count() == N_PROC
    assert len(jax.local_devices()) == LOCAL_DEVICES
    assert len(jax.devices()) == N_PROC * LOCAL_DEVICES
    losses = run_steps()
    print("WORKER_RESULT " + json.dumps({"process_id": process_id, "losses": losses}))
    jax.distributed.shutdown()


def single():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", N_PROC * LOCAL_DEVICES)
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, "tests", ".jax_test_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    losses = run_steps()
    print("WORKER_RESULT " + json.dumps({"process_id": -1, "losses": losses}))


def _extract(output: str):
    for line in output.splitlines():
        if line.startswith("WORKER_RESULT "):
            return json.loads(line[len("WORKER_RESULT ") :])
    raise RuntimeError(f"no WORKER_RESULT in output:\n{output}")


def orchestrate():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)

    base = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--single"],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    if base.returncode != 0:
        print(base.stdout + base.stderr)
        raise SystemExit("single-process baseline failed")
    baseline = _extract(base.stdout)["losses"]

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO,
        )
        for i in range(N_PROC)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for p, out in zip(procs, outs):
        if p.returncode != 0:
            print(out)
            raise SystemExit("worker failed")
    results = [_extract(o)["losses"] for o in outs]

    ok = all(
        abs(a - b) < 1e-5
        for losses in results
        for a, b in zip(baseline, losses)
    ) and all(len(l) == N_STEPS for l in results)
    print(
        json.dumps(
            {
                "ok": ok,
                "n_processes": N_PROC,
                "local_devices": LOCAL_DEVICES,
                "baseline_losses": baseline,
                "multihost_losses": results[0],
            }
        ),
        flush=True,
    )
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--worker") + 1]))
        sys.stdout.flush()
        os._exit(0)
    elif "--single" in sys.argv:
        single()
        sys.stdout.flush()
        os._exit(0)
    else:
        orchestrate()
