"""Sampler-quality validation on a self-trained toy model.

Two questions the unit tests (oracle-exactness, determinism) cannot answer:

  1. Do the accelerated solvers (DDIM-K, DPM-Solver-K) produce samples with
     the same learned statistics as the full ancestral chain?
  2. Does SSE guidance raise the target statistic on a model that can
     actually produce secondary structure?

Protocol: train the tiny denoiser on synthetic structures = random-walk
scaffolds with an ideal alpha-helix fragment planted (so the data has both
helical geometry and a characteristic CA-CA bond distribution), then
compare per-sampler sample statistics (consecutive-CA distance mean/std,
soft helix fraction) against the training data, and an SSE-guided run
against its unguided control at matched seeds.

Run: python tools/sampler_quality.py  (TPU or CPU; ~2-6 min at defaults)
Env: SQ_TRAIN_STEPS (2000), SQ_SAMPLES (8), SQ_JSON (path), SQ_PLATFORM,
SQ_DATA (64 structures), SQ_K_LIST ("10,25"), SQ_LR_DECAY (cosine decay
to 0 over the run when "1" — use for convergence runs).

Round-3 convergence protocol (VERDICT #8 — quality-vs-K on a WELL-trained
score field): SQ_TRAIN_STEPS=20000 SQ_DATA=256 SQ_LR_DECAY=1
SQ_K_LIST=5,10,25,50 SQ_SAMPLES=16; results in BENCH_NOTES.md.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

if os.environ.get("SQ_PLATFORM") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

LENGTH = 48
N_TIMESTEP = 100

CONFIG = {
    "numTimesteps": N_TIMESTEP,
    "maximumNumResidues": LENGTH,
    "singleFeatureDimension": 32,
    "pairFeatureDimension": 16,
    "positionalEmbeddingDimension": 8,
    "chainEmbeddingDimension": 4,
    "timestepEmbeddingDimension": 16,
    "templateDistanceNumBins": 5,
    "numPairTransformLayers": 1,
    "triangularMultiplicativeHiddenDimension": 8,
    "numStructureLayers": 2,
    "ipaHiddenDimension": 8,
    "ipaNumHeads": 2,
    "ipaNumQkPoints": 2,
    "ipaNumVPoints": 2,
    "batchSize": 8,
    "learningRate": 1e-3,
    "remat": False,
}


def ideal_helix(n, phase=0.0):
    t = np.arange(n) * np.radians(100.0) + phase
    return np.stack(
        [2.3 * np.cos(t), 2.3 * np.sin(t), 1.5 * np.arange(n)], axis=-1
    )


def helix_planted_dataset(n_structures, rng):
    from genie2_tpu.features import create_empty_features
    from genie2_tpu.train.data import StructureDataset

    ds = StructureDataset.__new__(StructureDataset)
    ds.filepaths = []
    ds.max_n_res = LENGTH
    ds.max_n_chain = 1
    ds.motif = None
    ds._cache = []
    for _ in range(n_structures):
        f = create_empty_features([LENGTH])
        steps = rng.normal(size=(LENGTH, 3)) * 1.0 + np.array([3.8, 0, 0])
        coords = np.cumsum(steps, axis=0)
        h_len = int(rng.integers(12, 24))
        start = int(rng.integers(0, LENGTH - h_len + 1))
        frag = ideal_helix(h_len, phase=float(rng.uniform(0, 6.28)))
        anchor = coords[start : start + h_len].mean(0) - frag.mean(0)
        coords[start : start + h_len] = frag + anchor
        f["atom_positions"] = (coords - coords.mean(0)).astype(np.float32)
        f["aatype"] = np.eye(20)[rng.integers(0, 20, LENGTH)].astype(int)
        ds._cache.append(f)
    return ds


def train(n_steps, seed=0):
    from genie2_tpu.config import Config
    from genie2_tpu.diffusion import Schedule
    from genie2_tpu.features import to_device
    from genie2_tpu.nn import Denoiser
    from genie2_tpu.train import create_train_state, make_train_step
    from genie2_tpu.utils.model_io import init_params

    config = Config(overrides=dict(CONFIG))
    model = Denoiser.from_config(config)
    schedule = Schedule.create(N_TIMESTEP)
    params = init_params(model, config, seed=seed)
    lr = config.optimization["lr"]
    if os.environ.get("SQ_LR_DECAY") == "1":
        import optax

        lr = optax.cosine_decay_schedule(lr, n_steps)
    state, tx = create_train_state(params, lr)
    step_fn = make_train_step(model, schedule, tx, 1.0)

    n_data = int(os.environ.get("SQ_DATA", "64"))
    ds = helix_planted_dataset(n_data, np.random.default_rng(seed))
    base_key = jax.random.PRNGKey(seed)
    step, epoch = 0, 0
    while step < n_steps:
        rng = np.random.default_rng([seed, epoch])
        for batch in ds.epoch(CONFIG["batchSize"], rng):
            state, metrics = step_fn(
                state, to_device(batch), jax.random.fold_in(base_key, step)
            )
            step += 1
            if step % 500 == 0:
                print(
                    f"[train] step {step} loss={float(metrics['weighted_loss']):.4f}",
                    file=sys.stderr, flush=True,
                )
            if step >= n_steps:
                break
        epoch += 1
    return model, state.params, schedule, ds


def stats(trans, mask):
    from genie2_tpu.sampling import soft_sse_fraction

    t = np.asarray(trans)
    d = np.linalg.norm(t[:, 1:] - t[:, :-1], axis=-1)
    helix = np.asarray(soft_sse_fraction(jnp.asarray(t), mask, "helix"))
    return {
        "bond_mean": round(float(d.mean()), 3),
        "bond_std": round(float(d.std()), 3),
        "soft_helix": round(float(helix.mean()), 4),
    }


def main():
    from genie2_tpu.features import batchify, create_empty_features, to_device
    from genie2_tpu.sampling import (
        ancestral_sample,
        ddim_sample,
        dpm_solver_sample,
        soft_sse_fraction,
        sse_guided_sample,
    )

    n_train = int(os.environ.get("SQ_TRAIN_STEPS", "2000"))
    n_samples = int(os.environ.get("SQ_SAMPLES", "8"))
    model, params, schedule, ds = train(n_train)

    feats = to_device(
        batchify([create_empty_features([LENGTH]) for _ in range(n_samples)])
    )
    mask = feats["residue_mask"]
    key = jax.random.PRNGKey(42)
    results = {}

    data = np.stack([f["atom_positions"] for f in ds._cache])
    results["data"] = stats(data, jnp.ones(data.shape[:2]))

    out = ancestral_sample(
        model.apply, params, schedule, feats, key, jnp.float32(1.0), N_TIMESTEP
    )
    results["ddpm_full"] = stats(out, mask)
    k_list = [
        int(k) for k in os.environ.get("SQ_K_LIST", "10,25").split(",") if k
    ]
    for k in k_list:
        results[f"ddim{k}"] = stats(
            ddim_sample(model.apply, params, schedule, feats, key, k, N_TIMESTEP),
            mask,
        )
        results[f"ddim{k}_sqrt"] = stats(
            ddim_sample(
                model.apply, params, schedule, feats, key, k, N_TIMESTEP,
                spacing="sqrt",
            ),
            mask,
        )
        if os.environ.get("SQ_ETA1") == "1":
            # Stochastic DDIM (eta=1): does re-injecting noise recover the
            # sample diversity / SSE content the deterministic ODE loses?
            results[f"ddim{k}_eta1"] = stats(
                ddim_sample(
                    model.apply, params, schedule, feats, key, k, N_TIMESTEP,
                    eta=1.0, scale=1.0,
                ),
                mask,
            )
        # Round-4 helix-deficit study (VERDICT #4): sweep eta toward 1
        # (SQ_ETA_SWEEP="0.25,0.5,0.75,1.0") and hybrid stochasticity
        # schedules (SQ_HYBRID="30,60" — switch_t values; deterministic ODE
        # for t > switch, ancestral-like eta=1 at or below; 'r' prefix for
        # the reverse, e.g. "r30" = stochastic early / deterministic late).
        # Hypothesis under test: the K-step solvers' flat ~30% helix loss
        # comes from losing the stochastic steps' structure-sharpening.
        for eta in [
            float(e) for e in os.environ.get("SQ_ETA_SWEEP", "").split(",") if e
        ]:
            results[f"ddim{k}_eta{eta:g}"] = stats(
                ddim_sample(
                    model.apply, params, schedule, feats, key, k, N_TIMESTEP,
                    eta=eta, scale=1.0,
                ),
                mask,
            )
        for spec in [s for s in os.environ.get("SQ_HYBRID", "").split(",") if s]:
            from genie2_tpu.sampling import eta_schedule_below

            rev = spec.startswith("r")
            switch = int(spec[1:] if rev else spec)
            etas = eta_schedule_below(
                N_TIMESTEP, k, switch,
                eta_low=0.0 if rev else 1.0, eta_high=1.0 if rev else 0.0,
            )
            results[f"ddim{k}_hyb{spec}"] = stats(
                ddim_sample(
                    model.apply, params, schedule, feats, key, k, N_TIMESTEP,
                    eta=etas, scale=1.0,
                ),
                mask,
            )
        results[f"dpm{k}"] = stats(
            dpm_solver_sample(
                model.apply, params, schedule, feats, key, k, N_TIMESTEP
            ),
            mask,
        )

    guided, _ = sse_guided_sample(
        model.apply, params, schedule, feats, key, n_samples,
        strength=100.0, scale=1.0,
    )
    control, _ = sse_guided_sample(
        model.apply, params, schedule, feats, key, n_samples,
        strength=0.0, scale=1.0, ess_threshold=-1.0,
    )
    results["sse_guided"] = stats(guided, mask)
    results["sse_control"] = stats(control, mask)

    for name, r in results.items():
        print(json.dumps({"sampler": name, **r}), flush=True)
    if os.environ.get("SQ_JSON"):
        with open(os.environ["SQ_JSON"], "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)  # tunnel exit-hang workaround
