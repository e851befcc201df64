"""TDS scientific validation loop (VERDICT Next #8).

End-to-end quality check of the Twisted Diffusion Sampler, with no external
data: self-train a tiny diffusion model on synthetic MOTIF-PLANTED
structures (random-walk scaffolds with a fixed-orientation zig-zag fragment
embedded at a random position), then run the bench_tds.sh-shaped workload
(N seeded SMC runs against a MotifBench-style target dir, per-run outdirs,
motif_location.txt + benchmark manifests) and score it against an
unconditional control:

  (a) placement recovery: fraction of samples whose best-placement motif
      RMSD beats a threshold — twisted must beat the untwisted control;
  (b) the best-placement motif RMSD of the x0 prediction must improve over
      the reverse trajectory (from the sampler's x0 snapshot dumps — the
      reference's test/ fixture mechanism, smc_sampler_new_new.py:802-812).

Counterpart of the reference's benchmark loop /root/reference/bash_run.bash
+ the manual trajectory eyeballing it relied on; this is automated and
asserts the science. Run: python tools/tds_validation.py (CPU, ~4 min).
Env knobs: TDSVAL_TRAIN_STEPS (300), TDSVAL_SEEDS (5), TDSVAL_JSON (path).
"""

from __future__ import annotations

import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

if os.environ.get("TDSVAL_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, "tests", ".jax_test_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402

LENGTH = 48
MOTIF_LEN = 6
N_TIMESTEP = 100

CONFIG_LINES = {
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
    "motifProbability": 0.0,
    "remat": "False",
}


def motif_fragment() -> np.ndarray:
    """A fixed-orientation zig-zag of MOTIF_LEN CAs with ~3.8 A spacing,
    COM-centered. Fixed orientation because the reference twisting
    potential is center-only, not rotation-aligned
    (unconditional_smc.py:310-345)."""
    i = np.arange(MOTIF_LEN, dtype=np.float32)
    frag = np.stack([3.0 * i, 2.4 * (i % 2), np.zeros_like(i)], axis=-1)
    return frag - frag.mean(0, keepdims=True)


def planted_dataset(n_structures: int, rng: np.random.Generator):
    """Random-walk scaffolds with the motif fragment planted (fixed
    orientation, random contiguous position, random global offset)."""
    from genie2_tpu.features import create_empty_features
    from genie2_tpu.train.data import StructureDataset

    frag = motif_fragment()
    ds = StructureDataset.__new__(StructureDataset)
    ds.filepaths = []
    ds.max_n_res = LENGTH
    ds.max_n_chain = 1
    ds.motif = None
    ds._cache = []
    for _ in range(n_structures):
        f = create_empty_features([LENGTH])
        steps = rng.normal(size=(LENGTH, 3)) * 1.5 + np.array([3.8, 0, 0])
        coords = np.cumsum(steps, axis=0).astype(np.float32)
        start = int(rng.integers(0, LENGTH - MOTIF_LEN + 1))
        anchor = coords[start : start + MOTIF_LEN].mean(0, keepdims=True)
        coords[start : start + MOTIF_LEN] = frag + anchor
        f["atom_positions"] = coords - coords.mean(0, keepdims=True)
        f["aatype"] = np.eye(20)[rng.integers(0, 20, LENGTH)].astype(int)
        ds._cache.append(f)
    return ds


def train_model(workdir: str, n_steps: int, seed: int = 0) -> None:
    """Train the tiny model and store it in the release layout
    ({workdir}/results/tdsval/checkpoints/epoch.0.ckpt + configuration)."""
    from genie2_tpu.config import Config
    from genie2_tpu.diffusion import Schedule
    from genie2_tpu.features import to_device
    from genie2_tpu.nn import Denoiser
    from genie2_tpu.train import create_train_state, make_train_step
    from genie2_tpu.utils.model_io import init_params, save_params

    config = Config(overrides=dict(CONFIG_LINES))
    model = Denoiser.from_config(config)
    schedule = Schedule.create(N_TIMESTEP)
    params = init_params(model, config, seed=seed)
    state, tx = create_train_state(params, config.optimization["lr"])
    step_fn = make_train_step(model, schedule, tx, 1.0)

    ds = planted_dataset(64, np.random.default_rng(seed))
    base_key = jax.random.PRNGKey(seed)
    step = 0
    epoch = 0
    while step < n_steps:
        rng = np.random.default_rng([seed, epoch])
        for batch in ds.epoch(config.training["batch_size"], rng):
            state, metrics = step_fn(
                state, to_device(batch), jax.random.fold_in(base_key, step)
            )
            step += 1
            if step % 50 == 0:
                print(
                    f"[tdsval train] step {step} "
                    f"loss={float(metrics['weighted_loss']):.4f}",
                    flush=True,
                )
            if step >= n_steps:
                break
        epoch += 1

    name_dir = os.path.join(workdir, "results", "tdsval")
    save_params(
        os.path.join(name_dir, "checkpoints", "epoch.0.ckpt"),
        jax.device_get(state.params),
    )
    with open(os.path.join(name_dir, "configuration"), "w") as f:
        f.write("name tdsval\n")
        for k, v in CONFIG_LINES.items():
            f.write(f"{k} {v}\n")


def write_motif_dir(workdir: str) -> str:
    """MotifBench-style target dir with the planted fragment as problem 0."""
    motif_dir = os.path.join(workdir, "motifs")
    os.makedirs(motif_dir, exist_ok=True)
    frag = motif_fragment()
    with open(os.path.join(motif_dir, "0_planted.pdb"), "w") as f:
        f.write("HEADER    tdsval\nTITLE     planted\n")
        f.write(f"REMARK    planted : {LENGTH}\n")
        for i, (x, y, z) in enumerate(frag):
            f.write(
                f"ATOM  {i+1:5d}  CA  ALA A{i+1:4d}    "
                f"{x:8.3f}{y:8.3f}{z:8.3f}\n"
            )
        f.write("TER\n")
    return motif_dir


def best_placement_rmsd(coords: np.ndarray, frag: np.ndarray) -> float:
    """min over contiguous placements of RMSD(center(window), fragment)."""
    best = math.inf
    m = len(frag)
    for s in range(len(coords) - m + 1):
        w = coords[s : s + m]
        w = w - w.mean(0, keepdims=True)
        r = float(np.sqrt(((w - frag) ** 2).sum(-1).mean()))
        best = min(best, r)
    return best


def _pdb_coords(path: str) -> np.ndarray:
    from genie2_tpu.features import parse_pdb

    _, coords = parse_pdb(path)
    return np.concatenate(coords, axis=0)


def run_validation(
    workdir: str,
    n_train_steps: int = 300,
    n_seeds: int = 5,
    n_particles: int = 4,
    rmsd_threshold: float = 1.5,
) -> dict:
    from genie2_tpu.sampling import SMCSampler, UnconditionalSampler
    from genie2_tpu.utils.model_io import load_pretrained_model

    os.makedirs(workdir, exist_ok=True)
    train_model(workdir, n_train_steps)
    motif_dir = write_motif_dir(workdir)
    frag = motif_fragment()
    rootdir = os.path.join(workdir, "results")
    model, params, config = load_pretrained_model(rootdir, "tdsval", 0)

    # --- bench_tds.sh-shaped TDS workload: per-seed runs, manifests ---
    smc = SMCSampler(model, params, config)
    smc.untwist_below = 5
    tds_rmsds = []
    for seed in range(n_seeds):
        rundir = os.path.join(workdir, "raw", f"m0_r{seed + 1}")
        smc.dump_trajectory_every = 10 if seed == 0 else None
        smc.sample(
            {
                "scale": 1.0,
                "outdir": rundir,
                "num_samples": n_particles,
                "prefix": "0",
                "offset": 0,
                "motif_index": 0,
                "motif_dir": motif_dir,
                "seed": seed,
            }
        )
        for i in range(n_particles):
            tds_rmsds.append(
                best_placement_rmsd(
                    _pdb_coords(os.path.join(rundir, "pdbs", f"0_{i}.pdb")), frag
                )
            )

    # --- untwisted control: plain ancestral sampling, same model ---
    unc = UnconditionalSampler(model, params, config)
    ctl_dir = os.path.join(workdir, "control")
    unc.sample(
        {
            "scale": 1.0,
            "outdir": ctl_dir,
            "num_samples": n_seeds * n_particles,
            "batch_size": n_particles,
            "length": LENGTH,
            "prefix": str(LENGTH),
            "offset": 0,
            "seed": 0,
        }
    )
    ctl_rmsds = [
        best_placement_rmsd(
            _pdb_coords(os.path.join(ctl_dir, "pdbs", f"{LENGTH}_{i}.pdb")), frag
        )
        for i in range(n_seeds * n_particles)
    ]

    # --- trajectory improvement from the seed-0 x0 snapshot dumps ---
    dump_dir = os.path.join(workdir, "raw", "m0_r1", "test")
    steps = sorted(
        int(f.split("_")[-1].split(".")[0])
        for f in os.listdir(dump_dir)
        if f.startswith("x0_predicted_test_")
    )
    traj = {
        step: best_placement_rmsd(
            _pdb_coords(os.path.join(dump_dir, f"x0_predicted_test_{step}.pdb")), frag
        )
        for step in steps
    }

    tds_rmsds = np.asarray(tds_rmsds)
    ctl_rmsds = np.asarray(ctl_rmsds)
    result = {
        "n_train_steps": n_train_steps,
        "n_seeds": n_seeds,
        "n_particles": n_particles,
        "tds_rmsd_mean": float(tds_rmsds.mean()),
        "tds_rmsd_min": float(tds_rmsds.min()),
        "control_rmsd_mean": float(ctl_rmsds.mean()),
        "control_rmsd_min": float(ctl_rmsds.min()),
        "rmsd_threshold": rmsd_threshold,
        "tds_recovery": float((tds_rmsds < rmsd_threshold).mean()),
        "control_recovery": float((ctl_rmsds < rmsd_threshold).mean()),
        # step -> best-placement RMSD of the x0 prediction (descending step
        # = forward in the reverse trajectory).
        "trajectory_rmsd": {str(k): float(v) for k, v in traj.items()},
        "manifests": sorted(
            f
            for f in os.listdir(os.path.join(workdir, "raw", "m0_r1"))
            if f.endswith(".csv") or f.endswith(".txt")
        ),
    }
    return result


if __name__ == "__main__":
    import tempfile

    workdir = tempfile.mkdtemp(prefix="tdsval_")
    result = run_validation(
        workdir,
        n_train_steps=int(os.environ.get("TDSVAL_TRAIN_STEPS", "300")),
        n_seeds=int(os.environ.get("TDSVAL_SEEDS", "5")),
    )
    print(json.dumps(result, indent=2), flush=True)
    out = os.environ.get("TDSVAL_JSON")
    if out:
        with open(out, "w") as f:
            json.dump(result, f, indent=2)
    sys.stdout.flush()
    os._exit(0)
