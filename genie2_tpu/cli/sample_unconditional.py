"""Unconditional sampling CLI.

Counterpart of /root/reference/genie/sample_unconditional.py (same flags,
same output layout `{outdir}/pdbs/{length}_{offset+i}.pdb`). The reference
fans tasks out one-OS-process-per-GPU (utils/multiprocessor.py); here a
single process drives all devices: --num_devices builds a 1-D data mesh,
params are replicated, and each batch of samples is sharded across the
mesh data axis. Per-sample RNG makes sharded outputs bit-identical to
single-device outputs (tests/test_cli.py). Lengths are iterated max->min
(shuffled unless --sequential_order, matching README.md:90).
"""

from __future__ import annotations

import argparse
import random

import jax


def run_packed(args, model, params, config, mesh=None):
    """--pack: fill every batch with samples of (possibly) different target
    lengths grouped by padding bucket — no ragged batches at sweep edges."""
    from genie2_tpu.sampling import PackedUnconditionalSampler
    from genie2_tpu.sampling.base import bucket_length

    sampler = PackedUnconditionalSampler(model, params, config, mesh=mesh)
    tasks = [
        (length, i)
        for length in range(args.max_length, args.min_length - 1, -args.length_step)
        for i in range(args.num_samples)
    ]
    tasks.sort(key=lambda t: (bucket_length(t[0], sampler.bucket), t[0], t[1]))

    for start in range(0, len(tasks), args.batch_size):
        chunk = tasks[start : start + args.batch_size]
        sampler.sample(
            {
                "scale": args.scale,
                "outdir": args.outdir,
                "num_samples": len(chunk),
                "prefix": "packed",
                "offset": start,
                "lengths": [l for l, _ in chunk],
                "names": [f"{l}_{i}" for l, i in chunk],
                "seed": args.seed,
                "ddim_steps": getattr(args, "ddim_steps", 0),
                "ddim_eta": getattr(args, "ddim_eta", 0.0),
                "ddim_eta_switch_t": getattr(args, "ddim_eta_switch_t", 0),
                "dpm_steps": getattr(args, "dpm_steps", 0),
                "dump_trajectory_every": getattr(args, "dump_trajectory_every", 0),
                "fast_spacing": getattr(args, "fast_spacing", "uniform"),
            }
        )
    print(f"packed sweep: {len(tasks)} samples done", flush=True)


def run_tasks(args):
    from genie2_tpu.parallel import mesh_from_arg
    from genie2_tpu.sampling import UnconditionalSampler
    from genie2_tpu.utils.model_io import load_pretrained_model

    mesh = mesh_from_arg(
        args.num_devices, getattr(args, "mesh_seq", 1),
        getattr(args, "mesh_model", 1),
    )
    model, params, config = load_pretrained_model(
        args.rootdir, args.name, args.epoch, ema=getattr(args, "ema", False),
        mesh=mesh,
    )
    if args.pack:
        return run_packed(args, model, params, config, mesh=mesh)
    sampler = UnconditionalSampler(model, params, config, mesh=mesh)

    lengths = list(range(args.max_length, args.min_length - 1, -args.length_step))
    if not args.sequential_order:
        random.seed(0)
        random.shuffle(lengths)

    for length in lengths:
        remaining = args.num_samples
        offset = 0
        while remaining > 0:
            batch = min(args.batch_size, remaining)
            sampler.sample(
                {
                    "scale": args.scale,
                    "outdir": args.outdir,
                    "num_samples": batch,
                    "prefix": str(length),
                    "offset": offset,
                    "length": length,
                    "seed": args.seed,
                    "ddim_steps": getattr(args, "ddim_steps", 0),
                    "ddim_eta": getattr(args, "ddim_eta", 0.0),
                    "ddim_eta_switch_t": getattr(args, "ddim_eta_switch_t", 0),
                    "dpm_steps": getattr(args, "dpm_steps", 0),
                    "dump_trajectory_every": getattr(args, "dump_trajectory_every", 0),
                    "fast_spacing": getattr(args, "fast_spacing", "uniform"),
                }
            )
            offset += batch
            remaining -= batch
        print(f"length {length}: {args.num_samples} samples done", flush=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--name", type=str, required=True, help="Model name")
    parser.add_argument("--epoch", type=int, required=True, help="Model epoch")
    parser.add_argument("--rootdir", type=str, default="results", help="Root directory")
    parser.add_argument("--scale", type=float, required=True, help="Sampling noise scale")
    parser.add_argument("--outdir", type=str, required=True, help="Output directory")
    parser.add_argument("--num_samples", type=int, default=5, help="Samples per length")
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--min_length", type=int, default=50)
    parser.add_argument("--max_length", type=int, default=256)
    parser.add_argument("--length_step", type=int, default=1)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--ema", action="store_true",
                        help="Sample from the weight-EMA checkpoint "
                             "(epoch.{E}.ema.ckpt; no reference counterpart)")
    parser.add_argument("--mesh_seq", type=int, default=1,
                        help="Sequence-shard each sample's pair tensor over "
                             "this many devices (2-D ('data','seq') mesh; "
                             "long-context inference past one chip's HBM)")
    parser.add_argument("--mesh_model", type=int, default=1,
                        help="Tensor-parallel the weights over this many "
                             "devices (composes with --mesh_seq into a 3-D "
                             "('data','seq','model') mesh; outputs "
                             "allclose but not bit-identical to 1-device — "
                             "psum reduction order)")
    parser.add_argument("--num_devices", type=int, default=-1,
                        help="Total devices for the mesh (-1 = all, 1 = no "
                             "sharding); sample batches shard over the data "
                             "axis (data size = num_devices / mesh_seq)")
    parser.add_argument("--sequential_order", action="store_true",
                        help="Run in decreasing order of length")
    parser.add_argument("--pack", action="store_true",
                        help="Pack mixed lengths into full bucket-grouped batches")
    parser.add_argument("--ddim_steps", type=int, default=0,
                        help="Accelerated DDIM sampling with this many steps "
                             "(0 = full ancestral DDPM; no reference counterpart)")
    parser.add_argument("--ddim_eta_switch_t", type=int, default=0,
                        help="Hybrid DDIM stochasticity: deterministic "
                             "(eta=0) while t > this, --ddim_eta (default "
                             "1) at or below — ancestral-like noise only "
                             "on the final steps (0 = off)")
    parser.add_argument("--ddim_eta", type=float, default=0.0,
                        help="DDIM stochasticity (0 = deterministic ODE)")
    parser.add_argument("--dpm_steps", type=int, default=0,
                        help="Accelerated DPM-Solver++(2M) sampling with this "
                             "many steps (second-order, deterministic; "
                             "mutually exclusive with --ddim_steps)")
    parser.add_argument("--dump_trajectory_every", type=int, default=0,
                        help="Write x_t snapshot PDBs every K steps to "
                             "outdir/test/ (full-DDPM path only)")
    parser.add_argument("--fast_spacing", choices=("uniform", "sqrt"),
                        default="uniform",
                        help="Step spacing for --ddim_steps/--dpm_steps: "
                             "sqrt concentrates steps at high noise "
                             "(more robust on weaker models)")
    run_tasks(parser.parse_args())


if __name__ == "__main__":
    main()
