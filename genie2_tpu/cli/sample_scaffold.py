"""Motif scaffolding CLI (fixed placement).

Counterpart of /root/reference/genie/sample_scaffold.py: one task per motif
problem PDB in --datadir, outputs under `{outdir}/motif={name}/pdbs` and
`motif_pdbs` (sample_scaffold.py:103-106). `--strength` keeps the
reference's flag but actually works here: strength > 0 applies
classifier-free guidance eps_u + (1+s)(eps_c - eps_u) with the motif masks
zeroed for the unconditional branch (the reference defines the flag and
never uses it, :161; 0 = plain conditional model, one model call/step).
"""

from __future__ import annotations

import argparse
import glob
import os


def run_tasks(args):
    from genie2_tpu.parallel import mesh_from_arg
    from genie2_tpu.sampling import ScaffoldSampler
    from genie2_tpu.utils.model_io import load_pretrained_model

    mesh = mesh_from_arg(
        args.num_devices, getattr(args, "mesh_seq", 1),
        getattr(args, "mesh_model", 1),
    )
    model, params, config = load_pretrained_model(
        args.rootdir, args.name, args.epoch, ema=getattr(args, "ema", False),
        mesh=mesh,
    )
    sampler = ScaffoldSampler(model, params, config, mesh=mesh)

    paths = sorted(glob.glob(os.path.join(args.datadir, "*.pdb")))
    if args.motif_name is not None:
        paths = [p for p in paths if os.path.basename(p)[:-4] == args.motif_name]
    if not paths:
        raise FileNotFoundError(f"no motif problems under {args.datadir}")

    for path in paths:
        motif_name = os.path.basename(path)[:-4]
        outdir = os.path.join(args.outdir, f"motif={motif_name}")
        remaining = args.num_samples
        offset = 0
        while remaining > 0:
            batch = min(args.batch_size, remaining)
            sampler.sample(
                {
                    "scale": args.scale,
                    "outdir": outdir,
                    "num_samples": batch,
                    "prefix": motif_name,
                    "offset": offset,
                    "filepath": path,
                    "strength": getattr(args, "strength", 0),
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
        print(f"motif {motif_name}: {args.num_samples} samples done", flush=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--name", type=str, required=True, help="Model name")
    parser.add_argument("--epoch", type=int, required=True, help="Model epoch")
    parser.add_argument("--rootdir", type=str, default="results", help="Root directory")
    parser.add_argument("--scale", type=float, required=True, help="Sampling noise scale")
    parser.add_argument("--outdir", type=str, required=True, help="Output directory")
    parser.add_argument("--strength", type=float, default=0,
                        help="Classifier-free guidance strength (0 = plain "
                             "conditional; >0 doubles model calls per step)")
    parser.add_argument("--num_samples", type=int, default=100, help="Samples per problem")
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--motif_name", type=str, default=None)
    parser.add_argument("--ddim_steps", type=int, default=0,
                        help="Accelerated DDIM sampling with this many steps "
                             "(0 = full ancestral DDPM; no reference counterpart)")
    parser.add_argument("--ddim_eta_switch_t", type=int, default=0,
                        help="Hybrid DDIM stochasticity: deterministic "
                             "(eta=0) while t > this, --ddim_eta (default "
                             "1) at or below (0 = off)")
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
    parser.add_argument("--datadir", type=str, default="data/design25")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--ema", action="store_true",
                        help="Sample from the weight-EMA checkpoint "
                             "(epoch.{E}.ema.ckpt; no reference counterpart)")
    parser.add_argument("--mesh_seq", type=int, default=1,
                        help="Sequence-shard each sample's pair tensor over "
                             "this many devices (2-D ('data','seq') mesh)")
    parser.add_argument("--mesh_model", type=int, default=1,
                        help="Tensor-parallel the weights over this many "
                             "devices (composes with --mesh_seq into a 3-D "
                             "('data','seq','model') mesh; outputs "
                             "allclose but not bit-identical to 1-device)")
    parser.add_argument("--num_devices", type=int, default=-1,
                        help="Total devices for the mesh (-1 = all, 1 = no "
                             "sharding); sample batches shard over the data "
                             "axis (data size = num_devices / mesh_seq)")
    run_tasks(parser.parse_args())


if __name__ == "__main__":
    main()
