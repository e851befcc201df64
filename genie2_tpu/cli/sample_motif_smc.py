"""TDS/SMC motif scaffolding CLI (unknown placement).

Counterpart of `/root/reference/genie/sample_unconditional_motif copy.py`
(the TDS benchmark driver): one SMC run per --motif_index from a
MotifBench-style --motif_dir (the hard-coded cluster path in
sampler/utils.py:130-133 becomes this flag), 4 particles by default,
outputs `{outdir}/pdbs/*.pdb` + `{outdir}/motif_location.txt`.
"""

from __future__ import annotations

import argparse


def run(args):
    from genie2_tpu.parallel import mesh_from_arg
    from genie2_tpu.sampling import SMCSampler
    from genie2_tpu.utils.model_io import load_pretrained_model

    mesh = mesh_from_arg(
        args.num_devices, getattr(args, "mesh_seq", 1),
        getattr(args, "mesh_model", 1),
    )
    model, params, config = load_pretrained_model(
        args.rootdir, args.name, args.epoch, ema=getattr(args, "ema", False),
        mesh=mesh,
    )
    sampler = SMCSampler(model, params, config, mesh=mesh)
    sampler.max_offsets = args.max_offsets
    if args.dump_trajectory_every:
        sampler.dump_trajectory_every = args.dump_trajectory_every
    sampler.sample(
        {
            "scale": args.scale,
            "outdir": args.outdir,
            "num_samples": args.num_particles,
            "prefix": str(args.motif_index),
            "offset": args.offset,
            "motif_index": args.motif_index,
            "motif_dir": args.motif_dir,
            "seed": args.seed,
            "twist_rotations": getattr(args, "twist_rotations", False),
            "rot_tausq": getattr(args, "rot_tausq", 0.1),
            "proposal": getattr(args, "proposal", "posterior"),
            "score_grad_cap": getattr(args, "score_grad_cap", 0.0),
        }
    )
    import numpy as np

    stream_tds_trace(
        sampler.trace,
        args.outdir,
        n_timestep=config.diffusion["n_timestep"],
        wandb_project=getattr(args, "wandb_project", None),
        run_name=f"motif_{args.motif_index}",
        tensorboard=getattr(args, "tensorboard", False),
        config=vars(args),
    )
    ess = sampler.trace.ess
    print(
        f"motif {args.motif_index}: placement={sampler.final_placement} "
        f"ess(min/mean)={ess.min():.2f}/{ess.mean():.2f} "
        f"resamples={int(sampler.trace.resampled.sum())}",
        flush=True,
    )


def stream_tds_trace(
    trace,
    outdir: str,
    n_timestep: int,
    wandb_project=None,
    run_name=None,
    tensorboard: bool = False,
    config=None,
):
    """Stream a TDSTrace into LoggerSet sinks, one record per reverse step.

    Observability parity with the reference's sampler-side wandb runs
    (unconditional_smc.py:327,558 logs ESS/motif-distance per step from
    inside its Python loop): our loop is one jitted scan, so the whole
    trace materializes at once and is streamed post-hoc — the same
    artifact, ~zero sampling-loop overhead. JSONL is always written to
    {outdir}/logs/metrics.jsonl; wandb/TensorBoard attach opportunistically
    behind flags, exactly like the Trainer."""
    import numpy as np

    from genie2_tpu.utils.loggers import LoggerSet

    loggers = LoggerSet(
        f"{outdir}/logs",
        wandb_project=wandb_project,
        run_name=run_name,
        tensorboard=tensorboard,
        config=config,
    )
    ess = np.asarray(trace.ess)
    resampled = np.asarray(trace.resampled)
    motif_dist = np.asarray(trace.motif_dist)
    placement = np.asarray(trace.best_placement)
    for i in range(len(ess)):
        loggers.log(
            i,
            {
                "t": n_timestep - i,  # reverse loop runs t = T .. 1
                "ess": ess[i],
                "resampled": resampled[i],
                "motif_dist": motif_dist[i],
                "best_placement": placement[i],
            },
            prefix="tds",
        )
    loggers.finish()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--name", type=str, required=True, help="Model name")
    parser.add_argument("--epoch", type=int, required=True, help="Model epoch")
    parser.add_argument("--rootdir", type=str, default="results", help="Root directory")
    parser.add_argument("--scale", type=float, default=1.0, help="Sampling noise scale")
    parser.add_argument("--outdir", type=str, required=True, help="Output directory")
    parser.add_argument("--motif_index", type=int, required=True,
                        help="Index into the MotifBench problem directory")
    parser.add_argument("--motif_dir", type=str, required=True,
                        help="MotifBench-style motif_pdbs directory")
    parser.add_argument("--num_particles", type=int, default=4)
    parser.add_argument("--max_offsets", type=int, default=1000)
    parser.add_argument("--offset", type=int, default=0)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--ema", action="store_true",
                        help="Sample from the weight-EMA checkpoint "
                             "(epoch.{E}.ema.ckpt; no reference counterpart)")
    parser.add_argument("--twist_rotations", action="store_true",
                        help="Add the SO(3) rotation term to the twisting "
                             "potential: condition on motif orientation as "
                             "well as position (Frenet frames of x0-hat vs "
                             "the motif's, tangent-normal approximation)")
    parser.add_argument("--proposal", choices=("posterior", "score"),
                        default="posterior",
                        help="Where the twisting gradient enters the proposal "
                             "mean: 'posterior' = norm-capped gradient twists "
                             "x-hat-0 (the reference's production sampler); "
                             "'score' = raw gradient enters as a twisted "
                             "score on the reparameterized transition (the "
                             "reference's dev formulation, with full SMC "
                             "weights kept)")
    parser.add_argument("--score_grad_cap", type=float, default=0.0,
                        help="Soft norm bound on the score proposal's "
                             "gradient term (0 = off, dev-faithful). The "
                             "uncapped dev formulation diverges at flagship "
                             "scale (the reference commented its own cap "
                             "out); a cap of ~1-10 keeps it finite")
    parser.add_argument("--rot_tausq", type=float, default=0.1,
                        help="tau^2 for the rotation-term x-start variance "
                             "heuristic (with --twist_rotations)")
    parser.add_argument("--dump_trajectory_every", type=int, default=0,
                        help="Dump x0/xt PDB snapshots every K steps (0 = off)")
    parser.add_argument("--mesh_seq", type=int, default=1,
                        help="Sequence-shard each particle's pair tensor over "
                             "this many devices (2-D ('data','seq') mesh)")
    parser.add_argument("--mesh_model", type=int, default=1,
                        help="Tensor-parallel the weights over this many "
                             "devices (composes with --mesh_seq; particles "
                             "shard over 'data'; outputs allclose but not "
                             "bit-identical to 1-device)")
    parser.add_argument("--num_devices", type=int, default=-1,
                        help="Total devices for the mesh (-1 = all, 1 = no "
                             "sharding); particles shard over the data axis "
                             "(data size = num_devices / mesh_seq)")
    parser.add_argument("--wandb_project", type=str, default=None,
                        help="Stream the per-step TDS trace (ESS, motif "
                             "distance, placement) to this wandb project, "
                             "like the reference's sampler-side wandb runs; "
                             "JSONL is always written to {outdir}/logs")
    parser.add_argument("--tensorboard", action="store_true",
                        help="Also write the TDS trace to TensorBoard under "
                             "{outdir}/logs/tb")
    run(parser.parse_args())


if __name__ == "__main__":
    main()
