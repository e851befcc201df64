"""Secondary-structure-guided generation CLI.

No reference counterpart: the reference ships SSE statistic utilities
"for SSE-conditioned SMC" (sampler/secstruct.py:83-97) but no sampler or
driver. This CLI runs the Feynman-Kac particle filter with the
differentiable soft SSE potential (sampling/sse_guided.py): P particles of
one target length, tilted toward the requested helix/strand content,
ESS-triggered systematic resampling, final particles written as PDBs with
their hard P-SEA fractions reported.

    python -m genie2_tpu.cli.sample_sse --name base --epoch 40 \
        --outdir out --length 100 --num_particles 8 --target helix \
        --strength 20
"""

from __future__ import annotations

import argparse
import os


def run(args):
    import jax
    import numpy as np

    from genie2_tpu.diffusion import Schedule
    from genie2_tpu.features import (
        batchify,
        create_empty_features,
        save_features_to_pdb,
        to_device,
    )
    from genie2_tpu.features.secstruct import sec_struct_frac
    from genie2_tpu.nn.policy import make_apply_fn
    from genie2_tpu.parallel import mesh_from_arg
    from genie2_tpu.sampling import soft_sse_fraction, sse_guided_sample
    from genie2_tpu.utils.model_io import load_pretrained_model

    mesh = mesh_from_arg(
        getattr(args, "num_devices", 1), 1, getattr(args, "mesh_model", 1)
    )
    model, params, config = load_pretrained_model(
        args.rootdir, args.name, args.epoch, ema=getattr(args, "ema", False),
        mesh=mesh,
    )
    schedule = Schedule.create(
        config.diffusion["n_timestep"], config.diffusion["schedule"]
    )
    # Pre-cast params once (cast_params=False), as BaseSampler does — a
    # cast inside the FK scan body would re-run every step.
    from genie2_tpu.nn.policy import cast_floating

    dtype = config.tpu.get("compute_dtype", "fp32")
    if dtype in ("bf16", "bfloat16"):
        import jax.numpy as jnp

        params = cast_floating(params, jnp.bfloat16)
    apply_fn = make_apply_fn(model, dtype, cast_params=False)

    feats = to_device(
        batchify(
            [create_empty_features([args.length]) for _ in range(args.num_particles)]
        )
    )
    if mesh is not None:
        # Particle-axis sharding, same contract as the TDS sampler
        # (sampling/smc.py): particles interact through resampling, so
        # they are sharded (XLA inserts the collectives), never padded —
        # a non-divisible particle count is an error.
        from genie2_tpu.parallel import (
            data_axis_size,
            place_params,
            replicate,
            shard_batch,
        )

        # Particles shard over 'data' only; a ('data','model') TP mesh
        # replicates them over 'model' (the weights shard there instead).
        n_data = data_axis_size(mesh)
        if args.num_particles % n_data != 0:
            raise ValueError(
                f"--num_particles {args.num_particles} must be divisible "
                f"by the mesh 'data' axis ({n_data})"
            )
        if "model" in mesh.axis_names:  # size-1 axes are dropped by create_mesh
            params = place_params(params, mesh)
        else:
            params = replicate(params, mesh)
        feats = shard_batch(feats, mesh)
    trans, result = sse_guided_sample(
        apply_fn,
        params,
        schedule,
        feats,
        jax.random.PRNGKey(args.seed),
        args.num_particles,
        target=args.target,
        strength=args.strength,
        scale=args.scale,
        ess_threshold=args.ess_threshold,
    )

    os.makedirs(os.path.join(args.outdir, "pdbs"), exist_ok=True)
    trans_np = np.asarray(trans, np.float32)
    soft = np.asarray(soft_sse_fraction(trans, feats["residue_mask"], args.target))
    for i in range(args.num_particles):
        f = create_empty_features([args.length])
        f["atom_positions"] = trans_np[i]
        save_features_to_pdb(
            f, os.path.join(args.outdir, "pdbs", f"{args.length}_{i}.pdb")
        )
    hard = [sec_struct_frac(trans_np[i])[0 if args.target == "helix" else 1]
            for i in range(args.num_particles)]
    ess = np.asarray(result.ess_trace)
    print(
        f"{args.num_particles} particles, target={args.target} "
        f"strength={args.strength}: soft {args.target} "
        f"mean={soft.mean():.3f} max={soft.max():.3f}; hard P-SEA "
        f"mean={np.mean(hard):.3f}; ess(min/mean)={ess.min():.2f}/"
        f"{ess.mean():.2f} resamples={int(np.asarray(result.resampled_trace).sum())}",
        flush=True,
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--name", type=str, required=True, help="Model name")
    parser.add_argument("--epoch", type=int, required=True, help="Model epoch")
    parser.add_argument("--rootdir", type=str, default="results")
    parser.add_argument("--outdir", type=str, required=True)
    parser.add_argument("--length", type=int, default=100)
    parser.add_argument("--num_particles", type=int, default=8)
    parser.add_argument("--target", choices=("helix", "strand"), default="helix")
    parser.add_argument("--strength", type=float, default=20.0,
                        help="Tempering strength of the SSE potential")
    parser.add_argument("--scale", type=float, default=0.6,
                        help="Reverse-kernel noise temperature (gamma)")
    parser.add_argument("--ess_threshold", type=float, default=0.5,
                        help="Resample when ESS < threshold * P")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--ema", action="store_true",
                        help="Sample from the weight-EMA checkpoint")
    parser.add_argument("--mesh_model", type=int, default=1,
                        help="Tensor-parallel the weights over this many "
                             "devices (('data','model') mesh; particles "
                             "shard over 'data'; outputs allclose but not "
                             "bit-identical to 1-device)")
    parser.add_argument("--num_devices", type=int, default=1,
                        help="Shard the particle axis over an n-device "
                             "mesh (-1 = all devices; particle count must "
                             "be divisible)")
    run(parser.parse_args())


if __name__ == "__main__":
    main()
