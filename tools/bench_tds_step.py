"""TDS step-cost breakdown on the real chip (VERDICT round-3 item 4).

Measures, at the reference's TDS benchmark shape (L=75 bucketed to 96,
P=4 particles, O~1000 placements, bash_run.bash:6-18 /
unconditional_smc.py:401):

  1. denoiser forward alone;
  2. forward+backward through the twisting potential (the TDS core);
  3. the full TDS scan step (weights + resampling + trace);
  each for remat on/off and bf16/fp32.

The round-2 state was 13.8 ms/step bf16 (14.5 fp32) with the training
remat policy inherited by the TDS gradient. Remat trades recompute for
memory — mandatory at L=256 training (HBM spill cliff) but pure overhead
if the L=96 backward fits; this probe measures that directly.

Usage: python tools/bench_tds_step.py [length] [particles] [offsets]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.sum(x))


def main():
    from genie2_tpu.config import Config
    from genie2_tpu.diffusion import Schedule
    from genie2_tpu.features import batchify, create_empty_features, to_device
    from genie2_tpu.geometry import Rigid, frenet_frames
    from genie2_tpu.nn import Denoiser
    from genie2_tpu.nn.policy import make_apply_fn
    from genie2_tpu.sampling.smc import _tds_segment
    from genie2_tpu.sampling.twisting import (
        enumerate_motif_placements,
        placements_to_positions,
        twisting_log_prob,
        xstart_variance,
    )

    length = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    P = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    max_off = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
    n_steps = 200

    seg_lens = [5, 3, 3]
    placements = enumerate_motif_placements(length, seg_lens, max_offsets=max_off)
    positions = jnp.asarray(placements_to_positions(placements))
    motif_target = jnp.asarray(
        np.random.default_rng(0).normal(size=(sum(seg_lens), 3)).astype(np.float32)
    )
    print(f"L={length} P={P} O={len(placements)} steps/dispatch={n_steps}")

    schedule = Schedule.create(1000)
    feats = to_device(batchify([create_empty_features([length]) for _ in range(P)]))

    for dtype in ("bf16", "fp32"):
        for remat in (True, False):
            config = Config(
                overrides={
                    "maximumNumResidues": length,
                    "computeDtype": dtype,
                    "remat": str(remat),
                }
            )
            model = Denoiser.from_config(config)
            assert model.remat == remat

            trans0 = jax.random.normal(
                jax.random.PRNGKey(0), (P, length, 3), jnp.float32
            )
            rots0 = frenet_frames(trans0, feats["chain_index"], feats["residue_mask"])
            t0 = jnp.full((P,), 1000, jnp.int32)
            params = model.init(jax.random.PRNGKey(1), Rigid(rots0, trans0), t0, feats)
            apply_fn = make_apply_fn(model, dtype)

            # --- forward alone
            @jax.jit
            def fwd(trans):
                rots = frenet_frames(
                    trans, feats["chain_index"], feats["residue_mask"]
                )
                return apply_fn(params, Rigid(rots, trans), t0, feats)["z"]

            sync(fwd(trans0))
            t = time.perf_counter()
            for _ in range(50):
                sync(fwd(trans0))
            fwd_ms = (time.perf_counter() - t) / 50 * 1e3

            # --- fwd+bwd through the twisting potential
            def potential(trans):
                rots = frenet_frames(
                    trans, feats["chain_index"], feats["residue_mask"]
                )
                eps = apply_fn(params, Rigid(rots, trans), t0, feats)["z"]
                x0 = (
                    trans
                    - schedule.sqrt_one_minus_alphas_cumprod[t0][:, None, None] * eps
                ) / schedule.sqrt_alphas_cumprod[t0][:, None, None]
                lp, _ = twisting_log_prob(
                    x0, positions, motif_target, xstart_variance(0.5, 0.012)
                )
                return jnp.sum(lp)

            gradf = jax.jit(jax.grad(potential))
            sync(gradf(trans0))
            t = time.perf_counter()
            for _ in range(50):
                sync(gradf(trans0))
            grad_ms = (time.perf_counter() - t) / 50 * 1e3

            # --- full TDS scan step
            log_proposal = jnp.zeros((P,), jnp.float32)
            log_w = jnp.zeros((P,), jnp.float32)
            carry = (trans0, log_proposal, log_w, jax.random.PRNGKey(2))
            steps = jnp.arange(1000, 1000 - n_steps, -1)

            def run():
                out_carry, trace, score, _ = _tds_segment(
                    apply_fn, params, schedule, feats, positions, motif_target,
                    carry, steps, jnp.float32(1.0),
                )
                return sync(out_carry[0])

            run()  # compile
            t = time.perf_counter()
            run()
            step_ms = (time.perf_counter() - t) / n_steps * 1e3

            print(
                f"dtype={dtype} remat={int(remat)}: fwd {fwd_ms:6.2f} ms, "
                f"fwd+bwd {grad_ms:6.2f} ms, full TDS step {step_ms:6.2f} ms"
            )

    os._exit(0)


if __name__ == "__main__":
    main()
