"""Twisted Diffusion Sampler (TDS) / SMC motif scaffolding with unknown
motif placement.

Behavioral counterpart of the production SMC sampler
(/root/reference/genie/sampler/unconditional_smc.py:43-584): particles are
the batch axis; each reverse step computes the twisting potential
log p~(y | x_t) by marginalizing the placed-and-centered x-start prediction
over all candidate motif placements, takes its gradient THROUGH the entire
denoiser w.r.t. x_t (jax.grad — the reason the fork made distance bins soft
and removed rotation-gradient stops), norm-caps it, twists the posterior
mean, accumulates importance weights, and systematically resamples when the
effective sample size drops below a threshold.

The whole 1000-step loop (forward + backward through the denoiser per step,
weights, data-dependent resampling as a where-selected gather) is ONE jitted
lax.scan.
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Any, Callable, Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from genie2_tpu.diffusion import Schedule
from genie2_tpu.features import (
    batchify,
    create_empty_features,
    debatchify,
    save_features_to_pdb,
    to_device,
    to_host,
)
from genie2_tpu.geometry import Rigid, frenet_frames
from genie2_tpu.sampling.base import BaseSampler
from genie2_tpu.sampling.motif_target import load_motif_target
from genie2_tpu.sampling.resampling import (
    ess_from_log_weights,
    normalize_log_weights,
    systematic_resample_indices,
)
from genie2_tpu.sampling.twisting import (
    enumerate_motif_placements,
    motif_distance,
    motif_frame_rotations,
    placements_to_positions,
    twisting_log_prob,
    twisting_log_prob_frames,
    xstart_variance,
)

_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


def _log_normal(x, mean, var):
    return -0.5 * ((x - mean) ** 2) / var - 0.5 * jnp.log(var) - _LOG_SQRT_2PI


class TDSTrace(NamedTuple):
    """Per-step monitoring (the reference logs these to wandb)."""

    ess: jnp.ndarray            # [T]
    resampled: jnp.ndarray      # [T] bool
    motif_dist: jnp.ndarray     # [T]
    best_placement: jnp.ndarray  # [T] argmax offset for particle 0


@partial(
    jax.jit,
    static_argnames=(
        "apply_fn",
        "untwist_below",
        "ess_frac",
        "proposal",
        "score_grad_cap",
    ),
)
def _tds_segment(
    apply_fn: Callable,
    params,
    schedule: Schedule,
    features: Dict[str, Any],
    positions: jnp.ndarray,
    motif_target: jnp.ndarray,
    carry,
    steps: jnp.ndarray,
    scale: jnp.ndarray,
    untwist_below: int = 50,
    grad_alpha: float = 0.012,
    tausq: float = 0.012,
    ess_frac: float = 0.5,
    motif_rots: Optional[jnp.ndarray] = None,
    rot_mask: Optional[jnp.ndarray] = None,
    rot_tausq: float = 0.1,
    proposal: str = "posterior",
    score_grad_cap: float = 0.0,
):
    """One jitted scan segment of the twisted SMC reverse trajectory.
    carry = (trans, log_proposal, log_w_acc, key).

    With `motif_rots`/`rot_mask` set, the potential gains the SO(3)
    rotation term (Frenet frames of x-hat-0 vs the motif's frames,
    Frobenius tangent-normal — the capability of the reference's vendored
    twisting.py:198-273); jax.grad flows through the frame computation, so
    the twisted proposal also conditions on motif ORIENTATION, which
    translation-only TDS cannot.

    `proposal` selects where the twisting gradient enters the proposal
    mean (both use the same DDPM posterior mean mu_t when untwisted):

      "posterior" (production, unconditional_smc.py:497-504):
          mu + coef1 * normcap(g)    — gradient twists x-hat-0.
      "score" (the dev formulation, smc_sampler_new_new.py:745-771:
          twisted score -eps/sqrt(1-abar) + g/var added to the
          reparameterized transition, i.e. mu + (beta/sqrt(alpha)) g/var,
          where g is the MEAN-over-particles gradient of the dev log-prob
          — whose variance is 1 - abar_t (:449), not the type-6 var the
          FK weights use — and no norm cap, the reference commented it
          out):
          the same algorithm with a different, t-dependent gradient
          scaling. Unlike the reference's dev sampler (which dropped its
          importance weights, wk=None), both proposals here keep the full
          FK weight/resampling machinery — the weights only need the
          proposal mean actually sampled from, so the SMC stays exact."""
    n_particles = features["residue_mask"].shape[0]
    shape = (*features["residue_mask"].shape, 3)
    mask = features["residue_mask"].astype(jnp.float32)[..., None]

    def potential(x, t_vec, var, rot_var, grad_var=None):
        """Scalar grad target + aux. `var` is the var-type-6 x-start
        variance the FK WEIGHTS always use (unconditional_smc.py:536-552).
        `grad_var` (score proposal only) is the variance of the log-prob
        the GRADIENT is taken through — the dev twisting_function uses
        1 - abar_t, not the type-6 var (smc_sampler_new_new.py:449)."""
        rots = frenet_frames(x, features["chain_index"], features["residue_mask"])
        eps = apply_fn(params, Rigid(rots, x), t_vec, features)["z"]
        x0 = (
            x - schedule.sqrt_one_minus_alphas_cumprod[t_vec][:, None, None] * eps
        ) / schedule.sqrt_alphas_cumprod[t_vec][:, None, None]
        gvar = var if grad_var is None else grad_var
        if motif_rots is None:
            log_prob_g, score_g = twisting_log_prob(
                x0, positions, motif_target, gvar
            )
            if grad_var is None:
                log_prob, score = log_prob_g, score_g
            else:
                log_prob, score = twisting_log_prob(
                    x0, positions, motif_target, var
                )
        else:
            rots0 = frenet_frames(
                x0, features["chain_index"], features["residue_mask"]
            )
            log_prob_g, score_g = twisting_log_prob_frames(
                x0, rots0, positions, motif_target, gvar,
                motif_rots, rot_mask, rot_var,
            )
            if grad_var is None:
                log_prob, score = log_prob_g, score_g
            else:
                log_prob, score = twisting_log_prob_frames(
                    x0, rots0, positions, motif_target, var,
                    motif_rots, rot_mask, rot_var,
                )
        return jnp.sum(log_prob_g), (x0, log_prob, score)

    def body(carry, t):
        trans, log_proposal, log_w_acc, key = carry
        t_vec = jnp.full((n_particles,), t, dtype=jnp.int32)
        var = xstart_variance(schedule.alphas_cumprod[t], tausq)
        rot_var = xstart_variance(schedule.alphas_cumprod[t], rot_tausq)

        # Twisting gradient through the whole denoiser
        # (unconditional_smc.py:467-484: grad of mean * P == grad of sum).
        # The score proposal grads the DEV log-prob (variance 1 - abar_t,
        # smc_sampler_new_new.py:449) while the aux log_prob/score keep
        # the type-6 variance for the FK weights and placement inference.
        grad_var = (
            schedule.one_minus_alphas_cumprod[t] if proposal == "score" else None
        )
        grad, (x0, log_prob, score) = jax.grad(potential, has_aux=True)(
            trans, t_vec, var, rot_var, grad_var
        )

        coef1 = (
            schedule.sqrt_alphas_cumprod_prev[t]
            * schedule.betas[t]
            / schedule.one_minus_alphas_cumprod[t]
        )
        coef2 = (
            schedule.sqrt_alphas[t]
            * (1.0 - schedule.alphas_cumprod_prev[t])
            / schedule.one_minus_alphas_cumprod[t]
        )
        mean_untwisted = coef1 * x0 + coef2 * trans

        if proposal == "score":
            # Dev score formulation (smc_sampler_new_new.py:745-771):
            # mu + (beta/sqrt(alpha)) * g/var with g = grad of the MEAN
            # over particles of the dev log-prob (no rescale-by-P — unlike
            # the production sampler's :483-484 — and no norm cap: the
            # reference commented it out). grad above is of the sum, so
            # divide by P.
            delta = (schedule.betas[t] / schedule.sqrt_alphas[t]) * (
                grad / (var * n_particles)
            )
            if score_grad_cap:
                # The dev reference COMMENTED OUT its norm cap
                # (smc_sampler_new_new.py:745-771) and the faithful
                # uncapped form DIVERGES at flagship scale within ~2
                # steps (round-5 campaign, artifacts/campaign_r5/
                # smc_score_trace_DIVERGED.jsonl: motif_dist 1e11 at
                # step 1). Optional soft norm bound |delta| < cap;
                # 0 (default) keeps the dev-faithful behavior.
                dnorm = jnp.linalg.norm(delta)
                delta = delta * (score_grad_cap / (score_grad_cap + dnorm))
        else:
            # Production: norm-capped g twists x-hat-0,
            # g <- g * a|g| / (a + |g|) (unconditional_smc.py:485-490).
            norm = jnp.linalg.norm(grad)
            delta = coef1 * grad * grad_alpha * norm / (grad_alpha + norm)

        # Untwisted tail below `untwist_below` for stability (:491-495).
        mean_twisted = mean_untwisted + jnp.where(t >= untwist_below, delta, 0.0)

        key, noise_key, resample_key = jax.random.split(key, 3)
        noise = jax.random.normal(noise_key, shape, dtype=jnp.float32)
        sigma = schedule.sqrt_betas[t]
        proposed = (mean_twisted + scale * sigma * noise) * mask

        # Importance weights (:536-552).
        sigmasq = sigma**2
        log_reverse = jnp.sum(_log_normal(proposed, mean_untwisted, sigmasq), axis=(1, 2))
        log_twisted = jnp.sum(_log_normal(proposed, mean_twisted, sigmasq), axis=(1, 2))
        log_target = log_reverse + log_prob - log_twisted
        log_w = log_target - log_proposal
        log_w_new = log_w + log_w_acc

        ess = ess_from_log_weights(log_w_new)
        do_resample = ess < ess_frac * n_particles

        # Resample branch (always computed; where-selected) (:560-567).
        weights = jax.nn.softmax(log_w_new)
        idx = systematic_resample_indices(weights, resample_key)
        identity = jnp.arange(n_particles)
        sel = jnp.where(do_resample, idx, identity)

        next_trans = jnp.where(t > 1, proposed[sel], mean_twisted)
        log_proposal_next = log_prob[sel]
        log_w_acc_next = jnp.where(
            do_resample,
            jnp.zeros_like(log_w_new),
            normalize_log_weights(log_w_new) + jnp.log(float(n_particles)),
        )
        # At t == 1 the reference skips the weight update entirely.
        log_w_acc_next = jnp.where(t > 1, log_w_acc_next, log_w_acc)
        log_proposal_next = jnp.where(t > 1, log_proposal_next, log_proposal)

        trace = (
            ess,
            do_resample & (t > 1),
            motif_distance(x0, positions, motif_target),
            jnp.argmax(score[0]),
        )
        return (next_trans, log_proposal_next, log_w_acc_next, key), (
            trace,
            score,
            x0,
            next_trans,
        )

    carry, ((ess, resampled, dist, best), scores, x0s, xts) = jax.lax.scan(
        body, carry, steps
    )
    return carry, TDSTrace(ess, resampled, dist, best), scores[-1], (x0s, xts)


def tds_sample(
    apply_fn: Callable,
    params,
    schedule: Schedule,
    features: Dict[str, Any],
    positions: jnp.ndarray,
    motif_target: jnp.ndarray,
    key: jax.Array,
    scale: jnp.ndarray,
    n_timestep: int,
    untwist_below: int = 50,
    grad_alpha: float = 0.012,
    tausq: float = 0.012,
    ess_frac: float = 0.5,
    steps_per_dispatch: Optional[int] = 100,
    record_every: Optional[int] = None,
    motif_rots: Optional[jnp.ndarray] = None,
    rot_mask: Optional[jnp.ndarray] = None,
    rot_tausq: float = 0.1,
    proposal: str = "posterior",
    score_grad_cap: float = 0.0,
):
    """Run the full twisted SMC reverse trajectory, segmented into bounded
    dispatches (the step includes a full backward pass; long single
    dispatches can trip runtime watchdogs).

    Returns (final translations [P, L, 3], final per-placement scores
    [P, O], TDSTrace over all steps, snapshots). When `record_every` is set,
    snapshots is a dict {step: (x0 [P,L,3], xt [P,L,3])} every
    `record_every` steps — the reference's trajectory-dump capability
    (smc_sampler_new_new.py:802-812), recovered from scan outputs instead of
    per-step host writes.
    """
    import numpy as np

    if proposal not in ("posterior", "score"):
        raise ValueError(
            f"proposal must be 'posterior' or 'score', got {proposal!r}"
        )
    n_particles = features["residue_mask"].shape[0]
    shape = (*features["residue_mask"].shape, 3)

    key, init_key = jax.random.split(key)
    trans = jax.random.normal(init_key, shape, dtype=jnp.float32)
    # Proposal density of x_T under N(0, I) (unconditional_smc.py:419-432).
    log_proposal = jnp.sum(-0.5 * (math.log(2 * math.pi) + trans**2), axis=(1, 2))
    log_w_acc = jnp.zeros((n_particles,), jnp.float32)
    carry = (trans, log_proposal, log_w_acc, key)

    all_steps = np.arange(n_timestep, 0, -1)
    k = steps_per_dispatch or n_timestep
    traces = []
    final_score = None
    snapshots = {}
    for i in range(0, n_timestep, k):
        seg_np = all_steps[i : i + k]
        seg = jnp.asarray(seg_np)
        carry, trace, final_score, (x0s, xts) = _tds_segment(
            apply_fn,
            params,
            schedule,
            features,
            positions,
            motif_target,
            carry,
            seg,
            scale,
            untwist_below=untwist_below,
            grad_alpha=grad_alpha,
            score_grad_cap=score_grad_cap,
            tausq=tausq,
            ess_frac=ess_frac,
            motif_rots=motif_rots,
            rot_mask=rot_mask,
            rot_tausq=rot_tausq,
            proposal=proposal,
        )
        traces.append(trace)
        if record_every:
            keep = seg_np % record_every == 0
            if keep.any():
                x0_host = np.asarray(x0s[keep])
                xt_host = np.asarray(xts[keep])
                for j, step in enumerate(seg_np[keep].tolist()):
                    snapshots[int(step)] = (x0_host[j], xt_host[j])
    trace = TDSTrace(*(jnp.concatenate(parts) for parts in zip(*traces)))
    return carry[0], final_score, trace, snapshots


class SMCSampler(BaseSampler):
    """Host orchestration: load a MotifBench problem, enumerate placements,
    run the jitted TDS scan, save designs + the inferred motif placement
    (`motif_location.txt`, unconditional_smc.py:334-343)."""

    def setup(self):
        self.add_required_parameter("motif_index")
        self.add_required_parameter("motif_dir")
        self.max_offsets = 1000
        self.untwist_below = 50
        # Below this padded length the TDS gradient runs with pair-stack
        # remat OFF: the backward fits in HBM and remat is pure recompute
        # overhead (measured 13.75 -> 9.47 ms/step at L=96, P=4, O=1000,
        # bf16 — tools/bench_tds_step.py / BENCH_NOTES.md round 3). Remat
        # stays on for long problems, where the L=256-class backward
        # spills without it.
        self.no_remat_below = 128
        # Set to e.g. 50 to dump x0/xt PDB snapshots (the reference's
        # test/ fixtures, smc_sampler_new_new.py:802-812).
        self.dump_trajectory_every = None
        self._rng = np.random.default_rng(0)

    def on_sample_start(self, params: Dict[str, Any]):
        os.makedirs(os.path.join(params["outdir"], "pdbs"), exist_ok=True)

    def create_np_features(self, params: Dict[str, Any]):
        return create_empty_features([params["length"]])

    def _sample(self, params: Dict[str, Any], key: Optional[jax.Array] = None):
        if key is None:
            key = jax.random.PRNGKey(int(params.get("seed", 0)) + int(params["offset"]))

        segments, protein_length = load_motif_target(
            params["motif_index"], params["motif_dir"]
        )
        params["length"] = protein_length
        motif_target = np.concatenate(segments, axis=0)

        # Optional SO(3) rotation twisting: condition on motif ORIENTATION
        # as well as position (the reference's vendored twisting.py
        # capability, never runnable upstream; off by default for parity
        # with the production sampler's translation-only potential).
        motif_rots = rot_mask = None
        if params.get("twist_rotations"):
            rots_np, mask_np = motif_frame_rotations(segments)
            motif_rots = jnp.asarray(rots_np)
            rot_mask = jnp.asarray(mask_np)

        placements = enumerate_motif_placements(
            protein_length,
            [len(s) for s in segments],
            max_offsets=self.max_offsets,
            rng=self._rng,
        )
        self._placements = placements
        positions = jnp.asarray(placements_to_positions(placements))

        host_features = [
            self.create_np_features(params) for _ in range(params["num_samples"])
        ]
        features = to_device(batchify([dict(f) for f in host_features]))
        # Particles interact through resampling, so the particle axis is
        # sharded over the mesh (XLA inserts the gather/softmax collectives)
        # rather than padded. Placements and resampling decisions match
        # single-device exactly; coordinates agree to collective-reduction-
        # order tolerance (~1e-6 — the global grad-norm cap and ESS
        # logsumexp are genuine cross-particle reductions, so bit-identity
        # is not achievable, unlike the independent-sample CLIs)
        # (tests/test_smc.py::test_mesh_sharded_tds_matches_single_device).
        # Unlike independent-sample batches, a particle cannot be a padded
        # dummy (it would join the resampling population), so a
        # non-divisible particle count is an error, not a silent fallback.
        if self.mesh is not None:
            n_particles = params["num_samples"]
            # Particles shard over 'data' only; a ('data','model') TP mesh
            # replicates them over 'model' (weights shard there instead,
            # placed in BaseSampler.__init__), so divisibility is vs the
            # data-axis size, not the total device count.
            from genie2_tpu.parallel import data_axis_size

            n_data = data_axis_size(self.mesh)
            if n_particles % n_data != 0:
                raise ValueError(
                    f"num_particles={n_particles} must be divisible by the "
                    f"mesh 'data' axis ({n_data}) (particles are "
                    "sharded, not padded — they interact through "
                    "resampling); pick a divisible particle count or run "
                    "without --num_devices"
                )
            from genie2_tpu.parallel import shard_batch

            features = shard_batch(features, self.mesh)
        features["static_pair_bias"] = self._static_bias_fn(self.params, features)

        # Short problems run the TDS gradient without pair-stack remat
        # (see setup(): measured 1.45x at the reference benchmark shape).
        # Built once and cached: apply_fn is a static jit argument of the
        # TDS scan, so a fresh closure per sample() call would recompile
        # the whole fwd+bwd program every call (~minutes on this tunnel).
        apply_fn = self.apply_fn
        if self.model.remat and protein_length <= self.no_remat_below:
            if not hasattr(self, "_no_remat_apply_fn"):
                from genie2_tpu.nn.policy import make_apply_fn

                self._no_remat_apply_fn = make_apply_fn(
                    self.model.clone(remat=False), self.compute_dtype,
                    cast_params=False,
                )
            apply_fn = self._no_remat_apply_fn

        trans, final_score, trace, snapshots = tds_sample(
            apply_fn,
            self.params,
            self.schedule,
            features,
            positions,
            jnp.asarray(motif_target),
            key,
            jnp.float32(params["scale"]),
            self.schedule.n_timestep,
            untwist_below=self.untwist_below,
            record_every=self.dump_trajectory_every,
            motif_rots=motif_rots,
            rot_mask=rot_mask,
            rot_tausq=float(params.get("rot_tausq") or 0.1),
            proposal=params.get("proposal") or "posterior",
            score_grad_cap=float(params.get("score_grad_cap") or 0.0),
        )

        self.trace = jax.tree_util.tree_map(np.asarray, trace)
        self.snapshots = snapshots
        score_np = np.asarray(final_score)
        # Per-particle inferred placements (sample i = particle i); particle
        # 0's is the reference's single motif_location.txt value.
        self.final_placements = [
            placements[int(score_np[p].argmax())] for p in range(score_np.shape[0])
        ]
        self.final_placement = self.final_placements[0]
        self._protein_length = protein_length
        from genie2_tpu.sampling.motif_target import load_motif_target_info

        self._seg_info = load_motif_target_info(
            params["motif_index"], params["motif_dir"]
        )

        features = dict(features)
        features.pop("static_pair_bias", None)
        features["atom_positions"] = trans
        return debatchify(to_host(features))

    def on_sample_end(self, params: Dict[str, Any], list_np_features: List[Dict]):
        for i, np_features in enumerate(list_np_features):
            name = f"{params['prefix']}_{params['offset'] + i}"
            save_features_to_pdb(
                np_features, os.path.join(params["outdir"], "pdbs", f"{name}.pdb")
            )
        with open(os.path.join(params["outdir"], "motif_location.txt"), "w") as f:
            for start, end in self.final_placement:
                f.write(f"{start}\t{end}\n")

        # Benchmark manifests (the reference's for_benchmark/ assets,
        # results/test002/for_benchmark/06_6E6R/*.csv).
        from genie2_tpu.sampling.manifest import write_benchmark_manifests

        write_benchmark_manifests(
            params["outdir"],
            pdb_name=params["prefix"],
            length=self._protein_length,
            placements=self.final_placements[: len(list_np_features)],
            seg_info=self._seg_info,
        )

        # Optional trajectory dumps, mirroring the reference's filenames
        # (x0_predicted_test_{step}.pdb / xt_predicted_test_{step}.pdb,
        # particle 0).
        if self.snapshots:
            from genie2_tpu.features import save_coords_to_pdb

            dump_dir = os.path.join(params["outdir"], "test")
            os.makedirs(dump_dir, exist_ok=True)
            n_res = self._protein_length
            for step, (x0, xt) in sorted(self.snapshots.items()):
                for tag, arr in (("x0", x0), ("xt", xt)):
                    save_coords_to_pdb(
                        np.asarray(arr[0][:n_res]),
                        os.path.join(dump_dir, f"{tag}_predicted_test_{step}.pdb"),
                    )
