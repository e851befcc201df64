"""DPM-Solver++(2M): deterministic second-order multistep sampling.

No reference counterpart (the reference only has the 1000-step ancestral
loop, base.py:236-282). Like the DDIM path this runs a K-step subsequence
of the T-step schedule, but each update uses the CURRENT and PREVIOUS
x0-predictions in a second-order log-SNR (lambda) multistep rule (Lu et
al. 2022, "DPM-Solver++", data-prediction 2M variant) — noticeably better
sample fidelity than DDIM at the same aggressive K (10-25 steps), at
identical per-step cost (one denoiser call).

Update from time s (noisier) to t (cleaner), h = lambda_t - lambda_s:

    first order  : x_t = (sigma_t/sigma_s) x_s - alpha_t (e^{-h} - 1) x0_s
    second order : ... - 0.5 alpha_t (e^{-h} - 1) (x0_s - x0_prev)/r,
                   r = (lambda_s - lambda_prev)/h

The first step (no history) and the final step (t = 0, where lambda
diverges; the exact limit is x_0 = x̂0) fall back to first order, matching
the standard lower_order_final practice. First-order here IS the eta=0
DDIM update (substituting e^{-h} = alpha_s sigma_t / (alpha_t sigma_s)
recovers sampling/ddpm.ddim_step_from_eps with eta = 0).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from genie2_tpu.diffusion import Schedule
from genie2_tpu.geometry import Rigid, frenet_frames
from genie2_tpu.sampling.ddpm import (
    DEFAULT_STEPS_PER_DISPATCH,
    ddim_schedule,
    default_sample_ids,
    init_translations,
)


def _alpha_sigma_lambda(schedule: Schedule, t):
    abar = schedule.alphas_cumprod[t]
    alpha = jnp.sqrt(abar)
    sigma = jnp.sqrt(jnp.maximum(1.0 - abar, 1e-20))
    return alpha, sigma, jnp.log(alpha / sigma)


@partial(jax.jit, static_argnames=("apply_fn",))
def _dpm_segment(
    apply_fn: Callable,
    params,
    schedule: Schedule,
    features: Dict[str, Any],
    carry,
    step_pairs: jnp.ndarray,
):
    mask = features["residue_mask"].astype(jnp.float32)[..., None]

    def body(carry, pair):
        trans, prev_x0, prev_lam, have_prev = carry
        t, t_prev = pair[0], pair[1]
        batch = trans.shape[0]
        t_vec = jnp.full((batch,), t, dtype=jnp.int32)

        rots = frenet_frames(trans, features["chain_index"], features["residue_mask"])
        eps = apply_fn(params, Rigid(rots, trans), t_vec, features)["z"]

        a_s, s_s, lam_s = _alpha_sigma_lambda(schedule, t)
        x0 = (trans - s_s * eps) / a_s

        a_t, s_t, lam_t = _alpha_sigma_lambda(schedule, t_prev)
        h = lam_t - lam_s
        em1 = jnp.expm1(-h)  # e^{-h} - 1
        first = (s_t / s_s) * trans - a_t * em1 * x0
        r = (lam_s - prev_lam) / jnp.where(h == 0, 1.0, h)
        d1 = (x0 - prev_x0) / jnp.where(r == 0, 1.0, r)
        second = first - 0.5 * a_t * em1 * d1

        stepped = jnp.where(have_prev, second, first)
        # Final jump to the clean state: the h -> inf limit is x_0 = x̂0.
        next_trans = jnp.where(t_prev == 0, x0, stepped) * mask
        return (next_trans, x0, lam_s, jnp.bool_(True)), None

    return jax.lax.scan(body, carry, step_pairs)[0]


def dpm_solver_sample(
    apply_fn: Callable,
    params,
    schedule: Schedule,
    features: Dict[str, Any],
    key: jax.Array,
    n_steps: int,
    n_timestep: int,
    spacing: str = "uniform",
    steps_per_dispatch: Optional[int] = DEFAULT_STEPS_PER_DISPATCH,
    sample_ids: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Deterministic DPM-Solver++(2M) over an n_steps subsequence. Same
    per-sample x_T RNG discipline as ancestral/DDIM sampling — results are
    independent of batch composition, segmentation and mesh."""
    if sample_ids is None:
        sample_ids = default_sample_ids(features)
    trans = init_translations(features, key, sample_ids)
    pairs = ddim_schedule(n_timestep, n_steps, spacing)
    carry = (
        trans,
        jnp.zeros_like(trans),  # prev_x0 (unused until have_prev)
        jnp.float32(0.0),  # prev_lambda
        jnp.bool_(False),  # have_prev
    )
    k = steps_per_dispatch or len(pairs)
    for i in range(0, len(pairs), k):
        carry = _dpm_segment(
            apply_fn, params, schedule, features, carry, jnp.asarray(pairs[i : i + k])
        )
    return carry[0]
