"""Variance schedule and DDPM coefficient tables.

Behavioral counterpart of /root/reference/genie/diffusion/schedule.py:5-49
and the precomputed buffers in ddpm.py:36-66. All arrays have length
n_timestep + 1 and are indexed by the one-based diffusion step t (index 0 is
the un-noised stage, beta_0 = 0). The table is a frozen NamedTuple pytree so
it can be closed over by jitted step functions or donated through scan.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


def cosine_beta_schedule(n_timestep: int) -> np.ndarray:
    """Nichol-Dhariwal cosine schedule; length n_timestep + 1 with beta_0 = 0
    (schedule.py:27-49), betas clipped to 0.999."""
    steps = n_timestep + 1
    # float32 throughout, matching torch op-for-op for parity.
    x = np.linspace(0, n_timestep, steps, dtype=np.float32)
    alphas_cumprod = np.cos((x / np.float32(steps)) * np.float32(math.pi * 0.5)) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = np.float32(1) - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.concatenate(
        [np.zeros(1, np.float32), np.clip(betas, 0, 0.999).astype(np.float32)]
    )


def get_betas(n_timestep: int, schedule: str) -> np.ndarray:
    if schedule == "cosine":
        return cosine_beta_schedule(n_timestep)
    raise ValueError(f"Invalid schedule: {schedule}")


class Schedule(NamedTuple):
    """All derived coefficient tables, each of shape [n_timestep + 1]."""

    betas: jnp.ndarray
    alphas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    one_minus_alphas_cumprod: jnp.ndarray
    sqrt_betas: jnp.ndarray
    sqrt_alphas: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_alphas_cumprod_prev: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod_prev: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    posterior_variance: jnp.ndarray

    @property
    def n_timestep(self) -> int:
        return self.betas.shape[0] - 1

    @staticmethod
    def create(n_timestep: int, schedule: str = "cosine") -> "Schedule":
        # fp32 derivations, matching the torch reference op-for-op
        # (ddpm.py:36-66) so every coefficient table is bit-comparable.
        betas = get_betas(n_timestep, schedule).astype(np.float32)
        alphas = np.float32(1.0) - betas
        alphas_cumprod = np.cumprod(alphas, dtype=np.float32)
        alphas_cumprod_prev = np.concatenate([np.ones(1, np.float32), alphas_cumprod[:-1]])
        one_minus = np.float32(1.0) - alphas_cumprod

        def j(x):
            return jnp.asarray(x, dtype=jnp.float32)

        with np.errstate(divide="ignore", invalid="ignore"):
            # Index 0 entries of the posterior coefficients are 0/0 in the
            # reference too (betas[0] = 0, 1 - alphas_cumprod[0] = 0); they
            # are never read (t >= 1 everywhere).
            pmc1 = np.where(one_minus > 0, betas * alphas_cumprod_prev / one_minus, 0.0)
            pmc2 = np.where(
                one_minus > 0,
                np.sqrt(alphas) * (1.0 - alphas_cumprod_prev) / one_minus,
                0.0,
            )
            pvar = np.where(one_minus > 0, betas * (1.0 - alphas_cumprod_prev) / one_minus, 0.0)

        return Schedule(
            betas=j(betas),
            alphas=j(alphas),
            alphas_cumprod=j(alphas_cumprod),
            alphas_cumprod_prev=j(alphas_cumprod_prev),
            one_minus_alphas_cumprod=j(one_minus),
            sqrt_betas=j(np.sqrt(betas)),
            sqrt_alphas=j(np.sqrt(alphas)),
            sqrt_alphas_cumprod=j(np.sqrt(alphas_cumprod)),
            sqrt_alphas_cumprod_prev=j(np.sqrt(alphas_cumprod_prev)),
            sqrt_one_minus_alphas_cumprod=j(np.sqrt(one_minus)),
            sqrt_one_minus_alphas_cumprod_prev=j(np.sqrt(1.0 - alphas_cumprod_prev)),
            sqrt_recip_alphas_cumprod=j(1.0 / np.sqrt(alphas_cumprod)),
            sqrt_recipm1_alphas_cumprod=j(np.sqrt(1.0 / alphas_cumprod - 1.0)),
            posterior_mean_coef1=j(pmc1),
            posterior_mean_coef2=j(pmc2),
            posterior_variance=j(pvar),
        )


def q_sample(schedule: Schedule, x0: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray):
    """Forward noising x_t = sqrt(abar_t) x_0 + sqrt(1 - abar_t) eps.

    t: [B] integer steps (1-based); x0/noise: [B, N, 3] (genie.py:78-79).
    """
    a = schedule.sqrt_alphas_cumprod[t][:, None, None]
    b = schedule.sqrt_one_minus_alphas_cumprod[t][:, None, None]
    return a * x0 + b * noise


def x0_from_eps(schedule: Schedule, xt: jnp.ndarray, t: jnp.ndarray, eps: jnp.ndarray):
    """E[x_0 | x_t] from predicted noise (unconditional_smc.py:476)."""
    return (
        xt - schedule.sqrt_one_minus_alphas_cumprod[t][:, None, None] * eps
    ) / schedule.sqrt_alphas_cumprod[t][:, None, None]


def posterior_mean_from_eps(schedule: Schedule, xt: jnp.ndarray, t: jnp.ndarray, eps: jnp.ndarray):
    """mu_t = 1/sqrt(a_t) (x_t - (1 - a_t)/sqrt(1 - abar_t) eps) (base.py:249-251)."""
    w_z = (1.0 - schedule.alphas[t]) / schedule.sqrt_one_minus_alphas_cumprod[t]
    return (1.0 / schedule.sqrt_alphas[t])[:, None, None] * (
        xt - w_z[:, None, None] * eps
    )


def ddim_step_from_eps(
    schedule: Schedule,
    xt: jnp.ndarray,
    t: jnp.ndarray,
    t_prev: jnp.ndarray,
    eps: jnp.ndarray,
    noise: jnp.ndarray,
    eta,
):
    """One DDIM update x_t -> x_{t_prev} (Song et al. 2021, eq. 12), for
    arbitrary step subsequences t > t_prev >= 0 (index 0 of the one-indexed
    schedule tables is the clean state, abar_0 = 1, so t_prev = 0 lands on
    x_0 with zero injected noise for any eta).

    eta = 0 is the deterministic DDIM ODE; eta = 1 recovers the DDPM
    posterior variance on the full step sequence. No reference counterpart
    (the reference only has the 1000-step ancestral loop, base.py:236-282);
    this is the accelerated-sampling path.
    """
    abar_t = schedule.alphas_cumprod[t][:, None, None]
    abar_p = schedule.alphas_cumprod[t_prev][:, None, None]
    x0 = x0_from_eps(schedule, xt, t, eps)
    sigma = (
        eta
        * jnp.sqrt((1.0 - abar_p) / (1.0 - abar_t))
        * jnp.sqrt(1.0 - abar_t / abar_p)
    )
    dir_xt = jnp.sqrt(jnp.maximum(1.0 - abar_p - sigma**2, 0.0)) * eps
    return jnp.sqrt(abar_p) * x0 + dir_xt + sigma * noise


def posterior_mean_from_x0(schedule: Schedule, xt: jnp.ndarray, t: jnp.ndarray, x0: jnp.ndarray):
    """mu_t = coef1 x_0 + coef2 x_t with the TDS sampler's coefficient
    convention (unconditional_smc.py:497-504): coef1 uses sqrt(abar_{t-1})
    and coef2 uses sqrt(a_t)(1 - abar_{t-1})/(1 - abar_t)."""
    coef1 = (
        schedule.sqrt_alphas_cumprod_prev[t]
        * schedule.betas[t]
        / schedule.one_minus_alphas_cumprod[t]
    )[:, None, None]
    coef2 = (
        schedule.sqrt_alphas[t]
        * (1.0 - schedule.alphas_cumprod_prev[t])
        / schedule.one_minus_alphas_cumprod[t]
    )[:, None, None]
    return coef1 * x0 + coef2 * xt
