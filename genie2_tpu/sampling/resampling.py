"""Particle-filter utilities: ESS and resampling schemes.

Behavioral counterparts of the ESS helpers in
/root/reference/genie/sampler/unconditional_smc.py:26-41 and the resampler
family in sampler/twisted_diffusion/smc_utils.py:130-216. The reference's
numba-jitted inverse-CDF kernel becomes a jnp.searchsorted on the cumulative
weights, so every scheme runs inside jit/scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_log_weights(log_w: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    log_w = log_w - jnp.max(log_w, axis=axis, keepdims=True)
    return log_w - jax.nn.logsumexp(log_w, axis=axis, keepdims=True)


def ess_from_log_weights(log_w: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """ESS = (sum w)^2 / sum w^2 of the normalized weights."""
    w = jnp.exp(normalize_log_weights(log_w, axis=axis))
    return jnp.sum(w, axis=axis) ** 2 / jnp.sum(w**2, axis=axis)


def systematic_resample_indices(weights: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Systematic resampling (unconditional_smc.py:237-288): one uniform
    u ~ U(0, 1/N), comb points u + i/N, inverse CDF via searchsorted."""
    n = weights.shape[0]
    w = weights / jnp.sum(weights)
    cumsum = jnp.cumsum(w)
    u = jax.random.uniform(key, (), minval=0.0, maxval=1.0 / n)
    points = u + jnp.arange(n) / n
    return jnp.clip(jnp.searchsorted(cumsum, points, side="left"), 0, n - 1)


def stratified_resample_indices(weights: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Stratified resampling: one uniform per stratum (smc_utils.py:130-176)."""
    n = weights.shape[0]
    w = weights / jnp.sum(weights)
    cumsum = jnp.cumsum(w)
    u = jax.random.uniform(key, (n,)) / n
    points = u + jnp.arange(n) / n
    return jnp.clip(jnp.searchsorted(cumsum, points, side="left"), 0, n - 1)


def multinomial_resample_indices(weights: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    w = weights / jnp.sum(weights)
    return jax.random.choice(key, w.shape[0], (w.shape[0],), p=w)


RESAMPLERS = {
    "systematic": systematic_resample_indices,
    "stratified": stratified_resample_indices,
    "multinomial": multinomial_resample_indices,
}
