"""The ancestral DDPM reverse loop as a single jitted lax.scan.

Behavioral counterpart of BaseSampler._sample
(/root/reference/genie/sampler/base.py:169-289): the reference runs 1000
sequential Python iterations, each a separate CUDA launch train; here the
entire reverse trajectory is one compiled program (model apply + posterior +
scaled noise + Frenet frame recompute per step), so there is no host
round-trip between steps.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from genie2_tpu.diffusion import Schedule, posterior_mean_from_eps
from genie2_tpu.geometry import Rigid, frenet_frames


def reverse_step(
    apply_fn: Callable,
    params,
    schedule: Schedule,
    features: Dict[str, Any],
    trans: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
    scale: float,
) -> jnp.ndarray:
    """One reverse-diffusion step x_t -> x_{t-1}.

    t is a scalar int (same step for the whole batch, as in the reference
    sampler); `noise` is ignored at t == 1 (base.py:254-282).
    """
    mask = features["residue_mask"].astype(trans.dtype)[..., None]
    batch = trans.shape[0]
    t_vec = jnp.full((batch,), t, dtype=jnp.int32)

    rots = frenet_frames(trans, features["chain_index"], features["residue_mask"])
    z_pred = apply_fn(params, Rigid(rots, trans), t_vec, features)["z"]

    mean = posterior_mean_from_eps(schedule, trans, t_vec, z_pred) * mask
    sigma = schedule.sqrt_betas[t_vec][:, None, None]
    next_trans = jnp.where(t > 1, mean + scale * sigma * noise * mask, mean)
    return next_trans


@partial(jax.jit, static_argnames=("apply_fn", "n_timestep"))
def ancestral_sample(
    apply_fn: Callable,
    params,
    schedule: Schedule,
    features: Dict[str, Any],
    key: jax.Array,
    scale: jnp.ndarray,
    n_timestep: int,
) -> jnp.ndarray:
    """Run the full reverse trajectory from x_T ~ N(0, I).

    Returns final translations [B, N, 3]. `scale` is the noise-scale knob
    gamma (base.py:271); it may be a traced scalar so sweeping it does not
    retrigger compilation.
    """
    key, init_key = jax.random.split(key)
    mask = features["residue_mask"].astype(jnp.float32)[..., None]
    shape = (*features["residue_mask"].shape, 3)
    trans = jax.random.normal(init_key, shape, dtype=jnp.float32) * mask

    def body(carry, t):
        trans, key = carry
        key, noise_key = jax.random.split(key)
        noise = jax.random.normal(noise_key, shape, dtype=jnp.float32)
        next_trans = reverse_step(
            apply_fn, params, schedule, features, trans, t, noise, scale
        )
        return (next_trans, key), None

    steps = jnp.arange(n_timestep, 0, -1)
    (trans, _), _ = jax.lax.scan(body, (trans, key), steps)
    return trans


@partial(jax.jit, static_argnames=("apply_fn",))
def ancestral_sample_injected(
    apply_fn: Callable,
    params,
    schedule: Schedule,
    features: Dict[str, Any],
    init_trans: jnp.ndarray,
    noises: jnp.ndarray,
    scale: jnp.ndarray,
) -> jnp.ndarray:
    """Reverse trajectory with externally supplied x_T and per-step noise
    [T, B, N, 3] (noises[0] is used at step T). This is the fixed-noise
    parity harness: inject the same noise into the torch reference and the
    trajectories must match step for step."""
    n_timestep = noises.shape[0]

    def body(trans, inputs):
        t, noise = inputs
        next_trans = reverse_step(
            apply_fn, params, schedule, features, trans, t, noise, scale
        )
        return next_trans, next_trans

    steps = jnp.arange(n_timestep, 0, -1)
    trans, trajectory = jax.lax.scan(body, init_trans, (steps, noises))
    return trans, trajectory


@partial(jax.jit, static_argnames=("apply_fn", "n_timestep", "record_every"))
def ancestral_sample_with_trajectory(
    apply_fn: Callable,
    params,
    schedule: Schedule,
    features: Dict[str, Any],
    key: jax.Array,
    scale: jnp.ndarray,
    n_timestep: int,
    record_every: int = 50,
):
    """Like ancestral_sample but also stacks x_t snapshots every
    `record_every` steps (the reference's debug-dump capability,
    smc_sampler_new_new.py:802-812, recovered post-hoc from scan outputs
    instead of per-step host writes)."""
    key, init_key = jax.random.split(key)
    mask = features["residue_mask"].astype(jnp.float32)[..., None]
    shape = (*features["residue_mask"].shape, 3)
    trans = jax.random.normal(init_key, shape, dtype=jnp.float32) * mask

    def body(carry, t):
        trans, key = carry
        key, noise_key = jax.random.split(key)
        noise = jax.random.normal(noise_key, shape, dtype=jnp.float32)
        next_trans = reverse_step(
            apply_fn, params, schedule, features, trans, t, noise, scale
        )
        keep = (t % record_every) == 0
        snapshot = jnp.where(keep, next_trans, jnp.zeros_like(next_trans))
        return (next_trans, key), (snapshot, keep)

    steps = jnp.arange(n_timestep, 0, -1)
    (trans, _), (snaps, keeps) = jax.lax.scan(body, (trans, key), steps)
    return trans, snaps, keeps
