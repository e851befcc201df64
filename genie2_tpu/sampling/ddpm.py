"""The ancestral DDPM reverse loop as jitted lax.scan segments.

Behavioral counterpart of BaseSampler._sample
(/root/reference/genie/sampler/base.py:169-289): the reference runs 1000
sequential Python iterations, each a separate CUDA launch train; here the
trajectory runs as a small number of compiled scan segments (default 100
steps per dispatch) with the carry resident on device — the host loop exists
only to bound single-dispatch runtime (long-running executions can trip
runtime watchdogs); it adds one dispatch per segment and no transfers.
RNG is a per-step key split inside the scan body, so results are
bit-identical for any segmentation.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from genie2_tpu.diffusion import Schedule, posterior_mean_from_eps
from genie2_tpu.geometry import Rigid, frenet_frames

DEFAULT_STEPS_PER_DISPATCH = 100


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


@partial(jax.jit, static_argnames=("apply_fn", "record"))
def _scan_segment(
    apply_fn: Callable,
    params,
    schedule: Schedule,
    features: Dict[str, Any],
    carry: Tuple[jnp.ndarray, jax.Array],
    steps: jnp.ndarray,
    scale: jnp.ndarray,
    record: bool = False,
):
    shape = carry[0].shape

    def body(c, t):
        trans, key = c
        key, noise_key = jax.random.split(key)
        noise = jax.random.normal(noise_key, shape, dtype=jnp.float32)
        next_trans = reverse_step(
            apply_fn, params, schedule, features, trans, t, noise, scale
        )
        return (next_trans, key), (next_trans if record else None)

    return jax.lax.scan(body, carry, steps)


def _segments(n_timestep: int, steps_per_dispatch: Optional[int]):
    steps = np.arange(n_timestep, 0, -1)
    k = steps_per_dispatch or n_timestep
    if k >= n_timestep:
        return [steps]
    return [steps[i : i + k] for i in range(0, n_timestep, k)]


def init_translations(features: Dict[str, Any], key: jax.Array) -> jnp.ndarray:
    mask = features["residue_mask"].astype(jnp.float32)[..., None]
    shape = (*features["residue_mask"].shape, 3)
    return jax.random.normal(key, shape, dtype=jnp.float32) * mask


def ancestral_sample(
    apply_fn: Callable,
    params,
    schedule: Schedule,
    features: Dict[str, Any],
    key: jax.Array,
    scale: jnp.ndarray,
    n_timestep: int,
    steps_per_dispatch: Optional[int] = DEFAULT_STEPS_PER_DISPATCH,
) -> jnp.ndarray:
    """Run the full reverse trajectory from x_T ~ N(0, I); returns final
    translations [B, N, 3]. `scale` is the noise-scale knob gamma
    (base.py:271) and may be a traced scalar."""
    key, init_key = jax.random.split(key)
    carry = (init_translations(features, init_key), key)
    for seg in _segments(n_timestep, steps_per_dispatch):
        carry, _ = _scan_segment(
            apply_fn, params, schedule, features, carry, jnp.asarray(seg), scale
        )
    return carry[0]


def ancestral_sample_with_trajectory(
    apply_fn: Callable,
    params,
    schedule: Schedule,
    features: Dict[str, Any],
    key: jax.Array,
    scale: jnp.ndarray,
    n_timestep: int,
    record_every: int = 50,
    steps_per_dispatch: Optional[int] = DEFAULT_STEPS_PER_DISPATCH,
):
    """Like ancestral_sample but also returns x_t snapshots every
    `record_every` steps (the reference's trajectory-dump capability,
    smc_sampler_new_new.py:802-812, recovered from scan outputs instead of
    per-step host writes). Returns (final, snapshots [K, B, N, 3], steps)."""
    key, init_key = jax.random.split(key)
    carry = (init_translations(features, init_key), key)
    snaps, snap_steps = [], []
    for seg in _segments(n_timestep, steps_per_dispatch):
        carry, traj = _scan_segment(
            apply_fn, params, schedule, features, carry, jnp.asarray(seg), scale,
            record=True,
        )
        keep = seg % record_every == 0
        if keep.any():
            snaps.append(np.asarray(traj[keep]))
            snap_steps.extend(seg[keep].tolist())
    snapshots = np.concatenate(snaps, axis=0) if snaps else np.zeros((0,))
    return carry[0], snapshots, snap_steps


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
