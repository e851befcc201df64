"""The ancestral DDPM reverse loop as jitted lax.scan segments.

Behavioral counterpart of BaseSampler._sample
(/root/reference/genie/sampler/base.py:169-289): the reference runs 1000
sequential Python iterations, each a separate CUDA launch train; here the
trajectory runs as a small number of compiled scan segments (default 100
steps per dispatch) with the carry resident on device — the host loop exists
only to bound single-dispatch runtime (long-running executions can trip
runtime watchdogs); it adds one dispatch per segment and no transfers.
RNG is derived per (sample_id, step) via fold_in, so each sample's
trajectory is a pure function of (seed, sample_id, padded length) —
bit-identical for any scan segmentation, any batch composition (packing,
batch-size padding), and any device mesh. This is what lets the CLIs shard
a batch over an n-device mesh and still reproduce single-device outputs
exactly (replacing the reference's process-per-GPU fan-out,
multiprocessor.py:59-100).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from genie2_tpu.diffusion import Schedule, ddim_step_from_eps, posterior_mean_from_eps
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


def step_noise(
    key: jax.Array, sample_ids: jnp.ndarray, t, n_res: int
) -> jnp.ndarray:
    """Per-sample noise for step t: normal(fold_in(fold_in(key, t), id)).
    Each sample's noise stream depends only on (key, its id, t) — never on
    which other samples share the batch or how the batch is sharded."""
    step_key = jax.random.fold_in(key, t)

    def one(sid):
        return jax.random.normal(
            jax.random.fold_in(step_key, sid), (n_res, 3), jnp.float32
        )

    return jax.vmap(one)(sample_ids)


@partial(jax.jit, static_argnames=("apply_fn", "record"))
def _scan_segment(
    apply_fn: Callable,
    params,
    schedule: Schedule,
    features: Dict[str, Any],
    trans: jnp.ndarray,
    key: jax.Array,
    sample_ids: jnp.ndarray,
    steps: jnp.ndarray,
    scale: jnp.ndarray,
    record: bool = False,
):
    n_res = trans.shape[1]

    def body(trans, t):
        noise = step_noise(key, sample_ids, t, n_res)
        next_trans = reverse_step(
            apply_fn, params, schedule, features, trans, t, noise, scale
        )
        return next_trans, (next_trans if record else None)

    return jax.lax.scan(body, trans, steps)


def _segments(n_timestep: int, steps_per_dispatch: Optional[int]):
    steps = np.arange(n_timestep, 0, -1)
    k = steps_per_dispatch or n_timestep
    if k >= n_timestep:
        return [steps]
    return [steps[i : i + k] for i in range(0, n_timestep, k)]


def default_sample_ids(features: Dict[str, Any]) -> jnp.ndarray:
    return jnp.arange(features["residue_mask"].shape[0], dtype=jnp.int32)


@partial(jax.jit, static_argnames=())
def init_translations(
    features: Dict[str, Any], key: jax.Array, sample_ids: jnp.ndarray
) -> jnp.ndarray:
    """x_T ~ N(0, I), per-sample stream (step index 0 is reserved for the
    init draw; reverse steps use t in 1..T)."""
    mask = features["residue_mask"].astype(jnp.float32)[..., None]
    n_res = features["residue_mask"].shape[1]
    return step_noise(key, sample_ids, 0, n_res) * mask


def ancestral_sample(
    apply_fn: Callable,
    params,
    schedule: Schedule,
    features: Dict[str, Any],
    key: jax.Array,
    scale: jnp.ndarray,
    n_timestep: int,
    steps_per_dispatch: Optional[int] = DEFAULT_STEPS_PER_DISPATCH,
    sample_ids: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Run the full reverse trajectory from x_T ~ N(0, I); returns final
    translations [B, N, 3]. `scale` is the noise-scale knob gamma
    (base.py:271) and may be a traced scalar. `sample_ids` (default
    arange(B)) name each sample's independent noise stream."""
    if sample_ids is None:
        sample_ids = default_sample_ids(features)
    trans = init_translations(features, key, sample_ids)
    for seg in _segments(n_timestep, steps_per_dispatch):
        trans, _ = _scan_segment(
            apply_fn, params, schedule, features, trans, key, sample_ids,
            jnp.asarray(seg), scale,
        )
    return trans


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
    sample_ids: Optional[jnp.ndarray] = None,
):
    """Like ancestral_sample but also returns x_t snapshots every
    `record_every` steps (the reference's trajectory-dump capability,
    smc_sampler_new_new.py:802-812, recovered from scan outputs instead of
    per-step host writes). Returns (final, snapshots [K, B, N, 3], steps)."""
    if sample_ids is None:
        sample_ids = default_sample_ids(features)
    trans = init_translations(features, key, sample_ids)
    snaps, snap_steps = [], []
    for seg in _segments(n_timestep, steps_per_dispatch):
        trans, traj = _scan_segment(
            apply_fn, params, schedule, features, trans, key, sample_ids,
            jnp.asarray(seg), scale, record=True,
        )
        keep = seg % record_every == 0
        if keep.any():
            snaps.append(np.asarray(traj[keep]))
            snap_steps.extend(seg[keep].tolist())
    snapshots = np.concatenate(snaps, axis=0) if snaps else np.zeros((0,))
    return trans, snapshots, snap_steps


def ddim_schedule(
    n_timestep: int, n_steps: int, spacing: str = "uniform"
) -> np.ndarray:
    """[K, 2] (t, t_prev) pairs STARTING at T (the first model call must
    see x_T at its true noise level) and ending at t_prev = 0 (the clean
    state).

    spacing="uniform" is the standard DDIM subsequence; "sqrt" concentrates
    steps at HIGH t (t_i ~ T sqrt(i/K)), which measurably reduces the
    solver error a weak score field makes on the large early jumps
    (BENCH_NOTES.md round 2 spacing experiment: bond-statistic deviation
    shrinks at both K=10 and K=25 on the toy model)."""
    if not 1 <= n_steps <= n_timestep:
        raise ValueError(f"sampler steps {n_steps} not in [1, {n_timestep}]")
    u = np.linspace(1.0, 0.0, n_steps, endpoint=False)[::-1]  # (0, 1]
    if spacing == "uniform":
        raw = n_timestep * u
    elif spacing == "sqrt":
        raw = n_timestep * np.sqrt(u)
    else:
        raise ValueError(f"unknown spacing {spacing!r} (uniform|sqrt)")
    # Greedy descending de-dup: rounding can collide adjacent timesteps
    # (likelier with sqrt spacing or small T); instead of dropping them
    # (which would silently run < n_steps model calls) nudge each collided
    # step down one. Always valid: n_steps <= n_timestep and raw starts at
    # exactly T, so ts[i] >= T - i >= 1.
    raw_desc = np.clip(raw[::-1].round().astype(np.int64), 1, n_timestep)
    ts = np.empty(n_steps, dtype=np.int64)
    prev = n_timestep + 1
    for i, r in enumerate(raw_desc):
        ts[i] = min(int(r), prev - 1)
        prev = ts[i]
    assert ts[-1] >= 1
    return np.stack([ts, np.concatenate([ts[1:], [0]])], axis=1)


@partial(jax.jit, static_argnames=("apply_fn",))
def _ddim_segment(
    apply_fn: Callable,
    params,
    schedule: Schedule,
    features: Dict[str, Any],
    trans: jnp.ndarray,
    key: jax.Array,
    sample_ids: jnp.ndarray,
    step_pairs: jnp.ndarray,
    eta: jnp.ndarray,
    scale: jnp.ndarray,
):
    mask = features["residue_mask"].astype(trans.dtype)[..., None]
    n_res = trans.shape[1]
    batch = trans.shape[0]

    def body(trans, inputs):
        pair, eta_t = inputs
        t, t_prev = pair[0], pair[1]
        t_vec = jnp.full((batch,), t, dtype=jnp.int32)
        tp_vec = jnp.full((batch,), t_prev, dtype=jnp.int32)
        rots = frenet_frames(trans, features["chain_index"], features["residue_mask"])
        eps = apply_fn(params, Rigid(rots, trans), t_vec, features)["z"]
        # The gamma low-temperature knob applies to the injected noise
        # exactly as in the ancestral loop (base.py:269-272); with eta=0
        # (no injected noise) it is a no-op by construction.
        noise = step_noise(key, sample_ids, t, n_res) * scale
        next_trans = (
            ddim_step_from_eps(schedule, trans, t_vec, tp_vec, eps, noise, eta_t)
            * mask
        )
        return next_trans, None

    return jax.lax.scan(body, trans, (step_pairs, eta))[0]


def ddim_sample(
    apply_fn: Callable,
    params,
    schedule: Schedule,
    features: Dict[str, Any],
    key: jax.Array,
    n_steps: int,
    n_timestep: int,
    eta: float = 0.0,
    scale: float = 1.0,
    spacing: str = "uniform",
    steps_per_dispatch: Optional[int] = DEFAULT_STEPS_PER_DISPATCH,
    sample_ids: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Accelerated DDIM sampling over an n_steps subsequence of the T-step
    schedule (10-50 steps give usable backbones at ~T/n_steps the cost).
    `scale` is the ancestral loop's gamma noise-temperature knob applied to
    the eta-controlled injected noise (irrelevant at eta=0). Same
    per-(sample, step) RNG discipline as ancestral_sample — results are
    independent of batch composition, segmentation and mesh.

    `eta` is a scalar or a per-model-call array [n_steps] aligned with the
    descending step subsequence — hybrid stochasticity schedules (e.g.
    deterministic ODE early, ancestral-like noise on the final steps) are
    `eta_schedule_below(...)` or any custom array."""
    if sample_ids is None:
        sample_ids = default_sample_ids(features)
    trans = init_translations(features, key, sample_ids)
    pairs = ddim_schedule(n_timestep, n_steps, spacing)
    etas = jnp.broadcast_to(
        jnp.asarray(eta, jnp.float32).reshape(-1), (len(pairs),)
    )
    k = steps_per_dispatch or len(pairs)
    for i in range(0, len(pairs), k):
        trans = _ddim_segment(
            apply_fn, params, schedule, features, trans, key, sample_ids,
            jnp.asarray(pairs[i : i + k]), etas[i : i + k], jnp.float32(scale),
        )
    return trans


def eta_schedule_below(
    n_timestep: int,
    n_steps: int,
    switch_t: int,
    eta_low: float = 1.0,
    eta_high: float = 0.0,
    spacing: str = "uniform",
) -> jnp.ndarray:
    """Per-step eta array for ddim_sample: eta_high while t > switch_t,
    eta_low for t <= switch_t. The default (0 -> 1) runs the deterministic
    ODE through the high-noise regime and re-injects ancestral-like
    stochasticity on the final steps — the 'stochastic steps sharpen local
    structure' hypothesis from the solver-quality study, made testable."""
    ts = ddim_schedule(n_timestep, n_steps, spacing)[:, 0]
    return jnp.where(jnp.asarray(ts) <= switch_t, eta_low, eta_high).astype(
        jnp.float32
    )


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
