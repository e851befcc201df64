"""Training state and step function.

Behavioral counterpart of Genie.training_step
(/root/reference/genie/diffusion/genie.py:15-120) + plain Adam
(ddpm.py:73-77), as one pure jitted function: sample per-structure
timesteps, masked Gaussian noise, q-sample translations, recompute Frenet
frames from the noisy coordinates, denoiser forward (with dropout), the
motif-weighted loss, and an Adam update. Data parallelism is expressed by
sharding the batch leaves over the mesh 'data' axis; XLA inserts the
gradient all-reduce.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from genie2_tpu.diffusion import Schedule, q_sample
from genie2_tpu.geometry import Rigid, frenet_frames
from genie2_tpu.train.loss import genie_loss


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray
    # Exponential moving average of params (None when disabled). The
    # reference has no weight EMA at all (SURVEY.md §5).
    ema: Any = None


def create_train_state(
    params, lr: float, ema_decay: float = 0.0
) -> Tuple[TrainState, optax.GradientTransformation]:
    tx = optax.adam(lr)
    ema = jax.tree_util.tree_map(jnp.array, params) if ema_decay > 0 else None
    return (
        TrainState(
            params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32),
            ema=ema,
        ),
        tx,
    )


def _build_step_impl(
    model,
    schedule: Schedule,
    tx,
    condition_loss_weight: float,
    compute_dtype: str = "fp32",
):
    """Shared un-jitted single-step body for make_train_step (one step per
    dispatch) and make_train_scan_step (K steps per dispatch)."""
    from genie2_tpu.nn.policy import make_apply_fn

    apply_fn = make_apply_fn(model, compute_dtype)

    def loss_fn(params, features, key):
        t_key, noise_key, dropout_key = jax.random.split(key, 3)
        x0 = features["atom_positions"]
        batch = x0.shape[0]

        # t ~ U{1..T} per structure (genie.py:69-72).
        t = jax.random.randint(t_key, (batch,), 0, schedule.n_timestep) + 1

        # Masked Gaussian noise (genie.py:75).
        mask = features["residue_mask"].astype(x0.dtype)[..., None]
        z = jax.random.normal(noise_key, x0.shape, dtype=x0.dtype) * mask

        # Noise translations, recompute frames geometrically (genie.py:78-85).
        trans_t = q_sample(schedule, x0, t, z)
        rots_t = frenet_frames(trans_t, features["chain_index"], features["residue_mask"])
        ts = Rigid(rots_t, trans_t)

        out = apply_fn(
            params, ts, t, features, deterministic=False, rngs={"dropout": dropout_key}
        )
        return genie_loss(out["z"], z, features, condition_loss_weight)

    def train_step_impl(state: TrainState, features: Dict, key, ema_decay: float):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, features, key
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        ema = state.ema
        if ema is not None:
            ema = jax.tree_util.tree_map(
                lambda e, p: ema_decay * e + (1.0 - ema_decay) * p, ema, params
            )
        return TrainState(params, opt_state, state.step + 1, ema), metrics

    return train_step_impl


def make_train_step(
    model,
    schedule: Schedule,
    tx,
    condition_loss_weight: float,
    compute_dtype: str = "fp32",
    ema_decay: float = 0.0,
):
    """Build the jitted training step. Returned fn signature:
    (state, features, key) -> (state, metrics).

    compute_dtype="bf16" runs the denoiser forward/backward in bfloat16
    (parameters, optimizer state, loss and update stay fp32 — standard
    mixed precision; bf16's dynamic range needs no loss scaling)."""
    train_step_impl = _build_step_impl(
        model, schedule, tx, condition_loss_weight, compute_dtype
    )

    @jax.jit
    def train_step(state: TrainState, features: Dict, key) -> Tuple[TrainState, Dict]:
        return train_step_impl(state, features, key, ema_decay)

    return train_step


def make_train_scan_step(
    model,
    schedule: Schedule,
    tx,
    condition_loss_weight: float,
    compute_dtype: str = "fp32",
    ema_decay: float = 0.0,
):
    """K optimizer steps per dispatch via lax.scan (config key scanSteps).

    Motivation (round 5, tools/diagnose_train_gap.py variant E): on the
    tunneled TPU the host pays ~7-15 ms of issue cost per dispatch, which
    rivals the ~24 ms device step — the single-step training loop is
    HOST-bound. Scanning K steps amortizes the issue cost K-fold, the same
    trick the samplers use (steps_per_dispatch).

    Step-for-step numerics are identical to K make_train_step calls: the
    scan body IS the single-step impl, consuming one key per step
    (tests/test_train.py asserts param equality on CPU).

    Returned fn signature:
      (state, stacked_features with leading [K] axis, keys[K, 2])
        -> (state, metrics each with leading [K] axis)
    """
    train_step_impl = _build_step_impl(
        model, schedule, tx, condition_loss_weight, compute_dtype
    )

    @jax.jit
    def train_scan_step(
        state: TrainState, features: Dict, keys
    ) -> Tuple[TrainState, Dict]:
        def body(st, xs):
            f, k = xs
            st, metrics = train_step_impl(st, f, k, ema_decay)
            return st, metrics

        return jax.lax.scan(body, state, (features, keys))

    return train_scan_step
