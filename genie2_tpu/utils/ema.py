"""Exponential moving average helper.

Counterpart of the EMA class in
/root/reference/genie/sampler/smc_sampler_new_new.py:32-90 (used there to
smooth twisting gradients), generalized to pytrees and usable both for
gradient smoothing and weight averaging (which the reference lacks).
Functional API so it threads through jit/scan.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EMAState(NamedTuple):
    value: Any
    count: jnp.ndarray


def ema_init(tree: Any) -> EMAState:
    return EMAState(
        value=jax.tree_util.tree_map(jnp.zeros_like, tree),
        count=jnp.zeros((), jnp.int32),
    )


def ema_update(state: EMAState, tree: Any, decay: float = 0.99) -> EMAState:
    """Bias-corrected EMA update (Adam-style correction on read)."""
    new_value = jax.tree_util.tree_map(
        lambda e, x: decay * e + (1.0 - decay) * x, state.value, tree
    )
    return EMAState(new_value, state.count + 1)


def ema_read(state: EMAState, decay: float = 0.99) -> Any:
    correction = 1.0 - decay ** jnp.maximum(state.count, 1).astype(jnp.float32)
    return jax.tree_util.tree_map(lambda e: e / correction, state.value)
