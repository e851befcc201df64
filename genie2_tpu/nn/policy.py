"""Mixed-precision policy.

fp32 is the canonical/parity dtype (the 1e-4 trajectory-parity budget in
BASELINE.md rules bf16 out for parity runs). The "bf16" policy halves HBM
traffic on the O(N^2) pair tensors — the sampling hot path is
bandwidth-bound — by running the whole denoiser in bfloat16 and returning
the noise prediction in fp32; the reverse-diffusion update (posterior mean,
noise scale, Frenet frames) always stays fp32 so coordinate error does not
compound across the 1000-step trajectory.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from genie2_tpu.geometry import Rigid


def cast_floating(tree, dtype):
    """Cast all floating leaves of a pytree to dtype (ints/bools untouched)."""
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


def make_apply_fn(model, compute_dtype: str = "fp32", cast_params: bool = True) -> Callable:
    """Wrap model.apply with the chosen precision policy. Signature matches
    model.apply(params, ts, t, feats, ...).

    If `feats` carries a "static_pair_bias" entry (the relpos+motif-template
    contribution hoisted out of the reverse loop by the samplers), it is
    routed to the denoiser's static_pair_bias argument."""
    if compute_dtype in ("fp32", "float32"):

        def apply_fp32(params, ts: Rigid, timesteps, features, **kwargs):
            features = dict(features)
            bias = features.pop("static_pair_bias", None)
            return model.apply(
                params, ts, timesteps, features, static_pair_bias=bias, **kwargs
            )

        return apply_fp32
    if compute_dtype not in ("bf16", "bfloat16"):
        raise ValueError(f"unknown compute_dtype: {compute_dtype}")

    def apply_bf16(params, ts: Rigid, timesteps, features, **kwargs):
        bf16 = jnp.bfloat16
        features = {
            k: (v.astype(bf16) if jnp.issubdtype(v.dtype, jnp.floating) else v)
            for k, v in features.items()
        }
        bias = features.pop("static_pair_bias", None)
        # cast_params=False when the caller pre-cast the tree (samplers do,
        # so the 63MB cast doesn't re-run on every scan step).
        out = model.apply(
            cast_floating(params, bf16) if cast_params else params,
            Rigid(ts.rots.astype(bf16), ts.trans.astype(bf16)),
            timesteps,
            features,
            static_pair_bias=bias,
            **kwargs,
        )
        out = dict(out)
        out["z"] = out["z"].astype(jnp.float32)
        return out

    return apply_bf16
