"""Training losses.

Behavioral counterpart of /root/reference/genie/utils/loss.py:4-36 (note:
despite the reference's name `mse`, the per-residue error is the L2 *norm*
of the error vector, not its square) and the condition/infill weighting in
genie.py:90-105.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp


def residue_error_norm(
    x_pred: jnp.ndarray,
    x: jnp.ndarray,
    mask: jnp.ndarray,
    aggregate: str = None,
    eps: float = 1e-10,
):
    """sqrt(eps + ||x_pred - x||^2) per residue, masked (loss.py:4-36)."""
    errors = jnp.sqrt(eps + jnp.sum((x_pred - x) ** 2, axis=-1))
    masked = errors * mask
    if aggregate is None:
        return masked
    if aggregate == "mean":
        return jnp.sum(masked, axis=-1) / jnp.sum(mask, axis=-1)
    if aggregate == "sum":
        return jnp.sum(masked, axis=-1)
    raise ValueError(f"Invalid aggregate method: {aggregate}")


def genie_loss(
    z_pred: jnp.ndarray,
    z: jnp.ndarray,
    features: Dict,
    condition_loss_weight: float,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """The motif-weighted noise-prediction loss (genie.py:90-120).

    Returns (scalar weighted loss, metrics dict).
    """
    residue_mask = features["residue_mask"].astype(jnp.float32)
    fixed_seq = features["fixed_sequence_mask"].astype(jnp.float32)
    condition_mask = residue_mask * fixed_seq
    infill_mask = residue_mask * (1.0 - fixed_seq)

    condition_losses = residue_error_norm(z_pred, z, condition_mask, aggregate="sum")
    infill_losses = residue_error_norm(z_pred, z, infill_mask, aggregate="sum")

    num_residues = features["num_residues"].astype(jnp.float32).reshape(-1)
    unweighted = (condition_losses + infill_losses) / num_residues

    w = condition_loss_weight
    n_cond = jnp.sum(condition_mask, axis=-1)
    n_infill = jnp.sum(infill_mask, axis=-1)
    weighted = (w * condition_losses + infill_losses) / (w * n_cond + n_infill)

    has_motif = n_cond > 0
    safe_cond = condition_losses / jnp.maximum(n_cond, 1.0)
    safe_infill = infill_losses / jnp.maximum(n_infill, 1.0)

    metrics = {
        "unweighted_loss": jnp.mean(unweighted),
        "weighted_loss": jnp.mean(weighted),
        # Per-category means, NaN-free: weight by membership.
        "motif_mse_loss": jnp.sum(safe_cond * has_motif) / jnp.maximum(jnp.sum(has_motif), 1),
        "scaffold_mse_loss": jnp.sum(safe_infill * has_motif) / jnp.maximum(jnp.sum(has_motif), 1),
        "unconditional_mse_loss": jnp.sum(safe_infill * ~has_motif)
        / jnp.maximum(jnp.sum(~has_motif), 1),
        "frac_conditioned": jnp.mean(has_motif.astype(jnp.float32)),
    }
    return jnp.mean(weighted), metrics
