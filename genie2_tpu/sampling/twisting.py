"""Twisted Diffusion Sampler twisting potential + motif placement machinery.

Behavioral counterpart of the placement enumeration
(/root/reference/genie/sampler/unconditional_smc.py:172-231), the x-start
variance table (:291-309) and the twisting potential (:310-345).

Placements are enumerated host-side into a dense [n_offsets, n_motif_res]
int32 position table; on device the potential is a gather + center + squared
distance + logsumexp — no boolean masks, no autograd plumbing (jax.grad
differentiates straight through the denoiser).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def enumerate_motif_placements(
    length: int,
    segment_lengths: Sequence[int],
    max_offsets: int = 1000,
    rng: Optional[np.random.Generator] = None,
) -> List[Tuple[Tuple[int, int], ...]]:
    """All non-overlapping, in-order placements of the given segments in a
    sequence of `length` residues, as ((start, end), ...) tuples (inclusive
    ends); uniformly subsampled to max_offsets when exhaustive enumeration
    is larger (unconditional_smc.py:173-213)."""

    def recurse(L, seg_lens):
        first = seg_lens[0]
        out = []
        for st in range(0, L - sum(seg_lens) + 1):
            end = st + first - 1
            if len(seg_lens) == 1:
                out.append(((st, end),))
            else:
                for later in recurse(L - (end + 1), seg_lens[1:]):
                    shifted = tuple((s + end + 1, e + end + 1) for s, e in later)
                    out.append(((st, end),) + shifted)
        return out

    placements = recurse(length, list(segment_lengths))
    if len(placements) > max_offsets:
        rng = rng or np.random.default_rng()
        idx = rng.choice(len(placements), max_offsets, replace=False)
        placements = [placements[i] for i in idx]
    return placements


def placements_to_positions(
    placements: List[Tuple[Tuple[int, int], ...]]
) -> np.ndarray:
    """[n_offsets, n_motif_res] residue indices, segments concatenated in
    order — the dense-gather equivalent of the reference's boolean
    motif_index_mask (unconditional_smc.py:218-231)."""
    rows = []
    for placement in placements:
        row = []
        for start, end in placement:
            row.extend(range(start, end + 1))
        rows.append(row)
    return np.asarray(rows, dtype=np.int32)


def xstart_variance(
    alphas_cumprod_t, tausq: float = 0.012, var_type: int = 6, beta_t=None
):
    """The reference's x-start variance heuristic table
    (unconditional_smc.py:291-309), sigma^2 = (1 - abar)/abar:

      1: sigma^2                    (plain)
      2: sigma^2/(sigma^2 + 1)      (pseudoinverse-guided, tau^2 = 1)
      5: shrunk with tau^2 = 0.30
      4: beta_t / sqrt(abar)        (pseudoinverse-guided Alg. 1)
      6: sigma^2 tau^2/(sigma^2+tau^2) with caller tau^2 (default, 0.012)
    """
    sigmasq = (1.0 - alphas_cumprod_t) / alphas_cumprod_t
    if var_type == 1:
        return sigmasq
    if var_type == 2:
        return sigmasq / (sigmasq + 1.0)
    if var_type == 5:
        return (sigmasq * 0.30) / (sigmasq + 0.30)
    if var_type == 4:
        if beta_t is None:
            raise ValueError("var_type 4 needs beta_t")
        return beta_t / jnp.sqrt(alphas_cumprod_t)
    if var_type == 6:
        return (sigmasq * tausq) / (sigmasq + tausq)
    raise ValueError(f"unknown var_type: {var_type}")


def twisting_log_prob(
    x0: jnp.ndarray,
    positions: jnp.ndarray,
    motif_target: jnp.ndarray,
    variance,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """log p~(y | x_t) = logsumexp_o [ -|| center(x0[o-placement]) - y ||^2
    / (2 sigma~^2) ] - log O  (unconditional_smc.py:310-345).

    Args:
        x0: [P, L, 3] predicted x-start per particle.
        positions: [O, M] int32 placement table.
        motif_target: [M, 3] COM-centered motif coordinates.
        variance: scalar sigma~^2.

    Returns:
        (log_prob [P], per-placement scores [P, O]).
    """
    sel = _select_placements(x0, positions)
    sel = sel - jnp.mean(sel, axis=-2, keepdims=True)
    score = -jnp.sum((sel - motif_target[None, None]) ** 2, axis=(-1, -2)) / (
        2.0 * variance
    )
    n_offsets = positions.shape[0]
    log_prob = jax.nn.logsumexp(score, axis=-1) - jnp.log(float(n_offsets))
    return log_prob, score


def _select_placements(x0: jnp.ndarray, positions: jnp.ndarray) -> jnp.ndarray:
    """[P, L, 3] coords + [O, M] placement table -> [P, O, M, 3].

    Implemented as a one-hot contraction, NOT x0[:, positions]: batched
    gathers lower catastrophically on TPU (same lesson as rot_to_quat —
    see BENCH_NOTES.md), while this einsum is a tiny MXU matmul. The
    gradient (needed through the twisting potential) is the transposed
    matmul — a scatter-free scatter-add.
    """
    onehot = jax.nn.one_hot(positions, x0.shape[1], dtype=x0.dtype)  # [O, M, L]
    return jnp.einsum("oml,pld->pomd", onehot, x0)


def motif_frame_rotations(
    segments: Sequence[np.ndarray],
) -> Tuple[np.ndarray, np.ndarray]:
    """Frenet frames of the motif target, per segment, plus the interior
    weighting mask.

    Closes the SO(3)-twisting capability of the reference's vendored
    twisted_diffusion/twisting.py:198-273 (tangent-normal rotation
    log-likelihood with the identity-perturbation autograd trick),
    Genie-natively: Genie never diffuses rotations — frames are a
    deterministic (Frenet) function of coordinates — so the rotation
    potential is just an extra term on Frenet frames of x-hat-0 and
    jax.grad differentiates through the frame computation directly; no
    manual tangent-space perturbation is needed.

    Each segment is treated as its own chain for the frame computation
    (its boundary residues copy their neighbor's frame). The mask is True
    only for segment-INTERIOR residues: a boundary residue's frame in the
    *placed* structure depends on unknown scaffold neighbors, so comparing
    it against the motif's copied-edge frame would be inconsistent.
    Segments shorter than 3 residues contribute no rotation term.

    Returns (rots [M, 3, 3], interior_mask [M] float32).
    """
    from genie2_tpu.geometry import frenet_frames

    coords = np.concatenate(segments, axis=0).astype(np.float32)
    chain_index = np.concatenate(
        [np.full(len(s), i, np.int32) for i, s in enumerate(segments)]
    )
    mask = np.ones(len(coords), np.int32)
    rots = np.asarray(
        frenet_frames(
            jnp.asarray(coords)[None], jnp.asarray(chain_index)[None],
            jnp.asarray(mask)[None],
        )
    )[0]
    interior = []
    for s in segments:
        m = np.zeros(len(s), np.float32)
        if len(s) >= 3:
            m[1:-1] = 1.0
        interior.append(m)
    return rots, np.concatenate(interior)


def twisting_log_prob_frames(
    x0: jnp.ndarray,
    rots0: jnp.ndarray,
    positions: jnp.ndarray,
    motif_target: jnp.ndarray,
    variance,
    motif_rots: jnp.ndarray,
    rot_mask: jnp.ndarray,
    rot_variance,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Translation + rotation twisting potential.

    log p~(y | x_t) = logsumexp_o [ -||center(x0[o]) - y||^2 / (2 s~^2)
                                    -||R(x0)[o] - R_y||_F^2 m / (4 s~_R^2) ]
                      - log O

    The rotation term is the reference's Frobenius tangent-normal
    approximation (twisting.py:258-263: -||R_pred - R_obs||^2 / (4 s^2)),
    restricted to segment-interior residues by `rot_mask`.

    Args:
        x0: [P, L, 3] predicted x-start.
        rots0: [P, L, 3, 3] Frenet frames of x0 (computed by the caller so
            the gradient flows through one frame computation).
        positions: [O, M] placement table.
        motif_target: [M, 3] centered motif coordinates.
        motif_rots: [M, 3, 3] motif Frenet frames (motif_frame_rotations).
        rot_mask: [M] interior weighting.
    Returns:
        (log_prob [P], per-placement scores [P, O]).
    """
    sel = _select_placements(x0, positions)
    sel = sel - jnp.mean(sel, axis=-2, keepdims=True)
    score = -jnp.sum((sel - motif_target[None, None]) ** 2, axis=(-1, -2)) / (
        2.0 * variance
    )

    onehot = jax.nn.one_hot(positions, x0.shape[1], dtype=x0.dtype)  # [O, M, L]
    sel_r = jnp.einsum("oml,plde->pomde", onehot, rots0)  # [P, O, M, 3, 3]
    diff2 = jnp.sum((sel_r - motif_rots[None, None]) ** 2, axis=(-1, -2))
    score = score - jnp.sum(diff2 * rot_mask[None, None], axis=-1) / (
        4.0 * rot_variance
    )

    n_offsets = positions.shape[0]
    log_prob = jax.nn.logsumexp(score, axis=-1) - jnp.log(float(n_offsets))
    return log_prob, score


def motif_distance(x0, positions, motif_target):
    """Mean squared deviation between placed-and-centered x0 and the motif,
    for monitoring (unconditional_smc.py:327)."""
    sel = _select_placements(x0, positions)
    sel = sel - jnp.mean(sel, axis=-2, keepdims=True)
    return jnp.mean((sel - motif_target[None, None]) ** 2)
