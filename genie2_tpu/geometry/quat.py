"""Quaternion <-> rotation-matrix conversions.

Behavioral counterpart of /root/reference/genie/utils/affine_utils.py:299-355.
Quaternion ordering is (w, x, y, z) = (a, b, c, d).

`quat_to_rot` uses the un-normalized quadratic form of the reference's
precomputed `_qtr_mat` table (affine_utils.py:312-334): it is exact for unit
quaternions and matches the reference bit-for-bit for arbitrary inputs.

`rot_to_quat` offers two methods:
  * "eigh"   — eigen-decomposition of the 4x4 Davenport K-matrix, the
               reference algorithm (affine_utils.py:336-355). Eigenvector
               sign is implementation-defined, so outputs may differ from
               torch by a global sign per matrix.
  * "closed" — branchless Shepperd extraction with a canonical sign
               (largest-|component| positive). Fast, purely elementwise
               (VPU-friendly), differentiable almost everywhere; the
               default for the TPU compute path.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_to_rot(quat: jnp.ndarray) -> jnp.ndarray:
    """[*, 4] (w,x,y,z) -> [*, 3, 3]; exact for unit quaternions."""
    a, b, c, d = (quat[..., i] for i in range(4))
    aa, bb, cc, dd = a * a, b * b, c * c, d * d
    ab, ac, ad = a * b, a * c, a * d
    bc, bd, cd = b * c, b * d, c * d
    row0 = jnp.stack([aa + bb - cc - dd, 2 * bc - 2 * ad, 2 * bd + 2 * ac], axis=-1)
    row1 = jnp.stack([2 * bc + 2 * ad, aa - bb + cc - dd, 2 * cd - 2 * ab], axis=-1)
    row2 = jnp.stack([2 * bd - 2 * ac, 2 * cd + 2 * ab, aa - bb - cc + dd], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def _k_matrix(rot: jnp.ndarray) -> jnp.ndarray:
    xx, xy, xz = rot[..., 0, 0], rot[..., 0, 1], rot[..., 0, 2]
    yx, yy, yz = rot[..., 1, 0], rot[..., 1, 1], rot[..., 1, 2]
    zx, zy, zz = rot[..., 2, 0], rot[..., 2, 1], rot[..., 2, 2]
    k = jnp.stack(
        [
            jnp.stack([xx + yy + zz, zy - yz, xz - zx, yx - xy], axis=-1),
            jnp.stack([zy - yz, xx - yy - zz, xy + yx, xz + zx], axis=-1),
            jnp.stack([xz - zx, xy + yx, yy - xx - zz, yz + zy], axis=-1),
            jnp.stack([yx - xy, xz + zx, yz + zy, zz - xx - yy], axis=-1),
        ],
        axis=-2,
    )
    return k / 3.0


def rot_to_quat(rot: jnp.ndarray, method: str = "closed") -> jnp.ndarray:
    """[*, 3, 3] -> [*, 4] unit quaternion (w,x,y,z)."""
    if method == "eigh":
        _, vectors = jnp.linalg.eigh(_k_matrix(rot))
        return vectors[..., -1]
    if method != "closed":
        raise ValueError(f"unknown rot_to_quat method: {method}")

    xx, xy, xz = rot[..., 0, 0], rot[..., 0, 1], rot[..., 0, 2]
    yx, yy, yz = rot[..., 1, 0], rot[..., 1, 1], rot[..., 1, 2]
    zx, zy, zz = rot[..., 2, 0], rot[..., 2, 1], rot[..., 2, 2]

    # Four candidate extractions, each numerically stable in a different
    # region; 4*q_i*q = the stacked rows below (standard Shepperd identities).
    tr = xx + yy + zz
    qw = jnp.stack([1.0 + tr, zy - yz, xz - zx, yx - xy], axis=-1)
    qx = jnp.stack([zy - yz, 1.0 + xx - yy - zz, xy + yx, xz + zx], axis=-1)
    qy = jnp.stack([xz - zx, xy + yx, 1.0 + yy - xx - zz, yz + zy], axis=-1)
    qz = jnp.stack([yx - xy, xz + zx, yz + zy, 1.0 + zz - xx - yy], axis=-1)

    # Candidate i has leading term 4*q_i^2 on its diagonal entry; pick the
    # candidate with the largest diagonal (most stable denominator).
    # NOTE: selection is arithmetic (one-hot weighted sum), not
    # take_along_axis — batched small-axis gathers lower catastrophically on
    # TPU (measured 20 ms per denoiser step at [4,256,256] before this).
    diags = jnp.stack(
        [qw[..., 0], qx[..., 1], qy[..., 2], qz[..., 3]], axis=-1
    )  # [*, 4]
    m = jnp.max(diags, axis=-1, keepdims=True)
    # Break exact ties toward the first candidate so exactly one is chosen.
    is_best = diags >= m
    first_best = is_best & (jnp.cumsum(is_best, axis=-1) == 1)
    w = first_best.astype(qw.dtype)
    q = (
        w[..., 0:1] * qw
        + w[..., 1:2] * qx
        + w[..., 2:3] * qy
        + w[..., 3:4] * qz
    )
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)

    # Canonical sign: make the largest-magnitude component positive
    # (same gather-free selection).
    absq = jnp.abs(q)
    am = jnp.max(absq, axis=-1, keepdims=True)
    sel = (absq >= am) & (jnp.cumsum(absq >= am, axis=-1) == 1)
    lead = jnp.sum(jnp.where(sel, q, 0.0), axis=-1, keepdims=True)
    return q * jnp.sign(lead)
