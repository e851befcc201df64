"""Rigid transforms (rotation + translation) as a JAX pytree.

Behavioral counterpart of the reference's `T` class
(/root/reference/genie/utils/affine_utils.py:54-244), redesigned as an
immutable NamedTuple so it threads through jit/scan/grad transparently.
Rotations are stored as [..., 3, 3] matrices, translations as [..., 3].
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


def rot_vec_mul(r: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Apply rotation matrices to vectors: r @ v with broadcasting.

    r: [..., 3, 3], v: [..., 3] -> [..., 3].
    """
    return jnp.einsum("...ij,...j->...i", r, v)


def rot_matmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Compose rotation matrices: a @ b with broadcasting over batch dims.

    The reference hand-unrolls this to dodge TF32 tensor cores
    (affine_utils.py:24-42); on TPU we instead request full-precision
    accumulation explicitly.
    """
    return jnp.einsum("...ij,...jk->...ik", a, b, precision="highest")


class Rigid(NamedTuple):
    """A rigid transform x -> rots @ x + trans.

    rots:  [..., 3, 3]
    trans: [..., 3]
    """

    rots: jnp.ndarray
    trans: jnp.ndarray

    @property
    def batch_shape(self):
        return self.trans.shape[:-1]

    @staticmethod
    def identity(batch_shape, dtype=jnp.float32) -> "Rigid":
        rots = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3))
        trans = jnp.zeros((*batch_shape, 3), dtype=dtype)
        return Rigid(rots, trans)

    def compose(self, other: "Rigid") -> "Rigid":
        """self ∘ other (apply `other` first in point space convention of
        the reference: rot = R1 R2, trans = R1 t2 + t1; affine_utils.py:109-116)."""
        rot = rot_matmul(self.rots, other.rots)
        trn = rot_vec_mul(self.rots, other.trans) + self.trans
        return Rigid(rot, trn)

    def apply(self, pts: jnp.ndarray) -> jnp.ndarray:
        """Apply to points [..., 3]."""
        return rot_vec_mul(self.rots, pts) + self.trans

    def invert_apply(self, pts: jnp.ndarray) -> jnp.ndarray:
        """Apply the inverse transform to points."""
        return rot_vec_mul(jnp.swapaxes(self.rots, -1, -2), pts - self.trans)

    def invert(self) -> "Rigid":
        rot_inv = jnp.swapaxes(self.rots, -1, -2)
        return Rigid(rot_inv, -rot_vec_mul(rot_inv, self.trans))

    def scale_translation(self, factor) -> "Rigid":
        return Rigid(self.rots, self.trans * factor)

    def unsqueeze(self, axis: int) -> "Rigid":
        """Insert a batch axis (axis counted in batch dims, as in the reference)."""
        rots = jnp.expand_dims(self.rots, axis if axis >= 0 else axis - 2)
        trans = jnp.expand_dims(self.trans, axis if axis >= 0 else axis - 1)
        return Rigid(rots, trans)

    def map_coords(self, fn) -> "Rigid":
        return Rigid(fn(self.rots), fn(self.trans))

    @staticmethod
    def from_3_points(p_neg_x_axis, origin, p_xy_plane, eps: float = 1e-8) -> "Rigid":
        """Gram-Schmidt frame construction (affine_utils.py:187-203)."""
        v1 = origin - p_neg_x_axis
        v2 = p_xy_plane - origin
        e1 = v1 / jnp.sqrt(jnp.sum(v1**2, axis=-1, keepdims=True) + eps)
        u2 = v2 - e1 * jnp.sum(v2 * e1, axis=-1, keepdims=True)
        e2 = u2 / jnp.sqrt(jnp.sum(u2**2, axis=-1, keepdims=True) + eps)
        e3 = jnp.cross(e1, e2)
        rots = jnp.stack([e1, e2, e3], axis=-1)
        return Rigid(rots, origin)
