"""IPA-based structure module.

Behavioral counterparts of invariant_point_attention.py,
structure_transition.py, backbone_update.py and structure_net.py under
/root/reference/genie/model/. Frames are `Rigid` pytrees; the per-layer
frame update composes a quaternion/translation predicted from the single
representation (AF2 Algorithms 22/23).
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from genie2_tpu.geometry import Rigid, quat_to_rot
from genie2_tpu.nn.primitives import SOFTPLUS_INVERSE_1, Linear


class InvariantPointAttention(nn.Module):
    """AF2 Algorithm 22 (invariant_point_attention.py:29-261), including the
    reference's output head that concatenates the pair-attended features
    (concat dim = H * (c_z + c_hidden + 4 * P_v), :90-95)."""

    c_s: int
    c_z: int
    c_hidden: int
    no_heads: int
    no_qk_points: int
    no_v_points: int
    inf: float = 1e5
    eps: float = 1e-8

    @nn.compact
    def __call__(self, s, z, t: Rigid, mask):
        h, c = self.no_heads, self.c_hidden
        pq, pv = self.no_qk_points, self.no_v_points

        # Scalar queries/keys/values: [B, N, H, C]
        q = Linear(h * c, name="linear_q")(s)
        kv = Linear(2 * h * c, name="linear_kv")(s)
        q = q.reshape(*q.shape[:-1], h, c)
        kv = kv.reshape(*kv.shape[:-1], h, 2 * c)
        k, v = kv[..., :c], kv[..., c:]

        def to_points(x, n_pts):
            # The reference lays points out as thirds: [x-coords..., y..., z...]
            # (ipa:142-167); split into 3 and stack on the last axis.
            x = jnp.stack(jnp.split(x, 3, axis=-1), axis=-1)  # [B, N, H*P, 3]
            x = t.unsqueeze(-1).apply(x)  # frames applied per residue
            return x.reshape(*x.shape[:-2], h, n_pts, 3)

        q_pts = to_points(Linear(h * pq * 3, name="linear_q_points")(s), pq)
        kv_pts = jnp.stack(
            jnp.split(Linear(h * (pq + pv) * 3, name="linear_kv_points")(s), 3, axis=-1),
            axis=-1,
        )
        kv_pts = t.unsqueeze(-1).apply(kv_pts)
        kv_pts = kv_pts.reshape(*kv_pts.shape[:-2], h, pq + pv, 3)
        k_pts, v_pts = kv_pts[..., :pq, :], kv_pts[..., pq:, :]

        # Pair bias: [B, N, N, H]
        b = Linear(h, name="linear_b")(z)

        # Scalar attention logits: [B, H, N, N]
        a = jnp.einsum("...ihc,...jhc->...hij", q, k)
        a = a * math.sqrt(1.0 / (3 * c))
        a = a + math.sqrt(1.0 / 3) * jnp.moveaxis(b, -1, -3)

        # Point attention: squared distances between transformed points.
        # [B, N, N, H, P_q]
        pt_att = jnp.sum(
            (q_pts[..., :, None, :, :, :] - k_pts[..., None, :, :, :, :]) ** 2, axis=-1
        )
        head_weights = jax.nn.softplus(
            self.param("head_weights", lambda k_, s_: jnp.full(s_, SOFTPLUS_INVERSE_1), (h,))
        )
        head_weights = head_weights * math.sqrt(1.0 / (3 * (pq * 9.0 / 2)))
        pt_att = jnp.sum(pt_att * head_weights[..., :, None], axis=-1) * (-0.5)

        mask = mask.astype(s.dtype)
        square_mask = self.inf * (mask[..., :, None] * mask[..., None, :] - 1)

        a = a + jnp.moveaxis(pt_att, -1, -3)  # [B, H, N, N]
        a = a + square_mask[..., None, :, :]
        a = jax.nn.softmax(a, axis=-1)

        # Scalar output: [B, N, H*C]
        o = jnp.einsum("...hij,...jhc->...ihc", a, v)
        o = o.reshape(*o.shape[:-2], h * c)

        # Point output, mapped back into local frames: [B, N, H, P_v, 3]
        o_pt = jnp.einsum("...hij,...jhpd->...ihpd", a, v_pts)
        o_pt = t.unsqueeze(-1).unsqueeze(-1).invert_apply(o_pt)
        o_pt_norm = jnp.sqrt(jnp.sum(o_pt**2, axis=-1) + self.eps)
        o_pt_norm = o_pt_norm.reshape(*o_pt_norm.shape[:-2], h * pv)
        o_pt_flat = o_pt.reshape(*o_pt.shape[:-3], h * pv, 3)

        # Pair output: [B, N, H*C_z]
        o_pair = jnp.einsum("...hij,...ijc->...ihc", a, z)
        o_pair = o_pair.reshape(*o_pair.shape[:-2], h * self.c_z)

        out = jnp.concatenate(
            [o, o_pt_flat[..., 0], o_pt_flat[..., 1], o_pt_flat[..., 2], o_pt_norm, o_pair],
            axis=-1,
        )
        return Linear(self.c_s, init="final", name="linear_out")(out)


class StructureTransition(nn.Module):
    """Residual 3-linear ReLU blocks + dropout + LayerNorm
    (structure_transition.py:22-71)."""

    c: int
    num_layers: int
    dropout_rate: float

    @nn.compact
    def __call__(self, s, deterministic: bool = True):
        for i in range(self.num_layers):
            s_in = s
            s = Linear(self.c, init="relu", name=f"layer_{i}_linear_1")(s)
            s = jax.nn.relu(s)
            s = Linear(self.c, init="relu", name=f"layer_{i}_linear_2")(s)
            s = jax.nn.relu(s)
            s = Linear(self.c, init="final", name=f"layer_{i}_linear_3")(s)
            s = s + s_in
        s = nn.Dropout(self.dropout_rate, deterministic=deterministic)(s)
        return nn.LayerNorm(name="layer_norm")(s)


class BackboneUpdate(nn.Module):
    """AF2 Algorithm 23 (backbone_update.py:24-65). NOTE: the fork does NOT
    zero-init this linear (init="final" commented out, :38)."""

    c_s: int

    @nn.compact
    def __call__(self, s) -> Rigid:
        params = Linear(6, name="linear")(s)
        quats, trans = params[..., :3], params[..., 3:]
        norm = jnp.sqrt(jnp.sum(quats**2, axis=-1, keepdims=True) + 1.0)
        quats = jnp.concatenate([jnp.ones_like(quats[..., :1]), quats], axis=-1) / norm
        return Rigid(quat_to_rot(quats), trans)


class StructureLayer(nn.Module):
    """s += IPA; dropout; LN; transition; frame compose
    (structure_net.py:9-116)."""

    c_s: int
    c_p: int
    c_hidden_ipa: int
    n_head_ipa: int
    n_qk_point: int
    n_v_point: int
    ipa_dropout: float
    n_structure_transition_layer: int
    structure_transition_dropout: float

    @nn.compact
    def __call__(self, s, p, t: Rigid, mask, deterministic: bool = True):
        s = s + InvariantPointAttention(
            c_s=self.c_s,
            c_z=self.c_p,
            c_hidden=self.c_hidden_ipa,
            no_heads=self.n_head_ipa,
            no_qk_points=self.n_qk_point,
            no_v_points=self.n_v_point,
            name="ipa",
        )(s, p, t, mask)
        s = nn.Dropout(self.ipa_dropout, deterministic=deterministic)(s)
        s = nn.LayerNorm(name="ipa_layer_norm")(s)
        s = StructureTransition(
            self.c_s,
            self.n_structure_transition_layer,
            self.structure_transition_dropout,
            name="transition",
        )(s, deterministic=deterministic)
        t = t.compose(BackboneUpdate(self.c_s, name="bb_update")(s))
        return s, t


class StructureNet(nn.Module):
    """n_structure_block recycles over n_structure_layer layers, collecting
    per-layer single representations (structure_net.py:119-244)."""

    c_s: int
    c_p: int
    n_structure_layer: int
    n_structure_block: int
    c_hidden_ipa: int
    n_head_ipa: int
    n_qk_point: int
    n_v_point: int
    ipa_dropout: float
    n_structure_transition_layer: int
    structure_transition_dropout: float

    @nn.compact
    def __call__(self, s, p, ts: Rigid, features, deterministic: bool = True) -> Tuple[jnp.ndarray, Rigid]:
        mask = features["residue_mask"]
        # Layers are created once and re-applied per block so that recycling
        # shares parameters, as in the reference (structure_net.py:241-242).
        layers = [
            StructureLayer(
                c_s=self.c_s,
                c_p=self.c_p,
                c_hidden_ipa=self.c_hidden_ipa,
                n_head_ipa=self.n_head_ipa,
                n_qk_point=self.n_qk_point,
                n_v_point=self.n_v_point,
                ipa_dropout=self.ipa_dropout,
                n_structure_transition_layer=self.n_structure_transition_layer,
                structure_transition_dropout=self.structure_transition_dropout,
                name=f"layer_{i}",
            )
            for i in range(self.n_structure_layer)
        ]
        states = [s]
        for _ in range(self.n_structure_block):
            for layer in layers:
                s, ts = layer(s, p, ts, mask, deterministic=deterministic)
                states.append(s)
        return jnp.stack(states, axis=0), ts
