"""Single and pair feature networks.

Behavioral counterparts of /root/reference/genie/model/single_feature_net.py
and pair_feature_net.py, including the fork's deltas: the doubled
fixed_sequence_mask channel in the single net (single_feature_net.py:134-142)
and the differentiable soft distance bins softmax(-4|d - v|) in the pair net
(pair_feature_net.py:259-263).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from genie2_tpu.geometry import Rigid, distogram, rot_to_quat, sinusoidal_encoding
from genie2_tpu.nn.primitives import Linear


class SingleFeatureNet(nn.Module):
    """concat[pos_emb, chain_emb, timestep_emb, aatype*fixed_seq_mask,
    fixed_seq_mask x2, interface_mask] -> bias-free Linear -> * residue_mask
    (single_feature_net.py:58-142)."""

    c_s: int
    n_timestep: int
    c_pos_emb: int
    c_chain_emb: int
    c_timestep_emb: int
    max_n_res: int
    max_n_chain: int

    @nn.compact
    def __call__(self, ts: Rigid, timesteps, features):
        n = ts.trans.shape[1]
        pos_emb = sinusoidal_encoding(
            features["residue_index"], self.max_n_res, self.c_pos_emb
        )
        chain_emb = sinusoidal_encoding(
            features["chain_index"], self.max_n_chain, self.c_chain_emb
        )
        t_broadcast = jnp.repeat(timesteps[:, None], n, axis=1)
        timestep_emb = sinusoidal_encoding(
            t_broadcast, self.n_timestep, self.c_timestep_emb
        )

        fixed_seq = features["fixed_sequence_mask"].astype(pos_emb.dtype)
        interface = features["interface_mask"].astype(pos_emb.dtype)
        aatype_emb = features["aatype"].astype(pos_emb.dtype) * fixed_seq[..., None]

        inputs = jnp.concatenate(
            [
                pos_emb,
                chain_emb,
                timestep_emb,
                aatype_emb,
                fixed_seq[..., None],
                fixed_seq[..., None],
                interface[..., None],
            ],
            axis=-1,
        )
        s = Linear(self.c_s, use_bias=False, name="linear")(inputs)
        return s * features["residue_mask"][..., None].astype(s.dtype)


class PairFeatureNet(nn.Module):
    """Outer sum + relative position encoding + noised-structure template +
    motif template (pair_feature_net.py:72-301).

    The relpos encoding and the motif template depend only on static
    features, not on the noised structure or the timestep; `static_bias`
    computes their sum once so samplers can hoist it out of the reverse
    loop (the reference recomputes both on all 1000 steps)."""

    c_s: int
    c_p: int
    n_timestep: int
    relpos_k: int
    template_dist_min: float
    template_dist_step: float
    template_dist_n_bin: int
    # "closed" (canonical-sign, TPU default) or "eigh" (the reference's
    # torch.linalg.eigh path); see geometry/quat.py and the round-3
    # quat-sign study in BENCH_NOTES.md.
    quat_method: str = "closed"

    def setup(self):
        self.linear_s_p_i = Linear(self.c_p, use_bias=False)
        self.linear_s_p_j = Linear(self.c_p, use_bias=False)
        self.linear_relpos = Linear(self.c_p, use_bias=False)
        self.linear_template = Linear(self.c_p, use_bias=False)
        self.linear_motif_template = Linear(self.c_p, use_bias=False)

    def _relpos(self, features, dtype):
        """AF2 Algorithm 4/5 with an extra cross-chain bin
        (pair_feature_net.py:166-221)."""
        ri = features["residue_index"]
        ci = features["chain_index"]
        k = self.relpos_k
        n_bin = 2 * k + 2

        same_chain = ci[:, :, None] == ci[:, None, :]
        d_same = jnp.clip(ri[:, :, None] - ri[:, None, :] + k, 0, 2 * k)
        d = jnp.where(same_chain, d_same, 2 * k + 1)
        oh = jax.nn.one_hot(d, n_bin, dtype=dtype)
        feats = jnp.concatenate([oh, same_chain[..., None].astype(dtype)], axis=-1)
        return self.linear_relpos(feats)

    def _encode_positions(self, coords, mask):
        """Soft distance bins: softmax(-4 |d - v|), masked pairwise
        (pair_feature_py:223-269)."""
        d = distogram(coords, coords)  # [B, N, N]
        v = self.template_dist_min + self.template_dist_step * jnp.arange(
            self.template_dist_n_bin, dtype=d.dtype
        )
        oh = jax.nn.softmax(-4.0 * jnp.abs(d[..., None] - v), axis=-1)
        pair_mask = mask[:, :, None] * mask[:, None, :]
        return oh * pair_mask[..., None].astype(oh.dtype)

    def _encode_orientations(self, rots, mask):
        """Pairwise orientation quaternions. NOTE: the reference composes
        r[i, j] = R_j @ R_i via broadcasting (pair_feature_net.py:286-291) —
        not R_i^T R_j — and we keep that convention
        (pair_feature_net.py:271-301)."""
        r = jnp.matmul(rots[:, None, :, :, :], rots[:, :, None, :, :])
        q = rot_to_quat(r, method=self.quat_method)
        pair_mask = mask[:, :, None] * mask[:, None, :]
        return q * pair_mask[..., None].astype(q.dtype)

    def static_bias(self, features, dtype=jnp.float32):
        """relpos + motif-template contribution: constant across diffusion
        steps for a fixed batch."""
        fixed_structure = features["fixed_structure_mask"].astype(dtype)
        fixed_seq = features["fixed_sequence_mask"].astype(dtype)
        bias = self._relpos(features, dtype)
        motif_template = jnp.concatenate(
            [
                self._encode_positions(
                    features["atom_positions"].astype(dtype), fixed_seq
                )
                * fixed_structure[..., None],
                fixed_structure[..., None],
                fixed_structure[..., None],
            ],
            axis=-1,
        )
        return bias + self.linear_motif_template(motif_template)

    def __call__(self, s, ts: Rigid, timesteps, features, static_bias=None):
        dtype = s.dtype
        residue_mask = features["residue_mask"].astype(dtype)
        pair_mask = residue_mask[:, :, None] * residue_mask[:, None, :]
        fixed_structure = features["fixed_structure_mask"].astype(dtype)

        p_i = self.linear_s_p_i(s)
        p_j = self.linear_s_p_j(s)
        p = p_i[:, :, None, :] + p_j[:, None, :, :]

        # Template of the noised structure: soft distogram + pairwise
        # orientation quaternions + doubled structure mask channel.
        template = jnp.concatenate(
            [
                self._encode_positions(ts.trans, residue_mask),
                self._encode_orientations(ts.rots, residue_mask),
                fixed_structure[..., None],
                fixed_structure[..., None],
            ],
            axis=-1,
        )
        p += self.linear_template(template)

        if static_bias is None:
            static_bias = self.static_bias(features, dtype)
        p += static_bias.astype(dtype)

        return p * pair_mask[..., None]
