"""Evoformer-style pair-representation stack.

Behavioral counterparts of triangular_multiplicative_update.py,
triangular_attention.py, pair_transition.py, dropout.py and
pair_transform_net.py under /root/reference/genie/model/. The triangle
einsums contract over the third node on the MXU; the optional Pallas fused
kernel lives in genie2_tpu.ops.triangle and is dispatched via `use_pallas`.

The reference's eval-time `chunk_layer` activation chunking
(tensor_utils.py:109-213) is intentionally absent: XLA fuses the transition
and attention elementwise chains, and memory is managed by remat at the
training-step level instead.
"""

from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp

from genie2_tpu.nn.primitives import Attention, Linear


class TriangleMultiplicativeUpdate(nn.Module):
    """AF2 Algorithms 11/12 (triangular_multiplicative_update.py:25-110).

    `use_pallas` routes the whole op through the fused channel-major Pallas
    pipeline (ops/trimul_fused.py) instead of the jnp/XLA path; parameters
    are identical either way (the fused path reads the same param tree)."""

    c_z: int
    c_hidden: int
    outgoing: bool = True
    use_pallas: bool = False

    def setup(self):
        self.layer_norm_in = nn.LayerNorm()
        self.linear_a_p = Linear(self.c_hidden)
        self.linear_a_g = Linear(self.c_hidden, init="gating")
        self.linear_b_p = Linear(self.c_hidden)
        self.linear_b_g = Linear(self.c_hidden, init="gating")
        self.layer_norm_out = nn.LayerNorm()
        self.linear_z = Linear(self.c_z, init="final")
        self.linear_g = Linear(self.c_z, init="gating")

    def _fused_weights(self):
        def dense(mod):
            p = mod.variables["params"]["Dense_0"]
            return p["kernel"], p["bias"]

        w = {}
        w["ln_in_scale"] = self.layer_norm_in.variables["params"]["scale"]
        w["ln_in_bias"] = self.layer_norm_in.variables["params"]["bias"]
        w["ln_out_scale"] = self.layer_norm_out.variables["params"]["scale"]
        w["ln_out_bias"] = self.layer_norm_out.variables["params"]["bias"]
        w["w_ap"], w["b_ap"] = dense(self.linear_a_p)
        w["w_ag"], w["b_ag"] = dense(self.linear_a_g)
        w["w_bp"], w["b_bp"] = dense(self.linear_b_p)
        w["w_bg"], w["b_bg"] = dense(self.linear_b_g)
        w["w_z"], w["b_z"] = dense(self.linear_z)
        w["w_g"], w["b_g"] = dense(self.linear_g)
        return w

    def __call__(self, z, mask=None, res_mask=None):
        if mask is None:
            mask = jnp.ones(z.shape[:-1], dtype=z.dtype)

        if (
            self.use_pallas
            and not self.is_initializing()
            and res_mask is not None
            and z.shape[1] % 128 == 0  # kernel tiling constraint
            and self.c_hidden % 8 == 0  # channel-grid tiling constraint
        ):
            from genie2_tpu.ops.trimul_fused import trimul_fused

            return trimul_fused(
                z, res_mask.astype(z.dtype), self._fused_weights(),
                outgoing=self.outgoing,
            )

        mask = mask[..., None].astype(z.dtype)
        z = self.layer_norm_in(z)
        # NOTE: fusing the four gate projections into one [c_z, 4*c_hidden]
        # matmul was measured SLOWER on v5e (the wide intermediate
        # materializes; XLA fuses the sigmoid-gate epilogue better with
        # separate dots), so the reference's separate-linear structure stays.
        a = self.linear_a_p(z) * jax.nn.sigmoid(self.linear_a_g(z))
        a = a * mask
        b = self.linear_b_p(z) * jax.nn.sigmoid(self.linear_b_g(z))
        b = b * mask

        from genie2_tpu.ops.triangle import triangle_multiply_reference

        # x[i, j, c] = sum_k a[i, k, c] b[j, k, c]   (outgoing)
        # x[i, j, c] = sum_k a[k, i, c] b[k, j, c]   (incoming)
        x = triangle_multiply_reference(a, b, outgoing=self.outgoing)

        x = self.layer_norm_out(x)
        x = self.linear_z(x)
        g = jax.nn.sigmoid(self.linear_g(z))
        return x * g


class TriangleAttention(nn.Module):
    """AF2 Algorithms 13/14 (triangular_attention.py:30-144). `starting`
    selects row-wise attention; the ending-node variant transposes the pair
    axes around the same computation.

    `row_chunk` > 0 scans the row axis in chunks of that size so the
    [B, N, H, N, N] logits never materialize — the long-context path
    (O(row_chunk * H * N^2) peak instead of O(H * N^3), which is the
    reference's OOM wall past N~512; its eval-time chunk_layer
    (tensor_utils.py:109-213) chunked the same axis outside autograd
    only). Identical numerics; works under remat and seq-sharding."""

    c_in: int
    c_hidden: int
    no_heads: int
    starting: bool = True
    inf: float = 1e9
    row_chunk: int = 0

    @nn.compact
    def __call__(self, x, mask=None):
        if mask is None:
            mask = jnp.ones(x.shape[:-1], dtype=x.dtype)
        if not self.starting:
            x = jnp.swapaxes(x, -2, -3)
            mask = jnp.swapaxes(mask, -1, -2)

        x = nn.LayerNorm(name="layer_norm")(x)
        # [*, I, 1, 1, J] mask bias over keys
        mask_bias = self.inf * (mask[..., :, None, None, :].astype(x.dtype) - 1)
        # [*, 1, H, I, J] triangle bias from the pair rep itself
        triangle_bias = Linear(
            self.no_heads, use_bias=False, init="normal", name="linear"
        )(x)
        triangle_bias = jnp.moveaxis(triangle_bias, -1, -3)[..., None, :, :, :]

        out = Attention(
            c_q=self.c_in,
            c_k=self.c_in,
            c_v=self.c_in,
            c_hidden=self.c_hidden,
            no_heads=self.no_heads,
            row_chunk=self.row_chunk,
            name="mha",
        )(x, x, x, biases=[mask_bias, triangle_bias])

        if not self.starting:
            out = jnp.swapaxes(out, -2, -3)
        return out


class PairTransition(nn.Module):
    """AF2 Algorithm 15 (pair_transition.py:24-87)."""

    c_z: int
    n: int

    @nn.compact
    def __call__(self, z, mask=None):
        if mask is None:
            mask = jnp.ones(z.shape[:-1], dtype=z.dtype)
        mask = mask[..., None].astype(z.dtype)
        z = nn.LayerNorm(name="layer_norm")(z)
        z = Linear(self.n * self.c_z, init="relu", name="linear_1")(z)
        z = jax.nn.relu(z)
        return Linear(self.c_z, init="final", name="linear_2")(z) * mask


class PairTransformLayer(nn.Module):
    """TriMulOut + TriMulIn (row dropout) [+ TriAttStart/End] + PairTransition,
    residual, masked (pair_transform_net.py:18-119)."""

    c_p: int
    include_mul_update: bool
    include_tri_att: bool
    c_hidden_mul: int
    c_hidden_tri_att: int
    n_head_tri: int
    tri_dropout: float
    pair_transition_n: int
    use_pallas: bool = False
    tri_att_chunk: int = 0

    @nn.compact
    def __call__(self, p, pair_mask, deterministic: bool = True, res_mask=None):
        # Row-wise dropout shares the mask along the i axis (dim -3);
        # column-wise along the j axis (dim -2) (dropout.py:23-77).
        drop_row = nn.Dropout(
            self.tri_dropout, broadcast_dims=(p.ndim - 3,), deterministic=deterministic
        )
        drop_col = nn.Dropout(
            self.tri_dropout, broadcast_dims=(p.ndim - 2,), deterministic=deterministic
        )

        if self.include_mul_update:
            p = p + drop_row(
                TriangleMultiplicativeUpdate(
                    self.c_p, self.c_hidden_mul, outgoing=True,
                    use_pallas=self.use_pallas, name="tri_mul_out",
                )(p, pair_mask, res_mask)
            )
            p = p + drop_row(
                TriangleMultiplicativeUpdate(
                    self.c_p, self.c_hidden_mul, outgoing=False,
                    use_pallas=self.use_pallas, name="tri_mul_in",
                )(p, pair_mask, res_mask)
            )
        if self.include_tri_att:
            p = p + drop_row(
                TriangleAttention(
                    self.c_p, self.c_hidden_tri_att, self.n_head_tri,
                    starting=True, row_chunk=self.tri_att_chunk,
                    name="tri_att_start",
                )(p, pair_mask)
            )
            p = p + drop_col(
                TriangleAttention(
                    self.c_p, self.c_hidden_tri_att, self.n_head_tri,
                    starting=False, row_chunk=self.tri_att_chunk,
                    name="tri_att_end",
                )(p, pair_mask)
            )
        p = p + PairTransition(self.c_p, self.pair_transition_n, name="pair_transition")(
            p, pair_mask
        )
        return p * pair_mask[..., None].astype(p.dtype)


class PairTransformNet(nn.Module):
    """Stack of PairTransformLayers (pair_transform_net.py:121-231)."""

    c_p: int
    n_pair_transform_layer: int
    include_mul_update: bool
    include_tri_att: bool
    c_hidden_mul: int
    c_hidden_tri_att: int
    n_head_tri: int
    tri_dropout: float
    pair_transition_n: int
    use_pallas: bool = False
    tri_att_chunk: int = 0

    remat: bool = True
    # Optional NamedSharding (batch over 'data', i-axis over 'seq'); the
    # constraint after every layer keeps GSPMD from re-replicating the
    # O(N^2) residual stream between layers (see parallel.pair_sharding).
    pair_sharding: object = None

    @nn.compact
    def __call__(self, p, features, deterministic: bool = True):
        from genie2_tpu.parallel import constrain

        mask = features["residue_mask"].astype(p.dtype)
        pair_mask = mask[:, :, None] * mask[:, None, :]
        pair_mask = constrain(pair_mask, self.pair_sharding)
        # Rematerialize each pair layer in the backward pass: the stack's
        # O(N^2 * c) intermediates otherwise exceed HBM at N=256 during
        # training (measured: a 40x step-time cliff from spilling).
        layer_cls = (
            nn.remat(PairTransformLayer, static_argnums=(3,))
            if self.remat
            else PairTransformLayer
        )
        for i in range(self.n_pair_transform_layer):
            p = layer_cls(
                c_p=self.c_p,
                include_mul_update=self.include_mul_update,
                include_tri_att=self.include_tri_att,
                c_hidden_mul=self.c_hidden_mul,
                c_hidden_tri_att=self.c_hidden_tri_att,
                n_head_tri=self.n_head_tri,
                tri_dropout=self.tri_dropout,
                pair_transition_n=self.pair_transition_n,
                use_pallas=self.use_pallas,
                tri_att_chunk=self.tri_att_chunk,
                name=f"layer_{i}",
            )(p, pair_mask, deterministic, mask)
            p = constrain(p, self.pair_sharding)
        return p
