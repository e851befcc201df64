"""Row-chunked triangle attention (the long-context memory knob).

TriangleAttention's logits are [B, N, H, N, N] — O(H N^3), the memory wall
that previously forced N=1024 to run tri-mul-only. `row_chunk`
(config key triangleAttentionChunk) scans the row axis in chunks so peak
logit memory is O(chunk * H * N^2) with numerics identical to the
unchunked path (the softmax key axis is never split). Reference
counterpart: eval-only chunk_layer (tensor_utils.py:109-213), which the
reference never wired into training.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genie2_tpu.nn.pair_stack import PairTransformNet, TriangleAttention


def _pair_inputs(batch=2, n=16, c=8, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    x = jax.random.normal(k1, (batch, n, n, c))
    # Ragged mask: second sample has padding.
    res_mask = np.ones((batch, n), np.float32)
    res_mask[1, n - 5 :] = 0.0
    mask = jnp.asarray(res_mask[:, :, None] * res_mask[:, None, :])
    return x, mask, jnp.asarray(res_mask), k2


class TestRowChunkedTriangleAttention:
    @pytest.mark.parametrize("starting", [True, False], ids=["start", "end"])
    @pytest.mark.parametrize("chunk", [1, 4, 8])
    def test_chunked_matches_unchunked(self, starting, chunk):
        x, mask, _, _ = _pair_inputs()
        plain = TriangleAttention(8, 4, 2, starting=starting)
        chunked = TriangleAttention(8, 4, 2, starting=starting, row_chunk=chunk)
        params = plain.init(jax.random.PRNGKey(1), x, mask)
        out_p = jax.jit(plain.apply)(params, x, mask)
        out_c = jax.jit(chunked.apply)(params, x, mask)
        np.testing.assert_allclose(
            np.asarray(out_p), np.asarray(out_c), atol=1e-6, rtol=1e-6
        )

    @pytest.mark.parametrize("n,chunk", [(16, 5), (17, 8), (13, 8)])
    def test_non_divisible_pads_ragged_tail(self, n, chunk):
        # Non-divisible (incl. prime) n_row: the scan pads the row axis to
        # the next chunk multiple and discards the tail, keeping the
        # requested chunk size — never a silent full-logits fallback (the
        # O(H N^3) blowup the flag exists to prevent) and never a
        # chunk=1 divisor degradation (n_row scan dispatches).
        x, mask, _, _ = _pair_inputs(n=n)
        plain = TriangleAttention(8, 4, 2)
        odd = TriangleAttention(8, 4, 2, row_chunk=chunk)
        params = plain.init(jax.random.PRNGKey(1), x, mask)
        np.testing.assert_allclose(
            np.asarray(jax.jit(plain.apply)(params, x, mask)),
            np.asarray(jax.jit(odd.apply)(params, x, mask)),
            atol=1e-6, rtol=1e-6,
        )

    def test_non_divisible_gradients_match(self):
        # Gradients flow through the pad+slice unchanged (pad rows are
        # disconnected from the sliced output).
        x, mask, _, _ = _pair_inputs(n=13)
        plain = TriangleAttention(8, 4, 2)
        chunked = TriangleAttention(8, 4, 2, row_chunk=8)
        params = plain.init(jax.random.PRNGKey(1), x, mask)

        def grads(mod):
            def f(p, xin):
                return jnp.sum(mod.apply(p, xin, mask) ** 2)

            return jax.jit(jax.grad(f, argnums=(0, 1)))(params, x)

        g_p, gx_p = grads(plain)
        g_c, gx_c = grads(chunked)
        np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_c), atol=1e-5)
        for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_c)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_gradients_match(self):
        """The chunked scan differentiates to the same gradients (training
        path; the reference's chunk_layer was inference-only)."""
        x, mask, _, _ = _pair_inputs()
        plain = TriangleAttention(8, 4, 2)
        chunked = TriangleAttention(8, 4, 2, row_chunk=4)
        params = plain.init(jax.random.PRNGKey(1), x, mask)

        def loss(mod):
            def f(p, xin):
                return jnp.sum(mod.apply(p, xin, mask) ** 2)

            return jax.jit(jax.grad(f, argnums=(0, 1)))(params, x)

        g_p, gx_p = loss(plain)
        g_c, gx_c = loss(chunked)
        np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_c), atol=1e-5)
        for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_c)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_full_pair_stack_with_chunking(self):
        """End-to-end through PairTransformNet (remat + dropout wiring)."""
        x, mask, res_mask, _ = _pair_inputs()
        feats = {"residue_mask": res_mask}
        kwargs = dict(
            c_p=8,
            n_pair_transform_layer=2,
            include_mul_update=True,
            include_tri_att=True,
            c_hidden_mul=4,
            c_hidden_tri_att=4,
            n_head_tri=2,
            tri_dropout=0.25,
            pair_transition_n=2,
        )
        plain = PairTransformNet(**kwargs)
        chunked = PairTransformNet(**kwargs, tri_att_chunk=4)
        params = plain.init(jax.random.PRNGKey(1), x, feats)
        out_p = jax.jit(plain.apply)(params, x, feats)
        out_c = jax.jit(chunked.apply)(params, x, feats)
        np.testing.assert_allclose(
            np.asarray(out_p), np.asarray(out_c), atol=1e-5, rtol=1e-5
        )
