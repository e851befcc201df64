"""Flash triangle-attention Pallas kernel numerics (ops/tri_att_flash.py).

Interpret-mode (CPU) checks against the jnp reference transcription of the
attention core TriangleAttention drives (primitives.Attention; reference
triangular_attention.py:30-144). On-chip performance: tools/bench_tri_att.py.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genie2_tpu.ops.tri_att_flash import (
    flash_tri_attention,
    reference_tri_attention,
)


def _inputs(n_i=8, n_j=16, h=2, c=4, seed=0, masked=False, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(ks[0], (n_i, n_j, h, c), dtype)
    k = jax.random.normal(ks[1], (n_i, n_j, h, c), dtype)
    v = jax.random.normal(ks[2], (n_i, n_j, h, c), dtype)
    tb = jax.random.normal(ks[3], (h, n_j, n_j), dtype)
    mask = np.ones((n_i, n_j), np.float32)
    if masked:
        mask[:, n_j - 5:] = 0.0  # padded tail keys
    return q, k, v, tb, jnp.asarray(mask)


class TestFlashTriAttention:
    @pytest.mark.parametrize("masked", [False, True], ids=["dense", "masked"])
    def test_matches_reference(self, masked):
        args = _inputs(masked=masked)
        want = reference_tri_attention(*args)
        got = flash_tri_attention(*args, tile_rows=4, tile_q=8, tile_k=8,
                                  interpret=True)
        np.testing.assert_allclose(np.asarray(want), np.asarray(got),
                                   atol=1e-5, rtol=1e-5)

    def test_multiple_key_tiles_online_softmax(self):
        """Key axis split across 4 tiles: the running max/denominator must
        reassemble the exact softmax."""
        args = _inputs(n_i=4, n_j=32, seed=3)
        want = reference_tri_attention(*args)
        got = flash_tri_attention(*args, tile_rows=2, tile_q=16, tile_k=8,
                                  interpret=True)
        np.testing.assert_allclose(np.asarray(want), np.asarray(got),
                                   atol=1e-5, rtol=1e-5)

    def test_single_tile_degenerate(self):
        args = _inputs(n_i=4, n_j=8, seed=1)
        want = reference_tri_attention(*args)
        got = flash_tri_attention(*args, tile_rows=4, tile_q=8, tile_k=8,
                                  interpret=True)
        np.testing.assert_allclose(np.asarray(want), np.asarray(got),
                                   atol=1e-5, rtol=1e-5)

    def test_bf16_inputs_fp32_accumulation(self):
        args = _inputs(seed=2)
        want = reference_tri_attention(*args)
        bf = [a.astype(jnp.bfloat16) for a in args[:4]] + [args[4]]
        got = flash_tri_attention(*bf, tile_rows=4, tile_q=8, tile_k=8,
                                  interpret=True)
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(want), np.asarray(got, np.float32), atol=3e-2
        )

    def test_batched_via_vmap(self):
        args1 = _inputs(seed=4)
        args2 = _inputs(seed=5, masked=True)
        batched = [jnp.stack([a, b]) for a, b in zip(args1, args2)]
        got = jax.vmap(
            lambda q, k, v, tb, m: flash_tri_attention(
                q, k, v, tb, m, tile_rows=4, tile_q=8, tile_k=8,
                interpret=True)
        )(*batched)
        for i, args in enumerate((args1, args2)):
            np.testing.assert_allclose(
                np.asarray(reference_tri_attention(*args)),
                np.asarray(got[i]), atol=1e-5, rtol=1e-5,
            )

    def test_reference_matches_module_attention(self):
        """The jnp reference core reproduces primitives.Attention (with the
        module's own projections stripped to identity by feeding q/k/v
        through the einsum formulation directly)."""
        n_i, n_j, h, c = 6, 12, 2, 4
        q, k, v, tb, mask = _inputs(n_i, n_j, h, c, seed=7, masked=True)
        # Module-equivalent: logits = qk/sqrt(c) + biases, softmax, @v.
        a = jnp.einsum("iqhc,ikhc->ihqk", q, k) / math.sqrt(c)
        mask_bias = 1e9 * (mask[:, None, None, :] - 1.0)
        a = a + mask_bias + tb[None]
        want = jnp.einsum("ihqk,ikhc->iqhc", jax.nn.softmax(a, -1), v)
        got = reference_tri_attention(q, k, v, tb, mask)
        np.testing.assert_allclose(np.asarray(want), np.asarray(got),
                                   atol=1e-6)
