"""Fused channel-major TriMul pipeline (ops/trimul_fused.py) numerics.

Runs the Pallas kernels through the interpreter on CPU (the conftest forces
the CPU platform; GENIE2_PALLAS_INTERPRET is set here) and checks them
against the flax TriangleMultiplicativeUpdate module with randomized
weights (linear_z is zero-init, so default init would be vacuous).
"""

import os

os.environ["GENIE2_PALLAS_INTERPRET"] = "1"

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import genie2_tpu.ops.trimul_fused as trimul_fused_mod
from genie2_tpu.nn.pair_stack import TriangleMultiplicativeUpdate

# The env var only helps if this module imports first; set the flag
# directly in case another test already imported the kernels.
trimul_fused_mod._FORCE_INTERPRET = True

B, N, C = 2, 128, 32


def _randomized_params(tm, z, mask):
    params = tm.init(jax.random.PRNGKey(1), z, mask)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    leaves = [
        0.3 * jax.random.normal(k, l.shape, l.dtype) for k, l in zip(keys, leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


@pytest.mark.parametrize("outgoing", [True, False])
def test_fused_matches_module(outgoing):
    z = jax.random.normal(jax.random.PRNGKey(0), (B, N, N, C), jnp.float32)
    res_mask = (jax.random.uniform(jax.random.PRNGKey(5), (B, N)) > 0.2).astype(
        jnp.float32
    )
    mask = res_mask[:, :, None] * res_mask[:, None, :]

    tm_ref = TriangleMultiplicativeUpdate(c_z=C, c_hidden=C, outgoing=outgoing)
    tm_pal = TriangleMultiplicativeUpdate(
        c_z=C, c_hidden=C, outgoing=outgoing, use_pallas=True
    )
    params = _randomized_params(tm_ref, z, mask)

    ref = tm_ref.apply(params, z, mask)
    got = tm_pal.apply(params, z, mask, res_mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-6)


def test_fused_falls_back_on_unsupported_length():
    """N not a multiple of 128 routes to the jnp path (same result)."""
    n = 96
    z = jax.random.normal(jax.random.PRNGKey(0), (B, n, n, C), jnp.float32)
    res_mask = jnp.ones((B, n), jnp.float32)
    mask = res_mask[:, :, None] * res_mask[:, None, :]
    tm_pal = TriangleMultiplicativeUpdate(c_z=C, c_hidden=C, use_pallas=True)
    params = _randomized_params(tm_pal, z, mask)
    tm_ref = TriangleMultiplicativeUpdate(c_z=C, c_hidden=C)
    ref = tm_ref.apply(params, z, mask)
    got = tm_pal.apply(params, z, mask, res_mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)
