"""Pallas kernel correctness vs jnp fallback (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genie2_tpu.ops.triangle import (
    triangle_multiply,
    triangle_multiply_reference,
)


@pytest.mark.parametrize("outgoing", [True, False])
@pytest.mark.parametrize("layout", ["nlayout", "cm"])
def test_triangle_kernel_matches_einsum(outgoing, layout):
    rng = np.random.default_rng(0)
    B, N, C = 2, 16, 16
    a = jnp.asarray(rng.normal(size=(B, N, N, C)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(B, N, N, C)).astype(np.float32))
    ref = triangle_multiply_reference(a, b, outgoing)
    out = triangle_multiply(
        a, b, outgoing, use_pallas=True, interpret=True, layout=layout
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_triangle_kernel_bf16(outgoing=True):
    rng = np.random.default_rng(1)
    B, N, C = 1, 8, 8
    a = jnp.asarray(rng.normal(size=(B, N, N, C)).astype(np.float32)).astype(jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(B, N, N, C)).astype(np.float32)).astype(jnp.bfloat16)
    ref = triangle_multiply_reference(a, b, outgoing)
    out = triangle_multiply(a, b, outgoing, use_pallas=True, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=0.05, atol=0.1
    )
