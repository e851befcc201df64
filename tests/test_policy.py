"""Mixed-precision policy tests."""

import jax
import jax.numpy as jnp
import numpy as np

from genie2_tpu.nn.policy import cast_floating, make_apply_fn
from genie2_tpu.geometry import Rigid, frenet_frames
from genie2_tpu.features import batchify, create_empty_features, to_device
from tests.test_sampler import make_model_and_params, tiny_config


def test_cast_floating():
    tree = {"a": jnp.ones(3, jnp.float32), "b": jnp.ones(3, jnp.int32)}
    out = cast_floating(tree, jnp.bfloat16)
    assert out["a"].dtype == jnp.bfloat16
    assert out["b"].dtype == jnp.int32


def test_bf16_apply_close_to_fp32():
    config = tiny_config()
    model, params = make_model_and_params(config, length=16)
    feats = to_device(batchify([create_empty_features([16])]))
    key = jax.random.PRNGKey(0)
    trans = jax.random.normal(key, (1, 16, 3))
    rots = frenet_frames(trans, feats["chain_index"], feats["residue_mask"])
    ts = Rigid(rots, trans)
    t = jnp.array([3], jnp.int32)

    out32 = make_apply_fn(model, "fp32")(params, ts, t, feats)
    out16 = make_apply_fn(model, "bf16")(params, ts, t, feats)
    assert out16["z"].dtype == jnp.float32
    # The policy must not silently promote back to fp32 mid-network: the
    # O(N^2) pair activations are the bandwidth hot spot.
    assert out16["p"].dtype == jnp.bfloat16
    assert out16["s"].dtype == jnp.bfloat16
    assert out32["p"].dtype == jnp.float32
    z32, z16 = np.asarray(out32["z"]), np.asarray(out16["z"])
    assert np.isfinite(z16).all()
    # bf16 has ~3 decimal digits; the prediction should track loosely.
    scale = np.abs(z32).max() + 1e-6
    assert np.abs(z32 - z16).max() / scale < 0.1
