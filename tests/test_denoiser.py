"""Denoiser shape / determinism / masking tests on a small config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genie2_tpu.config import Config
from genie2_tpu.features import batchify, create_empty_features, to_device
from genie2_tpu.geometry import Rigid, frenet_frames
from genie2_tpu.nn import Denoiser


def small_config():
    return Config(
        overrides={
            "singleFeatureDimension": 32,
            "pairFeatureDimension": 16,
            "positionalEmbeddingDimension": 16,
            "chainEmbeddingDimension": 8,
            "timestepEmbeddingDimension": 16,
            "templateDistanceNumBins": 9,
            "numPairTransformLayers": 2,
            "triangularMultiplicativeHiddenDimension": 8,
            "numStructureLayers": 2,
            "ipaHiddenDimension": 4,
            "ipaNumHeads": 2,
            "ipaNumQkPoints": 2,
            "ipaNumVPoints": 3,
            "numTimesteps": 100,
            "maximumNumResidues": 32,
            "remat": False,
        }
    )


@pytest.fixture(scope="module")
def model_and_params():
    config = small_config()
    model = Denoiser.from_config(config)
    feats = to_device(batchify([create_empty_features([16]) for _ in range(2)]))
    key = jax.random.PRNGKey(0)
    trans = jax.random.normal(key, (2, 16, 3))
    rots = frenet_frames(trans, feats["chain_index"], feats["residue_mask"])
    ts = Rigid(rots, trans)
    t = jnp.array([10, 50])
    params = model.init(jax.random.PRNGKey(1), ts, t, feats)
    return model, params, ts, t, feats


class TestDenoiser:
    def test_output_shapes(self, model_and_params):
        model, params, ts, t, feats = model_and_params
        out = model.apply(params, ts, t, feats)
        assert out["z"].shape == (2, 16, 3)
        assert out["s"].shape == (2, 16, 32)
        assert out["p"].shape == (2, 16, 16, 16)
        # states: [n_layers + 1, B, N, c_s]
        assert out["states"].shape == (3, 2, 16, 32)
        assert out["ts"].trans.shape == (2, 16, 3)
        assert out["ts"].rots.shape == (2, 16, 3, 3)

    def test_deterministic(self, model_and_params):
        model, params, ts, t, feats = model_and_params
        out1 = model.apply(params, ts, t, feats)
        out2 = model.apply(params, ts, t, feats)
        np.testing.assert_array_equal(np.asarray(out1["z"]), np.asarray(out2["z"]))

    def test_jit_compiles(self, model_and_params):
        model, params, ts, t, feats = model_and_params
        f = jax.jit(lambda p, ts_, t_, fe: model.apply(p, ts_, t_, fe)["z"])
        z = f(params, ts, t, feats)
        assert z.shape == (2, 16, 3)
        assert np.isfinite(np.asarray(z)).all()

    def test_padding_invariance(self, model_and_params):
        """Outputs on real residues must not depend on padded positions."""
        model, params, _, t, _ = model_and_params
        feats = to_device(
            batchify([create_empty_features([12]), create_empty_features([16])])
        )
        key = jax.random.PRNGKey(3)
        trans = jax.random.normal(key, (2, 16, 3))
        trans = trans * feats["residue_mask"][..., None]
        rots = frenet_frames(trans, feats["chain_index"], feats["residue_mask"])
        out1 = model.apply(params, Rigid(rots, trans), t, feats)

        # Corrupt padded coordinate entries; masked forward must be identical
        # on real residues.
        trans2 = trans + 100.0 * (1 - feats["residue_mask"][..., None])
        rots2 = frenet_frames(trans2, feats["chain_index"], feats["residue_mask"])
        out2 = model.apply(params, Rigid(rots2, trans2), t, feats)
        mask = np.asarray(feats["residue_mask"])[..., None]
        np.testing.assert_allclose(
            np.asarray(out1["z"]) * mask, np.asarray(out2["z"]) * mask, atol=1e-4
        )

    def test_grad_flows_to_input(self, model_and_params):
        """TDS requires gradients through the whole denoiser w.r.t. the
        input translations (fork deltas 1 & 3 in SURVEY.md)."""
        model, params, ts, t, feats = model_and_params

        def loss(trans):
            rots = frenet_frames(trans, feats["chain_index"], feats["residue_mask"])
            out = model.apply(params, Rigid(rots, trans), t, feats)
            return jnp.sum(out["z"] ** 2)

        g = jax.grad(loss)(ts.trans)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0

    def test_param_count_full_config(self):
        """The full-size model should be ~15.7M parameters (SURVEY.md §2.5)."""
        config = Config()
        model = Denoiser.from_config(config)
        feats = to_device(batchify([create_empty_features([8])]))
        trans = jnp.zeros((1, 8, 3))
        rots = frenet_frames(trans, feats["chain_index"], feats["residue_mask"])
        params = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), Rigid(rots, trans), jnp.array([1]), feats)
        )
        n = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
        assert 15_000_000 < n < 16_500_000, n
