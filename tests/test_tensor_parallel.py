"""Tensor (model) parallelism over the 'model' mesh axis.

The reference has no model parallelism (Lightning DDP only,
train.py:54-65). parallel/tensor_parallel.py shards the weights
Megatron-style via GSPMD NamedShardings; these tests prove on the virtual
8-device CPU mesh:

  * the sharding plan hits the intended weights (and falls back to
    replicated for non-divisible dims, so every axis size is safe),
  * a flagship-width forward on a ('data','model') = (2,4) mesh matches
    the single-device forward, with real all-reduces in the compiled
    program (not a silent gather-to-replicated),
  * the training step matches the unsharded step and the updated params
    KEEP their TP shardings (sharded optimizer state),
  * the sampling CLI's --mesh_model path matches single-device output.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from genie2_tpu.config import Config
from genie2_tpu.diffusion import Schedule
from genie2_tpu.features import batchify, create_empty_features, to_device
from genie2_tpu.geometry import Rigid, frenet_frames
from genie2_tpu.nn import Denoiser
from genie2_tpu.parallel import (
    create_tp_mesh,
    place_params,
    place_train_state,
    shard_batch,
    tp_spec,
    tp_stats,
)
from genie2_tpu.train import create_train_state, make_train_step


def test_tp_spec_rules():
    # Megatron pair: up-proj out-dim + bias, down-proj in-dim.
    up = "params/x/pair_transition/linear_1/Dense_0/kernel"
    dn = "params/x/pair_transition/linear_2/Dense_0/kernel"
    assert tp_spec(up, (128, 512), 4) == P(None, "model")
    assert tp_spec(
        "params/x/pair_transition/linear_1/Dense_0/bias", (512,), 4
    ) == P("model")
    assert tp_spec(dn, (512, 128), 4) == P("model", None)
    # LayerNorms and unmatched paths replicated.
    assert tp_spec("params/x/layer_norm/scale", (128,), 4) == P()
    # Non-divisible dim -> replicated fallback (safety for any axis size).
    assert tp_spec(up, (128, 510), 4) == P()
    # IPA head projections.
    assert tp_spec("params/s/ipa/linear_kv/Dense_0/kernel", (384, 384), 4) \
        == P(None, "model")
    assert tp_spec("params/s/ipa/linear_out/Dense_0/kernel", (2112, 384), 4) \
        == P("model", None)


def _flagship_slim(n_res, tri_att=True):
    """Flagship feature widths (c_s=384, c_p=128), depth cut to one layer
    each so the CPU-mesh compile stays bounded."""
    return Config(
        overrides={
            "maximumNumResidues": n_res,
            "numTimesteps": 10,
            "numPairTransformLayers": 1,
            "numStructureLayers": 1,
            "includeTriangularAttention": str(tri_att),
            "remat": False,
        }
    )


def _tiny(n_res):
    return Config(
        overrides={
            "maximumNumResidues": n_res,
            "numTimesteps": 10,
            "singleFeatureDimension": 16,
            "pairFeatureDimension": 8,
            "positionalEmbeddingDimension": 8,
            "chainEmbeddingDimension": 4,
            "timestepEmbeddingDimension": 8,
            "templateDistanceNumBins": 5,
            "numPairTransformLayers": 1,
            "triangularMultiplicativeHiddenDimension": 4,
            "includeTriangularAttention": "True",
            "triangularAttentionHiddenDimension": 4,
            "triangularAttentionNumHeads": 2,
            "numStructureLayers": 1,
            "ipaHiddenDimension": 4,
            "ipaNumHeads": 2,
            "ipaNumQkPoints": 2,
            "ipaNumVPoints": 2,
            "remat": False,
        }
    )


def _setup(config, batch):
    model = Denoiser.from_config(config)
    n = config.io["max_n_res"]
    feats = to_device(batchify([create_empty_features([n]) for _ in range(batch)]))
    trans = jax.random.normal(jax.random.PRNGKey(0), (batch, n, 3))
    rots = frenet_frames(trans, feats["chain_index"], feats["residue_mask"])
    t = jnp.full((batch,), config.diffusion["n_timestep"] // 2, jnp.int32)
    params = model.init(jax.random.PRNGKey(1), Rigid(rots, trans), t, feats)
    return model, params, feats, (trans, rots, t)


def test_tp_forward_matches_flagship_width():
    config = _flagship_slim(32)
    model, params, feats, (trans, rots, t) = _setup(config, batch=2)
    ref = jax.jit(model.apply)(params, Rigid(rots, trans), t, feats)["z"]

    mesh = create_tp_mesh(n_data=2, n_model=4)
    stats = tp_stats(params, mesh)
    # The plan must shard the bulk of the model at flagship widths.
    assert stats["sharded_frac"] > 0.75, stats

    p_tp = place_params(params, mesh)
    feats_tp = shard_batch(feats, mesh)
    compiled = jax.jit(model.apply).lower(
        p_tp, Rigid(rots, trans), t, feats_tp
    ).compile()
    # Real TP: the compiled program reduces partial products over 'model'.
    assert compiled.as_text().count("all-reduce") > 0
    out = compiled(p_tp, Rigid(rots, trans), t, feats_tp)["z"]
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_tp_train_step_matches_and_keeps_sharding():
    config = _tiny(24)
    model, params, feats, _ = _setup(config, batch=2)
    schedule = Schedule.create(config.diffusion["n_timestep"])
    state, tx = create_train_state(params, lr=1e-4)
    step_fn = make_train_step(
        model, schedule, tx, config.training["condition_loss_weight"]
    )
    key = jax.random.PRNGKey(7)
    state_ref, m_ref = step_fn(state, feats, key)

    mesh = create_tp_mesh(n_data=2, n_model=2)
    state_tp = place_train_state(state, mesh)
    state_tp, m_tp = step_fn(state_tp, shard_batch(feats, mesh), key)

    for k in m_ref:
        np.testing.assert_allclose(
            float(m_tp[k]), float(m_ref[k]), atol=1e-5, rtol=1e-5, err_msg=k
        )
    # Updated params match AND stay TP-sharded (no gather-to-replicated).
    kern_tp = state_tp.params["params"]["pair_transform_net"]["layer_0"][
        "pair_transition"]["linear_1"]["Dense_0"]["kernel"]
    kern_ref = state_ref.params["params"]["pair_transform_net"]["layer_0"][
        "pair_transition"]["linear_1"]["Dense_0"]["kernel"]
    assert kern_tp.sharding.spec == P(None, "model")
    np.testing.assert_allclose(
        np.asarray(kern_tp), np.asarray(kern_ref), atol=1e-6, rtol=1e-6
    )
    # Adam moments sharded too (per-shard optimizer state).
    mu = state_tp.opt_state[0].mu["params"]["pair_transform_net"]["layer_0"][
        "pair_transition"]["linear_1"]["Dense_0"]["kernel"]
    assert mu.sharding.spec == P(None, "model")


def test_tp_composes_with_chunked_tri_att():
    """TP + row-chunked triangle attention (the long-context config):
    the chunk lax.scan must propagate the head-sharded q/k/v through
    GSPMD unchanged."""
    config = Config(
        overrides={
            "maximumNumResidues": 24,
            "numTimesteps": 10,
            "singleFeatureDimension": 16,
            "pairFeatureDimension": 8,
            "positionalEmbeddingDimension": 8,
            "chainEmbeddingDimension": 4,
            "timestepEmbeddingDimension": 8,
            "templateDistanceNumBins": 5,
            "numPairTransformLayers": 1,
            "triangularMultiplicativeHiddenDimension": 4,
            "includeTriangularAttention": "True",
            "triangularAttentionHiddenDimension": 4,
            "triangularAttentionNumHeads": 2,
            "triangleAttentionChunk": 8,
            "numStructureLayers": 1,
            "ipaHiddenDimension": 4,
            "ipaNumHeads": 2,
            "ipaNumQkPoints": 2,
            "ipaNumVPoints": 2,
            "remat": False,
        }
    )
    model, params, feats, (trans, rots, t) = _setup(config, batch=2)
    ref = jax.jit(model.apply)(params, Rigid(rots, trans), t, feats)["z"]
    mesh = create_tp_mesh(n_data=2, n_model=2)
    out = jax.jit(model.apply)(
        place_params(params, mesh), Rigid(rots, trans), t, shard_batch(feats, mesh)
    )["z"]
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def _read_ca_coords(path):
    coords = []
    for line in open(path):
        if line.startswith("ATOM"):
            coords.append(
                [float(line[30:38]), float(line[38:46]), float(line[46:54])]
            )
    return np.asarray(coords)


def test_tp_cli_matches_single_device(tmp_path):
    """--mesh_model through the real sampling CLI: coordinates allclose to
    the 1-device run (psum reduction order forbids byte-identity)."""
    import argparse

    from genie2_tpu.cli.sample_unconditional import run_tasks
    from genie2_tpu.utils.model_io import save_params
    from tests.test_sampler import make_model_and_params, tiny_config

    root = tmp_path / "results"
    base = root / "vtp"
    (base / "checkpoints").mkdir(parents=True)
    (base / "configuration").write_text("\n".join([
        "name vtp", "numTimesteps 8", "singleFeatureDimension 16",
        "pairFeatureDimension 8", "positionalEmbeddingDimension 8",
        "chainEmbeddingDimension 4", "timestepEmbeddingDimension 8",
        "templateDistanceNumBins 5", "numPairTransformLayers 1",
        "triangularMultiplicativeHiddenDimension 4", "numStructureLayers 1",
        "ipaHiddenDimension 4", "ipaNumHeads 2", "ipaNumQkPoints 2",
        "ipaNumVPoints 2", "maximumNumResidues 64", "remat False",
    ]))
    config = tiny_config()
    _, params = make_model_and_params(config)
    save_params(str(base / "checkpoints" / "epoch.1.ckpt"), jax.device_get(params))

    outs = {}
    for tag, num_devices, mesh_model in (("one", 1, 1), ("tp", 4, 2)):
        outdir = tmp_path / tag
        run_tasks(argparse.Namespace(
            name="vtp", epoch=1, rootdir=str(root), scale=0.6,
            outdir=str(outdir), num_samples=2, batch_size=2,
            min_length=16, max_length=16, length_step=2, seed=0,
            num_devices=num_devices, mesh_model=mesh_model,
            sequential_order=True, pack=False,
        ))
        outs[tag] = [
            _read_ca_coords(outdir / "pdbs" / f"16_{i}.pdb") for i in range(2)
        ]
    for a, b in zip(outs["one"], outs["tp"]):
        # One PDB-rounding ulp (coords are written with 3 decimals).
        np.testing.assert_allclose(a, b, atol=2e-3)
