"""3-D ('data', 'seq', 'model') mesh: sequence sharding x tensor
parallelism x data parallelism composed.

The reference has no model parallelism at all (Lightning DDP only,
train.py:54-65); this repo adds 'seq' (pair-tensor sharding) and 'model'
(Megatron-style weight sharding) axes separately, and this module proves
they COMPOSE — the GSPMD P specs name different axes, so one mesh carries
all three. On the virtual 8-device CPU mesh as (2 data, 2 seq, 2 model):

  * mesh construction + mesh_from_arg composition (and the error cases),
  * a forward with the pair tensor seq-sharded AND the weights
    TP-sharded matches the unsharded model (allclose — psum order),
  * a training step matches unsharded, with Adam moments sharded over
    'model' and the pair activations constrained over 'seq',
  * the Trainer builds the 3-D mesh from config keys
    (meshData/meshSeq/meshModel) and places the state accordingly,
  * the sampling CLI path (--mesh_seq 2 --mesh_model 2) matches the
    single-device run.
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from genie2_tpu.config import Config
from genie2_tpu.diffusion import Schedule
from genie2_tpu.features import batchify, create_empty_features, to_device
from genie2_tpu.geometry import Rigid, frenet_frames
from genie2_tpu.nn import Denoiser
from genie2_tpu.parallel import (
    create_mesh,
    mesh_from_arg,
    pair_sharding,
    place_params,
    place_train_state,
    shard_batch,
)
from genie2_tpu.train import create_train_state, make_train_step


def _tiny(n_res, tri_att_chunk=0):
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
            "triangleAttentionChunk": tri_att_chunk,
            "numStructureLayers": 1,
            "ipaHiddenDimension": 4,
            "ipaNumHeads": 2,
            "ipaNumQkPoints": 2,
            "ipaNumVPoints": 2,
            "remat": False,
        }
    )


def _inputs(config, batch, seed=0):
    n = config.io["max_n_res"]
    feats = to_device(batchify([create_empty_features([n]) for _ in range(batch)]))
    trans = jax.random.normal(jax.random.PRNGKey(seed), (batch, n, 3)) * 3.0
    rots = frenet_frames(trans, feats["chain_index"], feats["residue_mask"])
    t = jnp.full((batch,), 5, jnp.int32)
    return Rigid(rots, trans), t, feats


class TestMesh3DConstruction:
    def test_3d_layout(self):
        mesh = create_mesh(n_seq=2, n_model=2)
        assert mesh.axis_names == ("data", "seq", "model")
        assert dict(mesh.shape) == {"data": 2, "seq": 2, "model": 2}
        # 'model' innermost: consecutive device ids along the TP axis.
        assert mesh.devices[0, 0, 0].id + 1 == mesh.devices[0, 0, 1].id

    def test_size1_axes_dropped(self):
        assert create_mesh(n_model=2).axis_names == ("data", "model")
        assert create_mesh(n_seq=2).axis_names == ("data", "seq")
        assert create_mesh().axis_names == ("data",)

    def test_mesh_from_arg_composes(self):
        mesh = mesh_from_arg(8, n_seq=2, n_model=2)
        assert mesh.axis_names == ("data", "seq", "model")
        assert dict(mesh.shape) == {"data": 2, "seq": 2, "model": 2}

    def test_mesh_from_arg_non_divisible_raises(self):
        with pytest.raises(ValueError, match="not divisible"):
            mesh_from_arg(6, n_seq=2, n_model=2)

    def test_mesh_from_arg_too_few_devices_raises(self):
        with pytest.raises(ValueError, match="at least"):
            mesh_from_arg(1, n_seq=2, n_model=2)

    def test_pair_sharding_names_seq_only(self):
        # The pair constraint and the TP plan name DIFFERENT axes — the
        # composition invariant everything below rests on.
        mesh = create_mesh(n_seq=2, n_model=2)
        assert pair_sharding(mesh).spec == P("data", "seq")


class TestMesh3DForward:
    def test_forward_matches_unsharded(self):
        config = _tiny(24)
        model_plain = Denoiser.from_config(config)
        rigids, t, feats = _inputs(config, batch=2)
        params = model_plain.init(jax.random.PRNGKey(1), rigids, t, feats)
        ref = jax.jit(model_plain.apply)(params, rigids, t, feats)["z"]

        mesh = create_mesh(n_data=2, n_seq=2, n_model=2)
        model_3d = Denoiser.from_config(config, mesh=mesh)
        assert model_3d.pair_sharding is not None  # seq constraints active
        p_3d = place_params(params, mesh)
        # Spot-check: a Megatron pair weight is actually sharded over
        # 'model' (and only 'model') on the 3-D mesh.
        kern = p_3d["params"]["pair_transform_net"]["layer_0"][
            "pair_transition"]["linear_1"]["Dense_0"]["kernel"]
        assert kern.sharding.spec == P(None, "model")
        out = jax.jit(model_3d.apply)(
            p_3d, rigids, t, shard_batch(feats, mesh)
        )["z"]
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
        )


class TestMesh3DTrainStep:
    def test_train_step_matches_unsharded(self):
        config = _tiny(24)
        model_plain = Denoiser.from_config(config)
        rigids, t, feats = _inputs(config, batch=2)
        params = model_plain.init(jax.random.PRNGKey(1), rigids, t, feats)
        schedule = Schedule.create(config.diffusion["n_timestep"])
        state, tx = create_train_state(params, lr=1e-4)
        key = jax.random.PRNGKey(7)

        step_plain = make_train_step(
            model_plain, schedule, tx, config.training["condition_loss_weight"]
        )
        state_ref, m_ref = step_plain(state, feats, key)

        mesh = create_mesh(n_data=2, n_seq=2, n_model=2)
        model_3d = Denoiser.from_config(config, mesh=mesh)
        step_3d = make_train_step(
            model_3d, schedule, tx, config.training["condition_loss_weight"]
        )
        state_3d = place_train_state(state, mesh)
        state_3d, m_3d = step_3d(state_3d, shard_batch(feats, mesh), key)

        for k in m_ref:
            np.testing.assert_allclose(
                float(m_3d[k]), float(m_ref[k]), atol=1e-5, rtol=1e-5, err_msg=k
            )
        path = lambda tree: tree["params"]["pair_transform_net"]["layer_0"][
            "pair_transition"]["linear_1"]["Dense_0"]["kernel"]
        # Updated params match and KEEP the TP sharding on the 3-D mesh.
        assert path(state_3d.params).sharding.spec == P(None, "model")
        np.testing.assert_allclose(
            np.asarray(path(state_3d.params)),
            np.asarray(path(state_ref.params)),
            atol=1e-6, rtol=1e-6,
        )
        # Adam moments sharded alongside.
        assert path(state_3d.opt_state[0].mu).sharding.spec == P(None, "model")


class TestTrainerMesh3D:
    def test_trainer_builds_3d_mesh_from_config(self, tmp_path):
        from genie2_tpu.train.loop import Trainer

        config = _tiny(24)
        config.io["rootdir"] = str(tmp_path)
        config.io["name"] = "m3d"
        config.tpu["mesh_data"] = 2
        config.tpu["mesh_seq"] = 2
        config.tpu["mesh_model"] = 2
        trainer = Trainer(config)
        assert trainer.mesh.axis_names == ("data", "seq", "model")
        kern = trainer.state.params["params"]["pair_transform_net"][
            "layer_0"]["pair_transition"]["linear_1"]["Dense_0"]["kernel"]
        assert kern.sharding.spec == P(None, "model")
        mu = trainer.state.opt_state[0].mu["params"]["pair_transform_net"][
            "layer_0"]["pair_transition"]["linear_1"]["Dense_0"]["kernel"]
        assert mu.sharding.spec == P(None, "model")

    def test_sharded_state_checkpoint_roundtrip(self, tmp_path):
        """save_state on a TP/3-D-sharded TrainState (device_get gathers
        the shards to host) and restore_state must round-trip the values
        AND re-place them sharded — params and Adam moments come back on
        the mesh with their 'model' specs, not replicated."""
        from genie2_tpu.train.loop import Trainer

        config = _tiny(24)
        config.io["rootdir"] = str(tmp_path)
        config.io["name"] = "m3d_ckpt"
        config.tpu["mesh_data"] = 2
        config.tpu["mesh_seq"] = 2
        config.tpu["mesh_model"] = 2
        trainer = Trainer(config)
        path = lambda tree: tree["params"]["pair_transform_net"]["layer_0"][
            "pair_transition"]["linear_1"]["Dense_0"]["kernel"]
        before = np.asarray(path(trainer.state.params))
        trainer.save_state(epoch=0, step_in_epoch=3)
        restored = trainer.restore_state()
        assert restored == (0, 3)
        kern = path(trainer.state.params)
        assert kern.sharding.spec == P(None, "model")
        np.testing.assert_array_equal(np.asarray(kern), before)
        mu = path(trainer.state.opt_state[0].mu)
        assert mu.sharding.spec == P(None, "model")


def _read_ca_coords(path):
    coords = []
    for line in open(path):
        if line.startswith("ATOM"):
            coords.append(
                [float(line[30:38]), float(line[38:46]), float(line[46:54])]
            )
    return np.asarray(coords)


class TestMesh3DCLI:
    def test_cli_matches_single_device(self, tmp_path):
        """--mesh_seq 2 --mesh_model 2 through the real sampling CLI:
        coordinates allclose to the 1-device run (psum order forbids
        byte-identity; PDB coords carry 3 decimals)."""
        from genie2_tpu.cli.sample_unconditional import run_tasks
        from genie2_tpu.utils.model_io import save_params
        from tests.test_sampler import make_model_and_params, tiny_config

        root = tmp_path / "results"
        base = root / "v3d"
        (base / "checkpoints").mkdir(parents=True)
        (base / "configuration").write_text("\n".join([
            "name v3d", "numTimesteps 8", "singleFeatureDimension 16",
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
        for tag, num_devices, mesh_seq, mesh_model in (
            ("one", 1, 1, 1), ("m3d", 8, 2, 2),
        ):
            outdir = tmp_path / tag
            run_tasks(argparse.Namespace(
                name="v3d", epoch=1, rootdir=str(root), scale=0.6,
                outdir=str(outdir), num_samples=2, batch_size=2,
                min_length=16, max_length=16, length_step=2, seed=0,
                num_devices=num_devices, mesh_seq=mesh_seq,
                mesh_model=mesh_model, sequential_order=True, pack=False,
            ))
            outs[tag] = [
                _read_ca_coords(outdir / "pdbs" / f"16_{i}.pdb") for i in range(2)
            ]
        for a, b in zip(outs["one"], outs["m3d"]):
            np.testing.assert_allclose(a, b, atol=2e-3)
