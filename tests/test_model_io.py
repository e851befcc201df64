"""Checkpoint I/O and end-to-end trainer tests."""

import os

import jax
import numpy as np
import pytest

from genie2_tpu.config import Config
from genie2_tpu.nn import Denoiser
from genie2_tpu.utils.model_io import (
    get_epochs,
    get_versions,
    init_params,
    load_model,
    load_params,
    save_params,
)
from tests.test_sampler import tiny_config


class TestOrbaxRoundtrip:
    def test_save_load(self, tmp_path):
        config = tiny_config()
        model = Denoiser.from_config(config)
        params = init_params(model, config)
        path = str(tmp_path / "epoch=3.ckpt")
        save_params(path, jax.device_get(params))
        restored = load_params(path, params)
        for a, b in zip(
            jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(restored)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestLayoutDiscovery:
    def _write_config(self, basedir):
        os.makedirs(basedir, exist_ok=True)
        with open(os.path.join(basedir, "configuration"), "w") as f:
            f.write("name test\n")
            f.write("singleFeatureDimension 16\n")
            f.write("pairFeatureDimension 8\n")
            f.write("positionalEmbeddingDimension 8\n")
            f.write("chainEmbeddingDimension 4\n")
            f.write("timestepEmbeddingDimension 8\n")
            f.write("templateDistanceNumBins 5\n")
            f.write("numPairTransformLayers 1\n")
            f.write("triangularMultiplicativeHiddenDimension 4\n")
            f.write("numStructureLayers 1\n")
            f.write("ipaHiddenDimension 4\n")
            f.write("ipaNumHeads 2\n")
            f.write("ipaNumQkPoints 2\n")
            f.write("ipaNumVPoints 2\n")
            f.write("numTimesteps 8\n")
            f.write("maximumNumResidues 64\n")

    def test_untrained_fallback(self, tmp_path):
        self._write_config(str(tmp_path / "test"))
        model, params, config = load_model(str(tmp_path), "test")
        assert params is not None
        assert config.model["c_s"] == 16

    def test_training_layout_roundtrip(self, tmp_path):
        basedir = str(tmp_path / "test")
        self._write_config(basedir)
        model, params, config = load_model(str(tmp_path), "test")
        ckpt = os.path.join(basedir, "version_0", "checkpoints", "epoch=5.ckpt")
        save_params(ckpt, jax.device_get(params))
        assert get_versions(str(tmp_path), "test") == [0]
        assert get_epochs(str(tmp_path), "test", 0) == [5]
        model2, params2, _ = load_model(str(tmp_path), "test")
        for a, b in zip(
            jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params2)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @staticmethod
    def _write_dims_config(basedir):
        """Config file matching tests.test_parity_torch.DIMS."""
        from tests.test_parity_torch import DIMS

        with open(os.path.join(basedir, "configuration"), "w") as f:
            f.write(
                "\n".join(
                    [
                        "name rel",
                        f"singleFeatureDimension {DIMS['c_s']}",
                        f"pairFeatureDimension {DIMS['c_p']}",
                        f"numTimesteps {DIMS['n_timestep']}",
                        f"positionalEmbeddingDimension {DIMS['c_pos_emb']}",
                        f"chainEmbeddingDimension {DIMS['c_chain_emb']}",
                        f"timestepEmbeddingDimension {DIMS['c_timestep_emb']}",
                        f"maximumNumResidues {DIMS['max_n_res']}",
                        f"relativePositionK {DIMS['relpos_k']}",
                        f"templateDistanceNumBins {DIMS['template_dist_n_bin']}",
                        f"numPairTransformLayers {DIMS['n_pair_transform_layer']}",
                        "includeTriangularAttention True",
                        f"triangularMultiplicativeHiddenDimension {DIMS['c_hidden_mul']}",
                        f"triangularAttentionHiddenDimension {DIMS['c_hidden_tri_att']}",
                        f"triangularAttentionNumHeads {DIMS['n_head_tri']}",
                        f"pairTransitionN {DIMS['pair_transition_n']}",
                        f"numStructureLayers {DIMS['n_structure_layer']}",
                        f"ipaHiddenDimension {DIMS['c_hidden_ipa']}",
                        f"ipaNumHeads {DIMS['n_head_ipa']}",
                        f"ipaNumQkPoints {DIMS['n_qk_point']}",
                        f"ipaNumVPoints {DIMS['n_v_point']}",
                    ]
                )
            )

    def test_torch_release_checkpoint_loads(self, tmp_path):
        """A Lightning .ckpt in the release layout loads via the converter."""
        torch = pytest.importorskip("torch")
        import sys

        sys.path.insert(0, "/root/reference")
        from genie.model.model import Denoiser as TorchDenoiser

        from tests.test_parity_torch import DIMS

        torch.manual_seed(0)
        tm = TorchDenoiser(**DIMS)
        basedir = str(tmp_path / "rel")
        ckpt_dir = os.path.join(basedir, "checkpoints")
        os.makedirs(ckpt_dir, exist_ok=True)
        torch.save(
            {"state_dict": {f"model.{k}": v for k, v in tm.state_dict().items()}},
            os.path.join(ckpt_dir, "epoch.30.ckpt"),
        )
        self._write_dims_config(basedir)
        from genie2_tpu.utils.model_io import load_pretrained_model

        model, params, config = load_pretrained_model(str(tmp_path), "rel", 30)
        w = np.asarray(
            params["params"]["single_feature_net"]["linear"]["Dense_0"]["kernel"]
        )
        np.testing.assert_allclose(
            w, tm.state_dict()["single_feature_net.linear.weight"].numpy().T
        )


class TestTrainer:
    def test_trainer_fit_and_checkpoint(self, tmp_path):
        from genie2_tpu.train import synthetic_dataset
        from genie2_tpu.train.loop import Trainer

        config = tiny_config()
        config.io["rootdir"] = str(tmp_path / "runs")
        config.io["name"] = "t"
        config.training["n_epoch"] = 2
        config.training["batch_size"] = 4
        config.training["checkpoint_every_n_epoch"] = 1
        config.training["log_every_n_step"] = 1

        ds = synthetic_dataset(8, max_n_res=24)
        trainer = Trainer(config, use_mesh=False)
        state = trainer.fit(ds)
        assert int(state.step) == 4  # 2 epochs x 2 batches
        assert os.path.exists(
            os.path.join(trainer.ckpt_dir, "epoch=1.ckpt")
        )
        assert os.path.exists(os.path.join(trainer.workdir, "metrics.jsonl"))

        # Validation pass works.
        import jax

        val = trainer.evaluate(ds, batch_size=4, key=jax.random.PRNGKey(0), max_batches=2)
        assert np.isfinite(val)

        # Resume restores full state and continues (resume=True picks the
        # latest version automatically, like the reference's load_model).
        trainer2 = Trainer(config, use_mesh=False, resume=True)
        assert trainer2.version == trainer.version
        restored = trainer2.restore_state()
        assert restored is not None
        start_epoch, start_batch = restored
        assert (start_epoch, start_batch) == (2, 0)
        assert int(trainer2.state.step) == 4
        state2 = trainer2.fit(ds, n_epoch=3, resume=True)
        assert int(state2.step) == 6  # one more epoch of 2 batches

    def test_finetune_init_from(self, tmp_path):
        """init_from loads existing weights with a fresh optimizer (the
        fine-tune flow; reference equivalent is load_model re-loading weights
        under train.py's fit)."""
        from genie2_tpu.train.loop import Trainer

        config = tiny_config()
        config.io["rootdir"] = str(tmp_path / "runs")
        config.io["name"] = "ft"

        donor = Trainer(config, use_mesh=False)
        ckpt = str(tmp_path / "donor.ckpt")
        save_params(ckpt, jax.device_get(donor.state.params))

        tuned = Trainer(config, use_mesh=False, init_from=ckpt)
        for a, b in zip(
            jax.tree_util.tree_leaves(donor.state.params),
            jax.tree_util.tree_leaves(tuned.state.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(tuned.state.step) == 0  # fresh optimizer/step


class TestConvertCheckpointCLI:
    def test_torch_to_orbax_roundtrip(self, tmp_path):
        """convert_checkpoint writes an orbax dir whose arrays equal the
        on-the-fly converted torch weights."""
        torch = pytest.importorskip("torch")
        import argparse
        import sys

        sys.path.insert(0, "/root/reference")
        from genie.model.model import Denoiser as TorchDenoiser

        from genie2_tpu.cli.convert_checkpoint import run
        from genie2_tpu.utils.torch_convert import load_torch_checkpoint
        from tests.test_parity_torch import DIMS

        torch.manual_seed(1)
        tm = TorchDenoiser(**DIMS)
        src = str(tmp_path / "epoch.5.ckpt")
        torch.save(
            {"state_dict": {f"model.{k}": v for k, v in tm.state_dict().items()}},
            src,
        )
        dst = str(tmp_path / "epoch.5.orbax.ckpt")
        run(argparse.Namespace(src=src, dst=dst))
        assert os.path.isdir(dst)

        want = load_torch_checkpoint(src)
        got = load_params(dst, want)
        for a, b in zip(
            jax.tree_util.tree_leaves(want), jax.tree_util.tree_leaves(got)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # Provenance stamp: converted weights carry the quat method the
        # torch reference used (BENCH_NOTES.md round-3 quat-sign study).
        import json

        from genie2_tpu.utils.model_io import checkpoint_metadata

        meta = json.load(open(dst + ".meta.json"))
        assert meta["rot_to_quat_method"] == "eigh"
        assert checkpoint_metadata(dst)["source"] == "torch_lightning"

    def test_training_layout_skips_meta_sidecar(self, tmp_path):
        """load_model's candidate glob must not pick up the converter's
        .meta.json sidecar as a checkpoint (code-review finding)."""
        import json

        from genie2_tpu.utils.model_io import load_model

        config = tiny_config()
        model = Denoiser.from_config(config)
        params = jax.device_get(init_params(model, config))
        basedir = str(tmp_path / "t")
        ckpt_dir = os.path.join(basedir, "version_0", "checkpoints")
        os.makedirs(ckpt_dir, exist_ok=True)
        TestLayoutDiscovery()._write_config(basedir)
        ckpt = os.path.join(ckpt_dir, "epoch=2.ckpt")
        save_params(ckpt, params)
        json.dump(
            {"source": "torch_lightning", "rot_to_quat_method": "eigh"},
            open(ckpt + ".meta.json", "w"),
        )
        loaded_model, loaded, _ = load_model(str(tmp_path), "t")
        assert loaded_model.quat_method == "eigh"  # sidecar honored
        for a, b in zip(
            jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(loaded)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_raw_torch_file_defaults_to_eigh(self, tmp_path):
        """A raw torch .ckpt dropped into the release layout (no converter,
        no sidecar) must select the same eigh quat method the converter
        stamps — both load paths for the reference's released weights must
        behave identically (code-review finding)."""
        torch = pytest.importorskip("torch")
        import sys

        sys.path.insert(0, "/root/reference")
        from genie.model.model import Denoiser as TorchDenoiser

        from genie2_tpu.utils.model_io import load_pretrained_model
        from tests.test_parity_torch import DIMS

        torch.manual_seed(2)
        tm = TorchDenoiser(**DIMS)
        basedir = str(tmp_path / "raw")
        ckpt_dir = os.path.join(basedir, "checkpoints")
        os.makedirs(ckpt_dir, exist_ok=True)
        torch.save(
            {"state_dict": {f"model.{k}": v for k, v in tm.state_dict().items()}},
            os.path.join(ckpt_dir, "epoch.9.ckpt"),
        )
        TestLayoutDiscovery._write_dims_config(basedir)
        model, _, _ = load_pretrained_model(str(tmp_path), "raw", 9)
        assert model.quat_method == "eigh"

    def test_metadata_selects_eigh_on_load(self, tmp_path):
        """A release checkpoint with a .meta.json stamp loads a model with
        the stamped rot_to_quat method (the trained-weight contingency)."""
        import json

        from genie2_tpu.utils.model_io import load_pretrained_model

        config = tiny_config()
        model = Denoiser.from_config(config)
        assert model.quat_method == "closed"  # the TPU default
        params = jax.device_get(init_params(model, config))

        basedir = str(tmp_path / "m")
        ckpt_dir = os.path.join(basedir, "checkpoints")
        os.makedirs(ckpt_dir, exist_ok=True)
        TestLayoutDiscovery()._write_config(basedir)
        ckpt = os.path.join(ckpt_dir, "epoch.3.ckpt")
        save_params(ckpt, params)
        json.dump(
            {"source": "torch_lightning", "rot_to_quat_method": "eigh"},
            open(ckpt + ".meta.json", "w"),
        )
        loaded_model, loaded_params, _ = load_pretrained_model(
            str(tmp_path), "m", 3
        )
        assert loaded_model.quat_method == "eigh"
        for a, b in zip(
            jax.tree_util.tree_leaves(params),
            jax.tree_util.tree_leaves(loaded_params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_missing_src_raises(self, tmp_path):
        import argparse

        from genie2_tpu.cli.convert_checkpoint import run

        with pytest.raises(FileNotFoundError):
            run(argparse.Namespace(src=str(tmp_path / "nope.ckpt"), dst=str(tmp_path / "o")))


class TestEmaCheckpoint:
    def test_load_pretrained_ema(self, tmp_path):
        """--ema loads the weight-EMA release checkpoint epoch.{E}.ema.ckpt."""
        from genie2_tpu.utils.model_io import load_pretrained_model

        config = tiny_config()
        model = Denoiser.from_config(config)
        params = jax.device_get(init_params(model, config))
        ema = jax.tree_util.tree_map(lambda x: np.asarray(x) * 0.5, params)

        basedir = str(tmp_path / "e")
        ckpt_dir = os.path.join(basedir, "checkpoints")
        os.makedirs(ckpt_dir, exist_ok=True)
        TestLayoutDiscovery()._write_config(basedir)
        save_params(os.path.join(ckpt_dir, "epoch.7.ckpt"), params)
        save_params(os.path.join(ckpt_dir, "epoch.7.ema.ckpt"), ema)

        _, raw, _ = load_pretrained_model(str(tmp_path), "e", 7)
        _, avg, _ = load_pretrained_model(str(tmp_path), "e", 7, ema=True)
        for a, b, c in zip(
            jax.tree_util.tree_leaves(params),
            jax.tree_util.tree_leaves(raw),
            jax.tree_util.tree_leaves(avg),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            np.testing.assert_allclose(
                np.asarray(a) * 0.5, np.asarray(c), rtol=1e-6
            )

    def test_missing_ema_checkpoint_raises(self, tmp_path):
        from genie2_tpu.utils.model_io import load_pretrained_model

        basedir = str(tmp_path / "e")
        os.makedirs(os.path.join(basedir, "checkpoints"), exist_ok=True)
        TestLayoutDiscovery()._write_config(basedir)
        with pytest.raises(FileNotFoundError):
            load_pretrained_model(str(tmp_path), "e", 7, ema=True)
