"""End-to-end sampler tests on a tiny model/schedule."""

import os

import jax
import numpy as np
import pytest

from genie2_tpu.config import Config
from genie2_tpu.features import batchify, create_empty_features, to_device
from genie2_tpu.geometry import Rigid, frenet_frames
from genie2_tpu.nn import Denoiser
from genie2_tpu.sampling import (
    PackedUnconditionalSampler,
    ScaffoldSampler,
    UnconditionalSampler,
    bucket_length,
)


def tiny_config(n_timestep=8):
    return Config(
        overrides={
            "singleFeatureDimension": 16,
            "pairFeatureDimension": 8,
            "positionalEmbeddingDimension": 8,
            "chainEmbeddingDimension": 4,
            "timestepEmbeddingDimension": 8,
            "templateDistanceNumBins": 5,
            "numPairTransformLayers": 1,
            "triangularMultiplicativeHiddenDimension": 4,
            "numStructureLayers": 1,
            "ipaHiddenDimension": 4,
            "ipaNumHeads": 2,
            "ipaNumQkPoints": 2,
            "ipaNumVPoints": 2,
            "numTimesteps": n_timestep,
            "maximumNumResidues": 64,
            "remat": False,
        }
    )


def make_model_and_params(config, length=16):
    import jax.numpy as jnp

    model = Denoiser.from_config(config)
    feats = to_device(batchify([create_empty_features([length])]))
    trans = jnp.zeros((1, length, 3))
    rots = frenet_frames(trans, feats["chain_index"], feats["residue_mask"])
    params = model.init(
        jax.random.PRNGKey(0), Rigid(rots, trans), jnp.array([1]), feats
    )
    return model, params


class TestBucketing:
    def test_bucket_length(self):
        assert bucket_length(1) == 32
        assert bucket_length(32) == 32
        assert bucket_length(33) == 64
        assert bucket_length(100, 16) == 112


class TestUnconditionalSampler:
    def test_end_to_end(self, tmp_path):
        config = tiny_config()
        model, params = make_model_and_params(config)
        sampler = UnconditionalSampler(model, params, config)
        out = sampler.sample(
            {
                "scale": 0.6,
                "outdir": str(tmp_path),
                "num_samples": 2,
                "prefix": "17",
                "offset": 0,
                "length": 17,
            },
            key=jax.random.PRNGKey(42),
        )
        assert len(out) == 2
        for i, f in enumerate(out):
            assert int(f["num_residues"]) == 17
            assert f["atom_positions"].shape == (17, 3)
            assert np.isfinite(f["atom_positions"]).all()
            # Not all zeros / not the initial noise scale
            assert np.abs(f["atom_positions"]).max() > 0
            path = os.path.join(str(tmp_path), "pdbs", f"17_{i}.pdb")
            assert os.path.exists(path)
            assert "ATOM" in open(path).read()

    def test_deterministic_given_key(self, tmp_path):
        config = tiny_config()
        model, params = make_model_and_params(config)
        sampler = UnconditionalSampler(model, params, config)
        p = {
            "scale": 0.6,
            "outdir": str(tmp_path),
            "num_samples": 1,
            "prefix": "x",
            "offset": 0,
            "length": 10,
        }
        a = sampler.sample(p, key=jax.random.PRNGKey(7))
        b = sampler.sample(p, key=jax.random.PRNGKey(7))
        np.testing.assert_array_equal(a[0]["atom_positions"], b[0]["atom_positions"])
        c = sampler.sample(p, key=jax.random.PRNGKey(8))
        assert np.abs(c[0]["atom_positions"] - a[0]["atom_positions"]).max() > 1e-6


class TestPackedSampler:
    def test_mixed_lengths_one_batch(self, tmp_path):
        config = tiny_config()
        model, params = make_model_and_params(config)
        sampler = PackedUnconditionalSampler(model, params, config)
        out = sampler.sample(
            {
                "scale": 0.6,
                "outdir": str(tmp_path),
                "num_samples": 3,
                "prefix": "packed",
                "offset": 0,
                "lengths": [10, 14, 17],
                "names": ["10_0", "14_0", "17_1"],
            },
            key=jax.random.PRNGKey(0),
        )
        assert [int(f["num_residues"]) for f in out] == [10, 14, 17]
        for name, f in zip(["10_0", "14_0", "17_1"], out):
            assert np.isfinite(f["atom_positions"]).all()
            assert os.path.exists(str(tmp_path / "pdbs" / f"{name}.pdb"))


MOTIF_SPEC_PDB = """REMARK 999 NAME   tiny
REMARK 999 MINIMUM TOTAL LENGTH      20
REMARK 999 MAXIMUM TOTAL LENGTH      28
REMARK 999 INPUT      4  10
REMARK 999 INPUT  A   3   6 A
REMARK 999 INPUT      4  12
"""


def _motif_atoms():
    lines = []
    rng = np.random.default_rng(0)
    for i, ri in enumerate(range(3, 7)):
        x, y, z = rng.normal(size=3) * 4
        line = " " * 80
        def rep(s, idx, sub):
            return s[:idx] + sub + s[idx + len(sub):]
        line = rep(line, 0, "ATOM")
        line = rep(line, 6, str(i + 1).rjust(5))
        line = rep(line, 13, "CA")
        line = rep(line, 17, "ALA")
        line = rep(line, 21, "A")
        line = rep(line, 22, str(ri).rjust(4))
        line = rep(line, 30, f"{x:.3f}".rjust(8))
        line = rep(line, 38, f"{y:.3f}".rjust(8))
        line = rep(line, 46, f"{z:.3f}".rjust(8))
        line = rep(line, 77, "C")
        lines.append(line)
    return "\n".join(lines) + "\n"


class TestScaffoldSampler:
    def test_end_to_end(self, tmp_path):
        spec_path = str(tmp_path / "motif.pdb")
        open(spec_path, "w").write(MOTIF_SPEC_PDB + _motif_atoms())

        config = tiny_config()
        model, params = make_model_and_params(config)
        sampler = ScaffoldSampler(model, params, config)
        out = sampler.sample(
            {
                "scale": 0.4,
                "outdir": str(tmp_path / "out"),
                "num_samples": 2,
                "prefix": "m",
                "offset": 0,
                "filepath": spec_path,
            },
            key=jax.random.PRNGKey(1),
        )
        assert len(out) == 2
        for i, f in enumerate(out):
            assert 20 <= int(f["num_residues"]) <= 28
            assert f["fixed_sequence_mask"].sum() == 4
            assert os.path.exists(str(tmp_path / "out" / "pdbs" / f"m_{i}.pdb"))
            motif_path = str(tmp_path / "out" / "motif_pdbs" / f"m_{i}.pdb")
            assert os.path.exists(motif_path)
            # The aligned motif PDB re-indexes onto the sampled placement.
            placed = [j + 1 for j, v in enumerate(f["fixed_sequence_mask"]) if v]
            got = [int(l[22:26]) for l in open(motif_path) if l.startswith("ATOM")]
            assert got == placed

    def test_classifier_free_guidance(self, tmp_path):
        """strength > 0 applies real CFG (the reference's --strength is a
        dead flag, sample_scaffold.py:161): strength=0 must equal the plain
        conditional path exactly, strength>0 must change the outputs, and
        both must stay deterministic/finite."""
        spec_path = str(tmp_path / "motif.pdb")
        open(spec_path, "w").write(MOTIF_SPEC_PDB + _motif_atoms())

        config = tiny_config()
        model, params = make_model_and_params(config)
        sampler = ScaffoldSampler(model, params, config)
        # Same placements across runs: fix the host RNG per call.
        def run(strength):
            sampler._rng = np.random.default_rng(11)
            return sampler.sample(
                {
                    "scale": 0.4,
                    "outdir": str(tmp_path / f"out_s{strength}"),
                    "num_samples": 2,
                    "prefix": "m",
                    "offset": 0,
                    "filepath": spec_path,
                    "strength": strength,
                },
                key=jax.random.PRNGKey(3),
            )

        base = run(0)
        zero = run(0.0)
        for a, b in zip(base, zero):
            np.testing.assert_array_equal(a["atom_positions"], b["atom_positions"])

        guided = run(2.0)
        guided2 = run(2.0)
        for a, b in zip(guided, guided2):
            np.testing.assert_array_equal(a["atom_positions"], b["atom_positions"])
        deltas = [
            np.abs(a["atom_positions"] - b["atom_positions"]).max()
            for a, b in zip(base, guided)
        ]
        assert max(deltas) > 1e-4, deltas
        for f in guided:
            assert np.isfinite(f["atom_positions"]).all()

    def test_cfg_composes_with_accelerated_samplers(self, tmp_path):
        """strength > 0 guides through the DDIM and DPM paths too (the CFG
        wrapper replaces apply_fn for whichever solver runs)."""
        spec_path = str(tmp_path / "motif.pdb")
        open(spec_path, "w").write(MOTIF_SPEC_PDB + _motif_atoms())

        config = tiny_config()
        model, params = make_model_and_params(config)
        sampler = ScaffoldSampler(model, params, config)

        def run(strength, **extra):
            sampler._rng = np.random.default_rng(13)
            return sampler.sample(
                {
                    "scale": 0.4, "outdir": str(tmp_path / "o"),
                    "num_samples": 1, "prefix": "m", "offset": 0,
                    "filepath": spec_path, "strength": strength, **extra,
                },
                key=jax.random.PRNGKey(7),
            )

        for solver in ({"ddim_steps": 3}, {"dpm_steps": 3}):
            plain = run(0, **solver)
            cfg = run(2.0, **solver)
            delta = np.abs(
                plain[0]["atom_positions"] - cfg[0]["atom_positions"]
            ).max()
            assert delta > 1e-4, (solver, delta)
            assert np.isfinite(cfg[0]["atom_positions"]).all()
