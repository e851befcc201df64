"""Feature schema + PDB I/O + motif spec tests."""

import numpy as np
import pytest

from genie2_tpu.features import (
    batchify,
    create_empty_features,
    debatchify,
    features_from_pdb,
    load_motif_spec,
    sample_motif_mask,
    save_features_to_pdb,
    to_device,
    parse_pdb,
)


class TestSchema:
    def test_empty_features(self):
        f = create_empty_features([10, 5])
        assert int(f["num_chains"]) == 2
        assert int(f["num_residues"]) == 15
        assert f["aatype"].shape == (15, 20)
        assert f["fixed_structure_mask"].shape == (15, 15)
        np.testing.assert_array_equal(f["residue_index"][:10], np.arange(10))
        np.testing.assert_array_equal(f["residue_index"][10:], np.arange(5))
        np.testing.assert_array_equal(f["chain_index"], [0] * 10 + [1] * 5)

    def test_batchify_debatchify_roundtrip(self):
        fs = [create_empty_features([8]), create_empty_features([12])]
        fs[0]["atom_positions"] = np.random.default_rng(0).normal(size=(8, 3))
        batch = batchify([dict(f) for f in fs])
        assert batch["atom_positions"].shape == (2, 12, 3)
        assert batch["residue_mask"][0, 8:].sum() == 0
        back = debatchify(batch)
        for orig, rec in zip(fs, back):
            for k in orig:
                np.testing.assert_array_equal(orig[k], rec[k])

    def test_to_device_dtypes(self):
        import jax.numpy as jnp

        batch = batchify([create_empty_features([4])])
        dev = to_device(batch)
        assert dev["atom_positions"].dtype == jnp.float32
        assert dev["fixed_sequence_mask"].dtype == jnp.bool_
        assert dev["residue_index"].dtype == jnp.int32


class TestPdbIO:
    def test_roundtrip(self, tmp_path):
        f = create_empty_features([6])
        rng = np.random.default_rng(1)
        f["atom_positions"] = rng.normal(size=(6, 3)) * 10
        f["aatype"] = np.eye(20)[rng.integers(0, 20, 6)].astype(int)
        path = str(tmp_path / "test.pdb")
        save_features_to_pdb(f, path)
        f2 = features_from_pdb(path)
        assert int(f2["num_residues"]) == 6
        centered = f["atom_positions"] - f["atom_positions"].mean(0, keepdims=True)
        np.testing.assert_allclose(f2["atom_positions"], centered, atol=2e-3)
        np.testing.assert_array_equal(f2["aatype"], f["aatype"])

    def test_parity_vs_reference_writer(self, tmp_path, reference_modules):
        """Byte-level parity of the PDB writer against the reference."""
        import sys

        sys.path.insert(0, "/root/reference")
        from genie.utils import feat_utils as ref_feat

        f = create_empty_features([5])
        rng = np.random.default_rng(2)
        f["atom_positions"] = rng.normal(size=(5, 3)) * 5
        f["aatype"] = np.eye(20)[rng.integers(0, 20, 5)].astype(int)
        f["fixed_group"] = np.array([0, 1, 1, 0, 2])
        ours = str(tmp_path / "ours.pdb")
        theirs = str(tmp_path / "theirs.pdb")
        save_features_to_pdb(f, ours)
        ref_feat.save_np_features_to_pdb(f, theirs)
        assert open(ours).read() == open(theirs).read()

    def test_gzip_support(self, tmp_path):
        import gzip

        f = create_empty_features([4])
        f["atom_positions"] = np.arange(12).reshape(4, 3).astype(float)
        plain = str(tmp_path / "x.pdb")
        save_features_to_pdb(f, plain)
        gz = str(tmp_path / "x.pdb.gz")
        with open(plain, "rb") as fin, gzip.open(gz, "wb") as fout:
            fout.write(fin.read())
        seqs, coords = parse_pdb(gz)
        assert len(seqs) == 1 and len(seqs[0]) == 4


MOTIF_SPEC = """REMARK 999 NAME   test_problem
REMARK 999 MINIMUM TOTAL LENGTH      30
REMARK 999 MAXIMUM TOTAL LENGTH      40
REMARK 999 INPUT      5  15
REMARK 999 INPUT  A   5  10 A
REMARK 999 INPUT      5  15
REMARK 999 INPUT  A  20  24 B
ATOM      1  CA  ALA A   5       1.000   2.000   3.000
"""


class TestMotifSpec:
    def test_load_spec(self, tmp_path):
        path = str(tmp_path / "spec.pdb")
        open(path, "w").write(MOTIF_SPEC)
        spec = load_motif_spec(path)
        assert spec["min_total_length"] == 30
        assert spec["max_total_length"] == 40
        assert len(spec["structures"]) == 4
        assert spec["structures"][0] == {"type": "scaffold", "min_length": 5, "max_length": 15}
        assert spec["structures"][1] == {
            "type": "motif", "chain": "A", "start_index": 5, "end_index": 10, "group": "A",
        }
        assert spec["structures"][3]["group"] == "B"

    def test_sample_motif_mask(self, tmp_path):
        path = str(tmp_path / "spec.pdb")
        open(path, "w").write(MOTIF_SPEC)
        spec = load_motif_spec(path)
        rng = np.random.default_rng(0)
        for _ in range(10):
            mask = sample_motif_mask(spec, rng)
            total = len(mask["sequence"])
            assert 30 <= total <= 40
            assert mask["sequence"].sum() == 6 + 5  # two motif segments
            # Structure mask is block-diagonal per group: groups A and B do
            # not cross.
            ga = mask["group"] == 1
            gb = mask["group"] == 2
            assert mask["structure"][np.ix_(ga, gb)].sum() == 0
            assert mask["structure"][np.ix_(ga, ga)].all()
