"""Native C++ PDB parser: parity with the Python parser + speed sanity."""

import gzip
import os
import time

import numpy as np
import pytest

from genie2_tpu.features import create_empty_features, save_features_to_pdb
from genie2_tpu.features.pdb import parse_pdb as parse_pdb_python
from genie2_tpu.features.pdb_native import native_available, parse_pdb_fast


def _write_pdb(tmp_path, n=50, seed=0, gz=False):
    rng = np.random.default_rng(seed)
    f = create_empty_features([n])
    f["atom_positions"] = rng.normal(size=(n, 3)) * 20
    f["aatype"] = np.eye(20)[rng.integers(0, 20, n)].astype(int)
    path = str(tmp_path / f"s{seed}.pdb")
    save_features_to_pdb(f, path)
    if gz:
        gz_path = path + ".gz"
        with open(path, "rb") as fin, gzip.open(gz_path, "wb") as fout:
            fout.write(fin.read())
        return gz_path
    return path


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
class TestNativeParser:
    def test_parity_plain(self, tmp_path):
        path = _write_pdb(tmp_path, n=80, seed=1)
        seqs_p, coords_p = parse_pdb_python(path)
        seqs_n, coords_n = parse_pdb_fast(path)
        assert seqs_p == seqs_n
        np.testing.assert_allclose(
            np.concatenate(coords_p), np.concatenate(coords_n), atol=1e-4
        )

    def test_parity_gzip(self, tmp_path):
        path = _write_pdb(tmp_path, n=33, seed=2, gz=True)
        seqs_p, coords_p = parse_pdb_python(path)
        seqs_n, coords_n = parse_pdb_fast(path)
        assert seqs_p == seqs_n
        np.testing.assert_allclose(
            np.concatenate(coords_p), np.concatenate(coords_n), atol=1e-4
        )

    def test_multichain_split(self, tmp_path):
        # Two chains -> the parser must split on the chain-id change.
        f = create_empty_features([10, 7])
        rng = np.random.default_rng(3)
        f["atom_positions"] = rng.normal(size=(17, 3)) * 10
        f["aatype"] = np.eye(20)[rng.integers(0, 20, 17)].astype(int)
        path = str(tmp_path / "mc.pdb")
        save_features_to_pdb(f, path)
        seqs_n, coords_n = parse_pdb_fast(path)
        assert [len(s) for s in seqs_n] == [10, 7]

    def test_unknown_residue_falls_back(self, tmp_path):
        path = str(tmp_path / "bad.pdb")
        line = "ATOM      1  CA  XXX A   1       1.000   2.000   3.000"
        open(path, "w").write(line + "\n")
        with pytest.raises(KeyError):
            parse_pdb_fast(path)  # falls back to Python, which raises KeyError

    def test_faster_than_python(self, tmp_path):
        path = _write_pdb(tmp_path, n=256, seed=4)
        # Warm both (library build happens on first native call).
        parse_pdb_fast(path)
        parse_pdb_python(path)
        t0 = time.perf_counter()
        for _ in range(50):
            parse_pdb_fast(path)
        native_t = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(50):
            parse_pdb_python(path)
        python_t = time.perf_counter() - t0
        assert native_t < python_t, (native_t, python_t)
