"""Packed on-disk feature cache (train/cache.py): corpus-scale backend.

The round-2 in-RAM cache could not hold the reference's real AFDB corpus
(588k structures, /root/reference/README.md:47); the packed cache stores
int8 aatype indices + float32 coords in memmap files. These tests pin the
contract: reconstruction is identical to a fresh parse (through the
float32 device cast), the training batch stream is unchanged vs the legacy
backend, and builds are atomic.
"""

import os

import numpy as np
import pytest

from genie2_tpu.features import (
    batchify,
    create_empty_features,
    features_from_pdb,
    save_features_to_pdb,
    to_device,
)
from genie2_tpu.train.cache import (
    PackedCache,
    build_packed_cache,
    build_packed_cache_from_files,
    is_packed_cache,
)
from genie2_tpu.train.data import MotifAugmentConfig, StructureDataset


def _write_structures(tmp_path, n=6, seed=0, monomer_only=False):
    rng = np.random.default_rng(seed)
    paths = []
    for i in range(n):
        if i == n - 1 and not monomer_only:
            lengths = [12, 9]  # one multichain structure
        else:
            # >= 20 residues: the reference's minimumNumResidues floor, and
            # the motif-size sampler assumes floor(0.05 * n) >= 1.
            lengths = [int(rng.integers(20, 37))]
        f = create_empty_features(lengths)
        total = int(f["num_residues"])
        steps = rng.normal(size=(total, 3))
        steps = steps / np.linalg.norm(steps, axis=-1, keepdims=True) * 3.8
        f["atom_positions"] = np.cumsum(steps, axis=0)
        f["aatype"] = np.eye(20, dtype=int)[rng.integers(0, 20, total)]
        path = str(tmp_path / f"s{i}.pdb")
        save_features_to_pdb(f, path)
        paths.append(path)
    return paths


class TestPackedCache:
    def test_roundtrip_matches_fresh_parse(self, tmp_path):
        paths = _write_structures(tmp_path)
        cache = build_packed_cache_from_files(paths, str(tmp_path / "cache"))
        assert len(cache) == len(paths)
        for i, path in enumerate(paths):
            fresh = features_from_pdb(path)
            packed = cache.load(i)
            assert set(packed) == set(fresh)
            for k in fresh:
                if k == "atom_positions":
                    # float32 storage: identical through the device cast.
                    np.testing.assert_array_equal(
                        fresh[k].astype(np.float32), packed[k].astype(np.float32)
                    )
                else:
                    np.testing.assert_array_equal(fresh[k], packed[k])
                assert packed[k].dtype == fresh[k].dtype, k
        np.testing.assert_array_equal(
            cache.lengths(),
            [int(features_from_pdb(p)["num_residues"]) for p in paths],
        )

    def test_device_batch_identical_to_legacy(self, tmp_path):
        """What the model sees must be bit-identical between backends."""
        paths = _write_structures(tmp_path)
        cache = build_packed_cache_from_files(paths, str(tmp_path / "cache"))
        fresh = batchify([features_from_pdb(p) for p in paths[:3]])
        packed = batchify([cache.load(i) for i in range(3)])
        a, b = to_device(fresh), to_device(packed)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))

    def test_reopen_without_rebuild(self, tmp_path):
        paths = _write_structures(tmp_path, n=3)
        cdir = str(tmp_path / "cache")
        build_packed_cache_from_files(paths, cdir)
        assert is_packed_cache(cdir)
        reopened = PackedCache(cdir)
        np.testing.assert_array_equal(
            reopened.load(1)["atom_positions"],
            features_from_pdb(paths[1])["atom_positions"].astype(np.float32),
        )

    def test_build_is_atomic(self, tmp_path):
        """A failed build leaves no valid cache; a stale .building dir is
        cleaned up by the next build."""
        cdir = str(tmp_path / "cache")

        def boom():
            yield features_from_pdb(_write_structures(tmp_path, n=1)[0])
            raise RuntimeError("interrupted")

        import glob as _glob

        with pytest.raises(RuntimeError):
            build_packed_cache(boom(), cdir)
        assert not is_packed_cache(cdir)
        assert _glob.glob(cdir + ".building.*")  # per-pid tmp left behind

        paths = _write_structures(tmp_path, n=2, seed=1)
        cache = build_packed_cache_from_files(paths, cdir)
        assert is_packed_cache(cdir) and len(cache) == 2
        # This pid's tmp dir was consumed by the successful build.
        assert len(_glob.glob(cdir + ".building.*")) <= 1

    def test_empty_corpus(self, tmp_path):
        cache = build_packed_cache(iter([]), str(tmp_path / "cache"))
        assert len(cache) == 0 and cache.lengths().shape == (0,)


class TestDatasetBackends:
    def _epoch_batches(self, ds, seed=5):
        rng = np.random.default_rng(seed)
        return list(ds.epoch(batch_size=2, rng=rng))

    def test_epoch_stream_identical(self, tmp_path):
        """Same files, same rng -> identical batch stream (incl. motif
        augmentation draws) from packed and legacy backends."""
        paths = _write_structures(tmp_path, n=5, monomer_only=True)
        motif = MotifAugmentConfig(prob=0.7)
        common = dict(max_n_res=40, max_n_chain=2, motif=motif)
        legacy = StructureDataset(paths, cache_path=None, **common)
        packed = StructureDataset(
            paths, cache_path=str(tmp_path / "cache"), **common
        )
        assert len(legacy) == len(packed) == 5
        for ba, bb in zip(self._epoch_batches(legacy), self._epoch_batches(packed)):
            assert set(ba) == set(bb)
            for k in ba:
                np.testing.assert_array_equal(
                    ba[k].astype(np.float32) if k == "atom_positions" else ba[k],
                    bb[k].astype(np.float32) if k == "atom_positions" else bb[k],
                )

    def test_mid_epoch_resume_stream(self, tmp_path):
        """start_batch resume on the packed backend reproduces exactly the
        batches the uninterrupted epoch would have yielded (the data-side
        half of the kill-and-resume guarantee in test_train.py)."""
        paths = _write_structures(tmp_path, n=8, monomer_only=True)
        ds = StructureDataset(
            paths, 40, 2, motif=MotifAugmentConfig(prob=0.9),
            cache_path=str(tmp_path / "cache"),
        )
        full = list(ds.epoch(batch_size=2, rng=np.random.default_rng(11)))
        resumed = list(
            ds.epoch(batch_size=2, rng=np.random.default_rng(11), start_batch=2)
        )
        assert len(resumed) == len(full) - 2
        for ba, bb in zip(full[2:], resumed):
            for k in ba:
                np.testing.assert_array_equal(ba[k], bb[k])

    def test_mismatched_corpus_rebuilds(self, tmp_path):
        """A cache built from a different corpus (e.g. a --test subset)
        must be rebuilt, never silently served (code-review finding)."""
        paths = _write_structures(tmp_path, n=6, monomer_only=True)
        cdir = str(tmp_path / "cache")
        small = StructureDataset(paths[:2], 40, 1, cache_path=cdir)
        assert len(small) == 2
        full = StructureDataset(paths, 40, 1, cache_path=cdir)
        assert len(full) == 6
        # And attach-only mode (no filepaths) trusts whatever is there.
        attached = StructureDataset([], 40, 1, cache_path=cdir)
        assert len(attached) == 6

    def test_concurrent_build_tmp_dirs_do_not_collide(self, tmp_path):
        """Per-process tmp dirs: a stale .building dir from another pid
        must not be touched by this build."""
        import os as _os

        from genie2_tpu.train.cache import build_packed_cache_from_files

        paths = _write_structures(tmp_path, n=2, monomer_only=True)
        cdir = str(tmp_path / "cache")
        foreign = cdir + ".building.99999999"
        _os.makedirs(foreign)
        open(_os.path.join(foreign, "marker"), "w").write("x")
        cache = build_packed_cache_from_files(paths, cdir)
        assert len(cache) == 2
        assert _os.path.exists(_os.path.join(foreign, "marker"))

    def test_lost_publish_race_attaches_to_winner(self, tmp_path, monkeypatch):
        """Two builders over a shared rootdir: the loser's os.replace hits
        ENOTEMPTY (the winner republished cache_dir between the loser's
        rmtree and rename) and must attach to the winner's complete cache
        instead of crashing — the documented last-finisher-wins contract."""
        import shutil as _shutil

        from genie2_tpu.train import cache as cache_mod
        from genie2_tpu.train.cache import build_packed_cache_from_files

        paths = _write_structures(tmp_path, n=3, monomer_only=True)
        cdir = str(tmp_path / "cache")

        real_replace = os.replace

        def racing_replace(src, dst):
            # Simulate the winner publishing between our rmtree and
            # rename: materialize a complete cache at dst, then fail the
            # way os.replace does onto a non-empty directory.
            _shutil.copytree(src, dst)
            raise OSError(39, "Directory not empty", dst)

        monkeypatch.setattr(cache_mod.os, "replace", racing_replace)
        cache = build_packed_cache_from_files(paths, cdir)
        monkeypatch.setattr(cache_mod.os, "replace", real_replace)
        assert len(cache) == 3
        # The loser's tmp dir was cleaned up; the winner's cache serves.
        assert not [d for d in os.listdir(tmp_path) if ".building" in d]
        assert cache.load(0)["atom_positions"].shape[-1] == 3

    def test_genuine_publish_failure_reraises_without_tmp_debris(
        self, tmp_path, monkeypatch
    ):
        """A non-race os.replace failure (EACCES/EXDEV) must re-raise —
        there is no winner cache to attach to — AND must not leak the
        corpus-sized tmp dir into rootdir (a retrying caller would
        accumulate gigabytes of .building debris otherwise)."""
        import pytest

        from genie2_tpu.train import cache as cache_mod
        from genie2_tpu.train.cache import build_packed_cache_from_files

        paths = _write_structures(tmp_path, n=2, monomer_only=True)
        cdir = str(tmp_path / "cache")

        def failing_replace(src, dst):
            raise OSError(13, "Permission denied", dst)

        monkeypatch.setattr(cache_mod.os, "replace", failing_replace)
        with pytest.raises(OSError, match="Permission denied"):
            build_packed_cache_from_files(paths, cdir)
        assert not [d for d in os.listdir(tmp_path) if ".building" in d]

    def test_second_open_reuses_cache(self, tmp_path):
        paths = _write_structures(tmp_path, n=3)
        cdir = str(tmp_path / "cache")
        StructureDataset(paths, 40, 2, cache_path=cdir)
        mtime = os.path.getmtime(os.path.join(cdir, "coords.f32"))
        ds = StructureDataset(paths, 40, 2, cache_path=cdir)
        assert os.path.getmtime(os.path.join(cdir, "coords.f32")) == mtime
        assert len(ds) == 3
