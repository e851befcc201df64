"""Async input pipeline tests (VERDICT Missing #5).

The prefetcher must be a pure latency optimization: same items, same
order, same exceptions, and byte-identical training trajectories whether
it is on or off.
"""

import time

import numpy as np
import pytest

from genie2_tpu.train import PrefetchIterator, prefetch, synthetic_dataset


class TestPrefetchIterator:
    def test_order_and_mapping(self):
        out = list(prefetch(range(100), lambda x: x * 2, depth=3))
        assert out == [x * 2 for x in range(100)]

    def test_depth_zero_is_synchronous(self):
        gen = prefetch(range(5), lambda x: x + 1, depth=0)
        assert not isinstance(gen, PrefetchIterator)
        assert list(gen) == [1, 2, 3, 4, 5]

    def test_exception_propagates_at_position(self):
        def source():
            yield 1
            yield 2
            raise ValueError("boom")

        it = prefetch(source(), depth=2)
        assert next(it) == 1
        assert next(it) == 2
        with pytest.raises(ValueError, match="boom"):
            next(it)

    def test_place_fn_exception_propagates(self):
        def bad(x):
            if x == 3:
                raise RuntimeError("bad item")
            return x

        it = prefetch(range(10), bad, depth=2)
        assert [next(it) for _ in range(3)] == [0, 1, 2]
        with pytest.raises(RuntimeError, match="bad item"):
            next(it)

    def test_early_close_stops_worker(self):
        produced = []

        def source():
            for i in range(10_000):
                produced.append(i)
                yield i

        it = PrefetchIterator(source(), depth=2)
        assert next(it) == 0
        it.close()
        n = len(produced)
        time.sleep(0.2)
        # Worker stopped: at most one extra item after close (in-flight put).
        assert len(produced) <= n + 1
        with pytest.raises(StopIteration):
            next(it)

    def test_runs_ahead_of_consumer(self):
        """With a slow consumer, the worker fills the buffer ahead."""
        produced = []

        def source():
            for i in range(6):
                produced.append(i)
                yield i

        it = PrefetchIterator(source(), depth=3)
        first = next(it)
        deadline = time.monotonic() + 2.0
        # depth=3 buffer + 1 consumed + 1 in-hand => at least 4 produced.
        while len(produced) < 4 and time.monotonic() < deadline:
            time.sleep(0.01)
        assert first == 0
        assert len(produced) >= 4
        assert list(it) == [1, 2, 3, 4, 5]


class TestTrainerPrefetch:
    def _run(self, tmp_path, tag, depth, dataset):
        import json
        import os

        from genie2_tpu.train.loop import Trainer
        from tests.test_train import tiny_config

        config = tiny_config()
        config.io["rootdir"] = str(tmp_path / tag)
        config.io["name"] = "pf"
        config.training["n_epoch"] = 2
        config.training["batch_size"] = 4
        config.training["log_every_n_step"] = 1
        config.training["prefetch_depth"] = depth
        t = Trainer(config, use_mesh=False)
        t.fit(dataset)
        losses = []
        with open(os.path.join(t.workdir, "metrics.jsonl")) as f:
            for line in f:
                rec = json.loads(line)
                if rec.get("prefix", "train") == "train":
                    losses.append((rec["step"], rec["weighted_loss"]))
        return losses

    def test_prefetch_identical_to_synchronous(self, tmp_path):
        ds = synthetic_dataset(8, max_n_res=24)
        sync_losses = self._run(tmp_path, "sync", 0, ds)
        async_losses = self._run(tmp_path, "async", 2, ds)
        assert len(sync_losses) == 4
        assert sync_losses == async_losses

    def test_disk_dataset_through_prefetch(self, tmp_path):
        """End-to-end: PDB files on disk -> parse-once cache -> prefetched
        epoch -> train step. Matches the synthetic in-memory path exactly
        when the structures are identical."""
        import os

        from genie2_tpu.features import save_features_to_pdb
        from genie2_tpu.train import StructureDataset

        mem = synthetic_dataset(8, max_n_res=24)
        pdb_dir = tmp_path / "pdbs"
        os.makedirs(pdb_dir)
        for i, feats in enumerate(mem._cache):
            save_features_to_pdb(feats, str(pdb_dir / f"s{i:03d}.pdb"))
        paths = sorted(str(p) for p in pdb_dir.glob("*.pdb"))
        disk = StructureDataset(paths, max_n_res=24, max_n_chain=1)
        assert len(disk) == 8

        losses = self._run(tmp_path, "disk", 2, disk)
        assert len(losses) == 4
        assert all(np.isfinite(l) for _, l in losses)
