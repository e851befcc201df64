"""Corpus-scale input-pipeline benchmark (host-only, CPU).

Round-2's in-RAM cache could not hold the reference's 588k-structure AFDB
corpus; this measures the packed on-disk cache (train/cache.py) at scale:

  1. build a >=50k-structure synthetic corpus straight into a packed cache
     (streaming — one structure in memory at a time),
  2. iterate training batches through StructureDataset with motif
     augmentation on, reporting items/s and peak RSS,
  3. compare per-item epoch cost vs the legacy in-RAM backend on a small
     corpus (the two must be comparable — the memmap reads are not the
     bottleneck; mask sampling + padding are).

Usage: python tools/bench_cache.py [n_structures] [n_batches]
"""

import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # host-only; never touch the TPU

from genie2_tpu.features import create_empty_features  # noqa: E402
from genie2_tpu.train.cache import build_packed_cache, PackedCache  # noqa: E402
from genie2_tpu.train.data import (  # noqa: E402
    MotifAugmentConfig,
    StructureDataset,
    synthetic_dataset,
)


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def synthetic_features(n, max_n_res=256, min_n_res=20, seed=0):
    rng = np.random.default_rng(seed)
    for _ in range(n):
        n_res = int(rng.integers(min_n_res, max_n_res + 1))
        f = create_empty_features([n_res])
        steps = rng.normal(size=(n_res, 3)) * 1.5 + np.array([3.8, 0, 0])
        coords = np.cumsum(steps, axis=0)
        f["atom_positions"] = coords - coords.mean(0, keepdims=True)
        f["aatype"] = np.eye(20, dtype=int)[rng.integers(0, 20, n_res)]
        yield f


def main():
    n_structures = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    batch_size = 4
    cache_dir = f"/tmp/genie2_cache_bench/{n_structures}"

    print(f"== packed cache @ {n_structures} structures ==")
    t0 = time.perf_counter()
    if not os.path.isfile(os.path.join(cache_dir, "meta.json")):
        build_packed_cache(
            synthetic_features(n_structures), cache_dir, progress_every=25_000
        )
        print(f"build: {time.perf_counter() - t0:.1f} s (streaming)")
    cache = PackedCache(cache_dir)
    disk_mb = sum(
        os.path.getsize(os.path.join(cache_dir, f)) for f in os.listdir(cache_dir)
    ) / 2**20
    print(f"on disk: {disk_mb:.0f} MB  ({disk_mb * 2**20 / n_structures:.0f} B/structure)")
    print(f"RSS after build: {rss_mb():.0f} MB")

    ds = StructureDataset(
        [], max_n_res=256, max_n_chain=1,
        motif=MotifAugmentConfig(), cache_path=cache_dir,
    )
    assert len(ds) == n_structures
    rng = np.random.default_rng(7)
    it = ds.epoch(batch_size=batch_size, rng=rng)
    t0 = time.perf_counter()
    done = 0
    for batch in it:
        done += 1
        if done >= n_batches:
            break
    dt = time.perf_counter() - t0
    items = done * batch_size
    print(
        f"epoch iteration: {items} items in {dt:.2f} s -> "
        f"{items / dt:.0f} items/s ({dt / done * 1e3:.1f} ms/batch of {batch_size})"
    )
    print(f"peak RSS: {rss_mb():.0f} MB  (bound: 4096 MB)")
    assert rss_mb() < 4096, "RSS bound exceeded"

    # Small-corpus backend comparison (same structures both ways).
    n_small = 2000
    print(f"\n== backend comparison @ {n_small} structures ==")
    legacy = synthetic_dataset(n_small, 256, motif=MotifAugmentConfig())
    small_dir = "/tmp/genie2_cache_bench/small"
    build_packed_cache(synthetic_features(n_small), small_dir)
    packed = StructureDataset(
        [], max_n_res=256, max_n_chain=1,
        motif=MotifAugmentConfig(), cache_path=small_dir,
    )
    for label, d in [("legacy in-RAM", legacy), ("packed memmap", packed)]:
        rng = np.random.default_rng(3)
        t0 = time.perf_counter()
        n = 0
        for batch in d.epoch(batch_size=batch_size, rng=rng):
            n += batch_size
        dt = time.perf_counter() - t0
        print(f"{label:14s}: {n / dt:7.0f} items/s")

    os._exit(0)  # skip the backend's slow interpreter-exit path


if __name__ == "__main__":
    main()
