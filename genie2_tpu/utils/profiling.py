"""Tracing / profiling utilities.

The reference has no profiling support (SURVEY.md §5); this provides:
  * `trace(logdir)` — context manager around jax.profiler for
    xprof/tensorboard-compatible device traces
  * `StepTimer` — wall-clock step timing with warmup discard and summary
    percentiles, synchronizing via a tiny host fetch (block_until_ready is
    unreliable on tunneled backends).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def force_execution(tree) -> float:
    """Force execution of all floating leaves; returns a checksum scalar."""
    leaves = [
        jnp.sum(x)
        for x in jax.tree_util.tree_leaves(tree)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
    ]
    if not leaves:
        return 0.0
    return float(sum(jax.device_get(l) for l in leaves))


class StepTimer:
    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times: List[float] = []
        self._seen = 0

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self._seen += 1
        if self._seen > self.warmup:
            self.times.append(dt)

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p90_s": float(np.percentile(arr, 90)),
            "min_s": float(arr.min()),
            "n": len(arr),
        }
