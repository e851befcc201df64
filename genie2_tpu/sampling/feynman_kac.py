"""Generic reverse-time Feynman-Kac particle filter.

Behavioral counterpart of smc_FK
(/root/reference/genie/sampler/twisted_diffusion/feynman_kac_pf.py:7-82,
Chopin's formulation), rebuilt as a lax.scan: the proposal M and potential G
are pure callables, resampling is a where-selected gather when ESS drops
below a threshold, and the ESS trace comes back stacked. Unlike the
reference file (whose imports are broken), this driver runs.

    M(key, particles, extra, t) -> (particles, extra)
    G(particles_new, particles_old, extra, t) -> log potential [P]
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from genie2_tpu.sampling.resampling import (
    ess_from_log_weights,
    normalize_log_weights,
    systematic_resample_indices,
)


class FKResult(NamedTuple):
    particles: Any
    log_weights: jnp.ndarray
    ess_trace: jnp.ndarray
    resampled_trace: jnp.ndarray


def smc_feynman_kac(
    M: Callable,
    G: Callable,
    init_particles: Any,
    init_extra: Any,
    key: jax.Array,
    n_steps: int,
    n_particles: int,
    ess_threshold: float = 0.5,
    steps_per_dispatch: Optional[int] = None,
) -> FKResult:
    """Run the particle filter for steps n_steps..1.

    `init_particles` is any pytree with leading particle axis P;
    resampling gathers along that axis for every leaf.

    `steps_per_dispatch` bounds the length of each compiled scan dispatch
    (carry threads through host-level segments) — same watchdog-avoidance
    segmentation as sampling.ddpm; results are segmentation-invariant
    because RNG advances through the scan carry identically.
    """
    log_w = jnp.zeros((n_particles,), jnp.float32)

    def gather(tree, idx):
        return jax.tree_util.tree_map(lambda x: x[idx], tree)

    def body(carry, t):
        particles, extra, log_w, key = carry
        key, m_key, r_key = jax.random.split(key, 3)

        new_particles, new_extra = M(m_key, particles, extra, t)
        log_g = G(new_particles, particles, new_extra, t)
        log_w_new = log_w + log_g

        ess = ess_from_log_weights(log_w_new)
        do_resample = ess < ess_threshold * n_particles

        weights = jax.nn.softmax(log_w_new)
        idx = systematic_resample_indices(weights, r_key)
        sel = jnp.where(do_resample, idx, jnp.arange(n_particles))

        particles_out = gather(new_particles, sel)
        extra_out = gather(new_extra, sel) if new_extra is not None else None
        log_w_out = jnp.where(
            do_resample,
            jnp.zeros_like(log_w_new),
            normalize_log_weights(log_w_new) + jnp.log(float(n_particles)),
        )
        return (particles_out, extra_out, log_w_out, key), (ess, do_resample)

    @jax.jit
    def run_segment(carry, seg):
        return jax.lax.scan(body, carry, seg)

    steps = np.arange(n_steps, 0, -1)
    k = steps_per_dispatch or n_steps
    carry = (init_particles, init_extra, log_w, key)
    ess_parts, res_parts = [], []
    for i in range(0, n_steps, k):
        carry, (ess, resampled) = run_segment(carry, jnp.asarray(steps[i : i + k]))
        ess_parts.append(ess)
        res_parts.append(resampled)
    particles, extra, log_w, _ = carry
    return FKResult(
        particles, log_w, jnp.concatenate(ess_parts), jnp.concatenate(res_parts)
    )
