"""Secondary-structure-guided SMC sampling.

The reference ships `sampler/secstruct.py` as "twisting-target utilities"
for secondary-structure-conditioned SMC (its example statistic h(x) = 1 if
>50% helix, secstruct.py:83-97) but never wires them into a sampler. This
module completes the capability TPU-natively: a *differentiable* soft SSE
statistic on the C-alpha trace feeds the generic Feynman-Kac particle
filter (sampling/feynman_kac.py) as its potential G, with the DDPM reverse
kernel as the proposal M. The per-step potential is the tempered increment

    log G_t = strength * (h(x_t) - h(x_{t+1}))

which telescopes over the trajectory to exp(strength * h(x_0)) — the FK
measure tilts the sampler toward structures with the requested SSE content
while ESS-triggered systematic resampling keeps the particle population
healthy. The reverse loop runs as watchdog-safe scan segments (default 100
steps per dispatch, like every other sampler here); no gradients through
the model are needed (unlike TDS motif twisting, sampling/smc.py).

The soft statistics use canonical CA-geometry signatures (P-SEA thresholds,
Labesse et al. 1997 — same criteria features/secstruct.py applies as hard
cutoffs): alpha-helix d(i,i+3) ~ 5.3 A / d(i,i+4) ~ 6.2 A; extended strand
d(i,i+3) ~ 9.9 A / d(i,i+4) ~ 13.1 A.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from genie2_tpu.diffusion import Schedule
from genie2_tpu.sampling.ddpm import (
    DEFAULT_STEPS_PER_DISPATCH,
    init_translations,
    reverse_step,
)
from genie2_tpu.sampling.feynman_kac import FKResult, smc_feynman_kac

# (d3 center, d4 center, gaussian width) per SSE class, in Angstrom.
_SSE_SIGNATURES = {
    "helix": (5.3, 6.2, 1.0),
    "strand": (9.9, 13.1, 1.5),
}


def soft_sse_fraction(
    trans: jnp.ndarray, mask: jnp.ndarray, target: str = "helix"
) -> jnp.ndarray:
    """Differentiable fraction of 5-residue windows matching an SSE class.

    Args:
        trans: [..., N, 3] CA coordinates.
        mask: [..., N] residue mask.
    Returns:
        [...] score in [0, 1].
    """
    d3_c, d4_c, width = _SSE_SIGNATURES[target]
    d3 = jnp.linalg.norm(trans[..., 3:, :] - trans[..., :-3, :], axis=-1)
    d4 = jnp.linalg.norm(trans[..., 4:, :] - trans[..., :-4, :], axis=-1)
    s = jnp.exp(-(((d3[..., :-1] - d3_c) / width) ** 2)) * jnp.exp(
        -(((d4 - d4_c) / width) ** 2)
    )
    m = mask.astype(trans.dtype)
    # A window starting at i needs residues i..i+4 all real.
    wmask = m[..., :-4] * m[..., 1:-3] * m[..., 2:-2] * m[..., 3:-1] * m[..., 4:]
    return jnp.sum(s * wmask, axis=-1) / jnp.maximum(jnp.sum(wmask, axis=-1), 1.0)


def sse_guided_sample(
    apply_fn: Callable,
    params,
    schedule: Schedule,
    features: Dict[str, Any],
    key: jax.Array,
    n_particles: int,
    target: str = "helix",
    strength: float = 20.0,
    scale: float = 0.6,
    ess_threshold: float = 0.5,
    steps_per_dispatch: int = DEFAULT_STEPS_PER_DISPATCH,
) -> Tuple[jnp.ndarray, FKResult]:
    """SSE-guided generation: `n_particles` particles through the DDPM
    reverse process reweighted toward the requested SSE class.

    `features` must be a batchified feature dict whose batch axis equals
    n_particles (the same design target replicated per particle — exactly
    how the TDS sampler treats its particle axis).
    Returns (final translations [P, N, 3], FKResult with ESS/resample
    traces).
    """
    assert features["residue_mask"].shape[0] == n_particles
    mask = features["residue_mask"]
    fmask = mask.astype(jnp.float32)[..., None]

    key, init_key = jax.random.split(key)
    trans0 = init_translations(
        features, init_key, jnp.arange(n_particles, dtype=jnp.int32)
    )

    def M(m_key, particles, extra, t):
        noise = jax.random.normal(m_key, particles.shape, particles.dtype) * fmask
        new = reverse_step(
            apply_fn, params, schedule, features, particles, t, noise,
            jnp.float32(scale),
        )
        return new, None

    def G(new_particles, old_particles, extra, t):
        h_new = soft_sse_fraction(new_particles, mask, target)
        h_old = soft_sse_fraction(old_particles, mask, target)
        return jnp.float32(strength) * (h_new - h_old)

    result = smc_feynman_kac(
        M, G, trans0, None, key, schedule.n_timestep, n_particles,
        ess_threshold=ess_threshold, steps_per_dispatch=steps_per_dispatch,
    )
    return result.particles, result
