"""TDS sanity check on an analytically tractable model.

Capability counterpart of the reference's `sanitycheck/check.ipynb` (which
validates the twisting math on image inpainting where ground truth is
visually obvious): here the data distribution is x0 ~ N(mu, I) so the
optimal noise predictor is closed-form, and we verify that twisted SMC pulls
samples toward placing the motif while plain ancestral sampling does not.
"""

import jax
import jax.numpy as jnp
import numpy as np

from genie2_tpu.diffusion import Schedule
from genie2_tpu.features import batchify, create_empty_features, to_device
from genie2_tpu.sampling import ancestral_sample, tds_sample
from genie2_tpu.sampling.twisting import (
    enumerate_motif_placements,
    placements_to_positions,
)

L, P = 16, 8
N_STEPS = 50


def make_analytic_apply(mu):
    """Optimal eps-model for x0 ~ N(mu, I):
    E[x0|x_t] = (1 - abar) mu + sqrt(abar) x_t, hence
    eps(x_t, t) = (x_t - sqrt(abar) E[x0|x_t]) / sqrt(1 - abar)."""
    schedule = Schedule.create(N_STEPS)

    def apply_fn(params, ts, t_vec, features, **kwargs):
        abar = schedule.alphas_cumprod[t_vec][:, None, None]
        x_t = ts.trans
        x0_hat = (1.0 - abar) * mu + jnp.sqrt(abar) * x_t
        eps = (x_t - jnp.sqrt(abar) * x0_hat) / jnp.sqrt(1.0 - abar)
        return {"z": eps}

    return apply_fn, schedule


def motif_rmsd(trans, positions, target):
    sel = np.asarray(trans)[:, np.asarray(positions)]
    sel = sel - sel.mean(axis=-2, keepdims=True)
    d = ((sel - target[None, None]) ** 2).sum(-1).mean(-1)  # [P, O]
    return d.min(axis=-1)  # best placement per particle


def test_twisting_improves_motif_placement():
    rng = np.random.default_rng(0)
    mu = jnp.asarray(rng.normal(size=(1, L, 3)).astype(np.float32))
    apply_fn, schedule = make_analytic_apply(mu)

    # Motif: a helix-ish 4-residue zig-zag, centered.
    motif = np.array(
        [[0, 0, 0], [3.8, 0, 0], [3.8, 3.8, 0], [0, 3.8, 0]], dtype=np.float32
    )
    motif = motif - motif.mean(0, keepdims=True)
    placements = enumerate_motif_placements(L, [4])
    positions = jnp.asarray(placements_to_positions(placements))

    feats = to_device(batchify([create_empty_features([L]) for _ in range(P)]))

    twisted, final_score, trace, _ = tds_sample(
        apply_fn,
        {},
        schedule,
        feats,
        positions,
        jnp.asarray(motif),
        jax.random.PRNGKey(0),
        jnp.float32(1.0),
        N_STEPS,
        untwist_below=2,
    )

    plain = ancestral_sample(
        apply_fn, {}, schedule, feats, jax.random.PRNGKey(0), jnp.float32(1.0), N_STEPS
    )

    d_twisted = motif_rmsd(twisted, positions, motif)
    d_plain = motif_rmsd(plain, positions, motif)
    assert np.isfinite(np.asarray(twisted)).all()
    # The twisted population must place the motif better on average.
    assert d_twisted.mean() < d_plain.mean(), (d_twisted.mean(), d_plain.mean())
    # Monitoring invariants.
    assert np.all(np.asarray(trace.ess) >= 1.0 - 1e-4)
    assert np.all(np.asarray(trace.ess) <= P + 1e-4)
