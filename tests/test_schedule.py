"""Schedule parity vs the torch reference + coefficient identities."""

import numpy as np

from genie2_tpu.diffusion import Schedule, cosine_beta_schedule


class TestSchedule:
    def test_betas_parity(self, reference_modules):
        ref = reference_modules["schedule"]
        for n in [10, 100, 1000]:
            theirs = ref.get_betas(n, "cosine").numpy()
            ours = cosine_beta_schedule(n)
            assert ours.shape == (n + 1,)
            assert np.allclose(ours, theirs, atol=1e-6), n

    def test_beta0_zero_and_clip(self):
        betas = cosine_beta_schedule(1000)
        assert betas[0] == 0.0
        assert betas.max() <= 0.999 + 1e-8
        assert (betas[1:] > 0).all()

    def test_derived_tables(self):
        s = Schedule.create(1000)
        assert s.n_timestep == 1000
        np.testing.assert_allclose(s.alphas, 1.0 - s.betas, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(s.alphas_cumprod_prev)[1:], np.asarray(s.alphas_cumprod)[:-1], rtol=1e-6
        )
        assert np.asarray(s.alphas_cumprod_prev)[0] == 1.0
        np.testing.assert_allclose(
            s.sqrt_one_minus_alphas_cumprod,
            np.sqrt(np.asarray(s.one_minus_alphas_cumprod)),
            rtol=1e-5,
        )
        # Posterior identities at a few steps (skip t=0, undefined there).
        t = np.array([1, 2, 500, 1000])
        betas = np.asarray(s.betas, dtype=np.float64)
        abar = np.asarray(s.alphas_cumprod, dtype=np.float64)
        abar_prev = np.asarray(s.alphas_cumprod_prev, dtype=np.float64)
        np.testing.assert_allclose(
            np.asarray(s.posterior_mean_coef1)[t],
            (betas[t] * abar_prev[t] / (1 - abar[t])),
            rtol=1e-4,
        )

    def test_posterior_equivalence(self):
        """mu from eps (base sampler) == mu from x0 (TDS sampler) for the
        same eps when coef1 uses sqrt(abar_prev)."""
        import jax.numpy as jnp

        from genie2_tpu.diffusion import (
            posterior_mean_from_eps,
            posterior_mean_from_x0,
            x0_from_eps,
        )

        s = Schedule.create(100)
        rng = np.random.default_rng(0)
        xt = jnp.asarray(rng.normal(size=(2, 8, 3)).astype(np.float32))
        eps = jnp.asarray(rng.normal(size=(2, 8, 3)).astype(np.float32))
        t = jnp.array([5, 50])
        mu1 = posterior_mean_from_eps(s, xt, t, eps)
        x0 = x0_from_eps(s, xt, t, eps)
        mu2 = posterior_mean_from_x0(s, xt, t, x0)
        # The TDS coefficient pair uses sqrt(abar_{t-1}); both are the DDPM
        # posterior mean, so they agree.
        np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu2), atol=2e-4)
