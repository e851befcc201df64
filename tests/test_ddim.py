"""Accelerated DDIM sampler tests (no reference counterpart — the reference
only has the 1000-step ancestral loop, base.py:236-282).

Correctness anchors:
  * exact x0 recovery: with an oracle eps-model, one eta=0 DDIM step from
    any t recovers x0 to float precision (the defining property of the
    DDIM ODE update);
  * the update matches a closed-form numpy transcription of Song et al.
    eq. 12 for arbitrary (t, t_prev, eta);
  * determinism / schedule shape / mask invariants;
  * the CLI path produces valid PDBs at 8 steps.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genie2_tpu.diffusion import Schedule, ddim_step_from_eps, q_sample
from genie2_tpu.features import batchify, create_empty_features, to_device
from genie2_tpu.sampling import ddim_sample, ddim_schedule


class TestDDIMSchedule:
    def test_pairs_descend_and_end_at_zero(self):
        pairs = ddim_schedule(1000, 10)
        assert pairs.shape == (10, 2)
        assert pairs[0, 0] == 1000 and pairs[-1, 1] == 0
        ts = pairs[:, 0]
        assert (ts[1:] < ts[:-1]).all()
        np.testing.assert_array_equal(pairs[:-1, 1], pairs[1:, 0])

    def test_full_sequence(self):
        pairs = ddim_schedule(10, 10)
        np.testing.assert_array_equal(pairs[:, 0], np.arange(10, 0, -1))

    def test_single_step_starts_at_T(self):
        """K=1 must make its only model call at t=T (x_T really is pure
        noise); (1, 0) would ask the model to read noise as nearly-clean."""
        pairs = ddim_schedule(1000, 1)
        np.testing.assert_array_equal(pairs, [[1000, 0]])

    def test_always_starts_at_T(self):
        for k in (2, 7, 100):
            assert ddim_schedule(1000, k)[0, 0] == 1000
            assert ddim_schedule(1000, k, "sqrt")[0, 0] == 1000

    def test_sqrt_spacing_denser_at_high_t(self):
        """sqrt spacing: step gaps grow toward low t (steps concentrated at
        high noise, where a weak score field errs most)."""
        ts = ddim_schedule(1000, 10, "sqrt")[:, 0]
        gaps = ts[:-1] - ts[1:]
        assert gaps[0] < gaps[-1], gaps
        assert ts[-1] >= 1 and ts[0] == 1000

    def test_exact_step_count_under_rounding_collisions(self):
        """Rounding collisions (small T, sqrt spacing) must be nudged, not
        dropped: exactly n_steps distinct, strictly decreasing timesteps."""
        for T, K, sp in [(20, 15, "sqrt"), (30, 30, "sqrt"), (50, 40, "uniform")]:
            pairs = ddim_schedule(T, K, sp)
            ts = pairs[:, 0]
            assert len(ts) == K, (T, K, sp)
            assert ts[0] == T and (ts[1:] < ts[:-1]).all() and ts[-1] >= 1

    def test_unknown_spacing_raises(self):
        with pytest.raises(ValueError, match="spacing"):
            ddim_schedule(1000, 10, "cosine")

    def test_invalid_counts(self):
        with pytest.raises(ValueError):
            ddim_schedule(10, 0)
        with pytest.raises(ValueError):
            ddim_schedule(10, 11)


class TestDDIMStep:
    def test_oracle_eps_recovers_x0_in_one_step(self):
        """x_t built by q_sample with known eps; the eta=0 DDIM jump
        t -> 0 must land exactly on x0."""
        schedule = Schedule.create(100)
        rng = np.random.default_rng(0)
        x0 = jnp.asarray(rng.normal(size=(2, 12, 3)).astype(np.float32))
        eps = jnp.asarray(rng.normal(size=(2, 12, 3)).astype(np.float32))
        for t in [100, 60, 7]:
            t_vec = jnp.full((2,), t, jnp.int32)
            xt = q_sample(schedule, x0, t_vec, eps)
            out = ddim_step_from_eps(
                schedule, xt, t_vec, jnp.zeros((2,), jnp.int32), eps,
                jnp.zeros_like(x0), 0.0,
            )
            np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-5)

    def test_matches_closed_form(self):
        schedule = Schedule.create(50)
        rng = np.random.default_rng(1)
        xt = rng.normal(size=(3, 8, 3)).astype(np.float32)
        eps = rng.normal(size=(3, 8, 3)).astype(np.float32)
        noise = rng.normal(size=(3, 8, 3)).astype(np.float32)
        abar = np.asarray(schedule.alphas_cumprod)
        for t, tp, eta in [(50, 37, 0.0), (37, 12, 0.7), (12, 1, 1.0)]:
            out = ddim_step_from_eps(
                schedule,
                jnp.asarray(xt),
                jnp.full((3,), t, jnp.int32),
                jnp.full((3,), tp, jnp.int32),
                jnp.asarray(eps),
                jnp.asarray(noise),
                eta,
            )
            a_t, a_p = abar[t], abar[tp]
            x0 = (xt - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
            sigma = eta * np.sqrt((1 - a_p) / (1 - a_t)) * np.sqrt(1 - a_t / a_p)
            ref = (
                np.sqrt(a_p) * x0
                + np.sqrt(1 - a_p - sigma**2) * eps
                + sigma * noise
            )
            np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


class TestDDIMSampling:
    def _setup(self):
        from tests.test_train import init_model, tiny_config

        config = tiny_config()
        feats_np = batchify([create_empty_features([24]) for _ in range(2)])
        model, params = init_model(config, feats_np)
        schedule = Schedule.create(config.diffusion["n_timestep"])
        return model, params, schedule, to_device(feats_np)

    def test_deterministic_and_masked(self):
        model, params, schedule, feats = self._setup()
        key = jax.random.PRNGKey(3)
        a = ddim_sample(
            model.apply, params, schedule, feats, key, 5, schedule.n_timestep
        )
        b = ddim_sample(
            model.apply, params, schedule, feats, key, 5, schedule.n_timestep
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert np.isfinite(np.asarray(a)).all()
        # Different segmentation, same trajectory.
        c = ddim_sample(
            model.apply, params, schedule, feats, key, 5, schedule.n_timestep,
            steps_per_dispatch=2,
        )
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-6)

    def test_eta_changes_output_via_noise(self):
        model, params, schedule, feats = self._setup()
        key = jax.random.PRNGKey(4)
        a = ddim_sample(
            model.apply, params, schedule, feats, key, 5, schedule.n_timestep, eta=0.0
        )
        b = ddim_sample(
            model.apply, params, schedule, feats, key, 5, schedule.n_timestep, eta=1.0
        )
        assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-4

    def test_per_step_eta_array_matches_scalar(self):
        """eta may be a per-model-call array; a constant array is
        bit-identical to the scalar, and segmentation slices it correctly."""
        model, params, schedule, feats = self._setup()
        key = jax.random.PRNGKey(7)
        args = (model.apply, params, schedule, feats, key, 5, schedule.n_timestep)
        a = ddim_sample(*args, eta=0.7)
        b = ddim_sample(*args, eta=jnp.full((5,), 0.7, jnp.float32))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        c = ddim_sample(
            *args, eta=jnp.full((5,), 0.7, jnp.float32), steps_per_dispatch=2
        )
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-6)

    def test_hybrid_eta_schedule(self):
        """eta_schedule_below: deterministic above switch_t, stochastic at or
        below — and the hybrid trajectory actually differs from both pure
        runs while agreeing with eta=0 up to the switch."""
        from genie2_tpu.sampling import eta_schedule_below

        model, params, schedule, feats = self._setup()
        T = schedule.n_timestep
        etas = eta_schedule_below(T, 5, switch_t=T // 2)
        ts = ddim_schedule(T, 5)[:, 0]
        np.testing.assert_array_equal(
            np.asarray(etas), (ts <= T // 2).astype(np.float32)
        )
        key = jax.random.PRNGKey(8)
        args = (model.apply, params, schedule, feats, key, 5, T)
        hybrid = ddim_sample(*args, eta=etas)
        pure0 = ddim_sample(*args, eta=0.0)
        pure1 = ddim_sample(*args, eta=1.0)
        assert np.isfinite(np.asarray(hybrid)).all()
        assert np.abs(np.asarray(hybrid) - np.asarray(pure0)).max() > 1e-5
        assert np.abs(np.asarray(hybrid) - np.asarray(pure1)).max() > 1e-5

    def test_fast_spacing_changes_trajectory(self):
        """The sampler-level spacing param is honored (different
        subsequence, different deterministic output)."""
        model, params, schedule, feats = self._setup()
        key = jax.random.PRNGKey(6)
        a = ddim_sample(
            model.apply, params, schedule, feats, key, 4, schedule.n_timestep,
            spacing="uniform",
        )
        b = ddim_sample(
            model.apply, params, schedule, feats, key, 4, schedule.n_timestep,
            spacing="sqrt",
        )
        assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-5

    def test_scale_tempers_injected_noise(self):
        """--scale (gamma) applies to the eta-noise exactly as in the
        ancestral loop: it changes eta>0 runs and is a no-op at eta=0."""
        model, params, schedule, feats = self._setup()
        key = jax.random.PRNGKey(5)
        args = (model.apply, params, schedule, feats, key, 5, schedule.n_timestep)
        a = ddim_sample(*args, eta=1.0, scale=1.0)
        b = ddim_sample(*args, eta=1.0, scale=0.3)
        assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-4
        c = ddim_sample(*args, eta=0.0, scale=1.0)
        d = ddim_sample(*args, eta=0.0, scale=0.3)
        np.testing.assert_array_equal(np.asarray(c), np.asarray(d))

    def test_trajectory_dump_param(self, tmp_path):
        """dump_trajectory_every writes xt snapshot PDBs in the reference's
        test/ fixture grammar from any ancestral sampler."""
        from tests.test_train import init_model, tiny_config
        from genie2_tpu.sampling import UnconditionalSampler

        config = tiny_config()
        feats_np = batchify([create_empty_features([24]) for _ in range(1)])
        model, params = init_model(config, feats_np)
        sampler = UnconditionalSampler(model, params, config)
        sampler.sample(
            {
                "scale": 0.6, "outdir": str(tmp_path), "num_samples": 1,
                "prefix": "24", "offset": 0, "length": 24, "seed": 0,
                "dump_trajectory_every": 4,
            }
        )
        import glob as _glob

        snaps = sorted(
            _glob.glob(str(tmp_path / "test" / "24_0" / "xt_predicted_test_*.pdb"))
        )
        n_t = config.diffusion["n_timestep"]
        assert len(snaps) == n_t // 4, snaps
        text = open(snaps[0]).read()
        assert text.startswith("ATOM")
        # Snapshots are trimmed to the real length, not the padding bucket.
        assert text.count("\n") == 24, text.count("\n")

    def test_trajectory_dump_rejects_solvers(self, tmp_path):
        """dump_trajectory_every + a K-step solver has no trajectory to
        snapshot — must raise, not silently skip the dumps."""
        from tests.test_train import init_model, tiny_config
        from genie2_tpu.sampling import UnconditionalSampler

        config = tiny_config()
        feats_np = batchify([create_empty_features([24]) for _ in range(1)])
        model, params = init_model(config, feats_np)
        sampler = UnconditionalSampler(model, params, config)
        base = {
            "scale": 0.6, "outdir": str(tmp_path), "num_samples": 1,
            "prefix": "24", "offset": 0, "length": 24, "seed": 0,
            "dump_trajectory_every": 4,
        }
        with pytest.raises(ValueError, match="dump_trajectory_every"):
            sampler.sample({**base, "ddim_steps": 4})
        with pytest.raises(ValueError, match="dump_trajectory_every"):
            sampler.sample({**base, "dpm_steps": 4})

    def test_sampler_cli_path(self, tmp_path):
        """UnconditionalSampler honors ddim_steps/ddim_eta params end-to-end."""
        from tests.test_train import init_model, tiny_config
        from genie2_tpu.sampling import UnconditionalSampler

        config = tiny_config()
        feats_np = batchify([create_empty_features([24]) for _ in range(2)])
        model, params = init_model(config, feats_np)
        sampler = UnconditionalSampler(model, params, config)
        out = sampler.sample(
            {
                "scale": 0.6,
                "outdir": str(tmp_path),
                "num_samples": 2,
                "prefix": "24",
                "offset": 0,
                "length": 24,
                "seed": 0,
                "ddim_steps": 4,
                "ddim_eta": 0.5,
            }
        )
        assert len(out) == 2
        pdb = (tmp_path / "pdbs" / "24_0.pdb").read_text()
        assert pdb.startswith("ATOM")
        assert np.isfinite(out[0]["atom_positions"]).all()
