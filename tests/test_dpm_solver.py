"""DPM-Solver++(2M) accelerated sampler tests (no reference counterpart).

Correctness anchors:
  * with an oracle eps-model (the exact eps used by q_sample), every
    x0-prediction is exact, so the whole multistep trajectory tracks the
    true (x0, eps) diffusion path and the K-step run recovers x0 to float
    precision for any K — the defining property of exponential-integrator
    solvers on an exact model;
  * the first update (no history) equals the eta=0 DDIM step exactly;
  * determinism / segmentation invariance / mask / CLI-path checks.
"""

import jax
import jax.numpy as jnp
import numpy as np

from genie2_tpu.diffusion import Schedule, ddim_step_from_eps, q_sample
from genie2_tpu.features import batchify, create_empty_features, to_device
from genie2_tpu.sampling import ddim_schedule, dpm_solver_sample
from genie2_tpu.sampling.ddpm import init_translations
from genie2_tpu.sampling.dpm_solver import _dpm_segment


def _oracle(schedule, x0_target):
    """An eps-model that is exact along the q_sample path from x0_target:
    eps(x_t, t) = (x_t - sqrt(abar_t) x0) / sqrt(1 - abar_t)."""

    def apply_fn(params, ts, t_vec, features):
        abar = schedule.alphas_cumprod[t_vec][:, None, None]
        eps = (ts.trans - jnp.sqrt(abar) * x0_target) / jnp.sqrt(1.0 - abar)
        return {"z": eps}

    return apply_fn


class TestOracleRecovery:
    def test_recovers_x0_any_step_count(self):
        schedule = Schedule.create(100)
        rng = np.random.default_rng(0)
        x0 = jnp.asarray(rng.normal(size=(2, 12, 3)).astype(np.float32))
        feats = to_device(batchify([create_empty_features([12]) for _ in range(2)]))
        apply_fn = _oracle(schedule, x0)
        for k in (1, 2, 5, 20):
            out = dpm_solver_sample(
                apply_fn, None, schedule, feats, jax.random.PRNGKey(1), k, 100
            )
            np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=2e-4)


class TestFirstStepIsDDIM:
    def test_single_segment_first_update(self):
        """One (t, t_prev) pair with no history must equal eta=0 DDIM."""
        schedule = Schedule.create(50)
        rng = np.random.default_rng(1)
        x0 = jnp.asarray(rng.normal(size=(2, 10, 3)).astype(np.float32))
        feats = to_device(batchify([create_empty_features([10]) for _ in range(2)]))
        apply_fn = _oracle(schedule, x0)

        t, tp = 50, 23
        t_vec = jnp.full((2,), t, jnp.int32)
        eps_true = jnp.asarray(rng.normal(size=(2, 10, 3)).astype(np.float32))
        xt = q_sample(schedule, x0, t_vec, eps_true)

        carry = (xt, jnp.zeros_like(xt), jnp.float32(0.0), jnp.bool_(False))
        pairs = jnp.asarray([[t, tp]])
        got = _dpm_segment(apply_fn, None, schedule, feats, carry, pairs)[0]

        eps_pred = apply_fn(None, type("T", (), {"trans": xt}), t_vec, feats)["z"]
        want = ddim_step_from_eps(
            schedule, xt, t_vec, jnp.full((2,), tp, jnp.int32), eps_pred,
            jnp.zeros_like(xt), 0.0,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


class TestDPMSampling:
    def _setup(self):
        from tests.test_train import init_model, tiny_config

        config = tiny_config()
        feats_np = batchify([create_empty_features([24]) for _ in range(2)])
        model, params = init_model(config, feats_np)
        schedule = Schedule.create(config.diffusion["n_timestep"])
        return model, params, schedule, to_device(feats_np)

    def test_deterministic_and_segmentation_invariant(self):
        model, params, schedule, feats = self._setup()
        key = jax.random.PRNGKey(3)
        a = dpm_solver_sample(
            model.apply, params, schedule, feats, key, 5, schedule.n_timestep
        )
        b = dpm_solver_sample(
            model.apply, params, schedule, feats, key, 5, schedule.n_timestep
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert np.isfinite(np.asarray(a)).all()
        # The multistep history (prev_x0, prev_lambda) must survive
        # dispatch-segment boundaries.
        c = dpm_solver_sample(
            model.apply, params, schedule, feats, key, 5, schedule.n_timestep,
            steps_per_dispatch=2,
        )
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-6)

    def test_differs_from_ddim_with_history(self):
        """Second order must actually kick in: K >= 3 differs from DDIM."""
        from genie2_tpu.sampling import ddim_sample

        model, params, schedule, feats = self._setup()
        key = jax.random.PRNGKey(4)
        dpm = dpm_solver_sample(
            model.apply, params, schedule, feats, key, 5, schedule.n_timestep
        )
        ddim = ddim_sample(
            model.apply, params, schedule, feats, key, 5, schedule.n_timestep
        )
        assert np.abs(np.asarray(dpm) - np.asarray(ddim)).max() > 1e-5

    def test_sampler_cli_path(self, tmp_path):
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
                "dpm_steps": 4,
            }
        )
        assert len(out) == 2
        assert (tmp_path / "pdbs" / "24_0.pdb").read_text().startswith("ATOM")
        assert np.isfinite(out[0]["atom_positions"]).all()

    def test_mutually_exclusive_with_ddim(self, tmp_path):
        import pytest
        from tests.test_train import init_model, tiny_config
        from genie2_tpu.sampling import UnconditionalSampler

        config = tiny_config()
        feats_np = batchify([create_empty_features([24])])
        model, params = init_model(config, feats_np)
        sampler = UnconditionalSampler(model, params, config)
        with pytest.raises(ValueError, match="mutually exclusive"):
            sampler.sample(
                {
                    "scale": 0.6, "outdir": str(tmp_path), "num_samples": 1,
                    "prefix": "24", "offset": 0, "length": 24, "seed": 0,
                    "dpm_steps": 4, "ddim_steps": 4,
                }
            )

    def test_eta_switch_requires_ddim(self, tmp_path):
        # The hybrid stochasticity schedule only exists on the DDIM path;
        # silently ignoring the flag on dpm/ancestral runs would hand the
        # user a fully deterministic run they did not ask for.
        import pytest
        from tests.test_train import init_model, tiny_config
        from genie2_tpu.sampling import UnconditionalSampler

        config = tiny_config()
        feats_np = batchify([create_empty_features([24])])
        model, params = init_model(config, feats_np)
        sampler = UnconditionalSampler(model, params, config)
        base = {
            "scale": 0.6, "outdir": str(tmp_path), "num_samples": 1,
            "prefix": "24", "offset": 0, "length": 24, "seed": 0,
            "ddim_eta_switch_t": 2,
        }
        with pytest.raises(ValueError, match="requires ddim_steps"):
            sampler.sample({**base, "dpm_steps": 4})
        with pytest.raises(ValueError, match="requires ddim_steps"):
            sampler.sample(base)
