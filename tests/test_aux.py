"""Tests for auxiliary components: FK particle filter, secondary structure,
EMA, x-start variance table."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genie2_tpu.sampling.feynman_kac import smc_feynman_kac
from genie2_tpu.sampling.twisting import xstart_variance
from genie2_tpu.features.secstruct import (
    assign_secstruct,
    helix_statistic,
    sec_struct_frac,
)
from genie2_tpu.utils.ema import ema_init, ema_read, ema_update


class TestFeynmanKac:
    def test_gaussian_targeting(self):
        """Particles proposed from N(0,1) random walks, potential favoring
        x near 3: the filter population must shift toward 3."""
        P = 64

        def M(key, particles, extra, t):
            return particles + 0.3 * jax.random.normal(key, particles.shape), extra

        def G(new, old, extra, t):
            return -0.5 * (new[:, 0] - 3.0) ** 2

        init = jnp.zeros((P, 1))
        result = smc_feynman_kac(
            M, G, init, None, jax.random.PRNGKey(0), n_steps=50, n_particles=P
        )
        mean = float(jnp.mean(result.particles))
        assert 1.5 < mean < 4.5, mean
        assert result.ess_trace.shape == (50,)
        assert bool(result.resampled_trace.any())

    def test_no_potential_no_resample(self):
        P = 8

        def M(key, particles, extra, t):
            return particles, extra

        def G(new, old, extra, t):
            return jnp.zeros(P)

        result = smc_feynman_kac(
            M, G, jnp.zeros((P, 2)), None, jax.random.PRNGKey(1), 10, P
        )
        assert not bool(result.resampled_trace.any())
        np.testing.assert_allclose(np.asarray(result.ess_trace), P, rtol=1e-5)

    def test_segmentation_invariant(self):
        """steps_per_dispatch (watchdog segmentation) must not change any
        output: particles, weights, and traces identical to one dispatch."""
        P = 16

        def M(key, particles, extra, t):
            return particles + 0.3 * jax.random.normal(key, particles.shape), extra

        def G(new, old, extra, t):
            return -0.5 * (new[:, 0] - 3.0) ** 2

        init = jnp.zeros((P, 1))
        key = jax.random.PRNGKey(7)
        whole = smc_feynman_kac(M, G, init, None, key, 50, P)
        seg = smc_feynman_kac(M, G, init, None, key, 50, P, steps_per_dispatch=7)
        np.testing.assert_array_equal(np.asarray(whole.particles), np.asarray(seg.particles))
        np.testing.assert_array_equal(np.asarray(whole.log_weights), np.asarray(seg.log_weights))
        np.testing.assert_array_equal(np.asarray(whole.ess_trace), np.asarray(seg.ess_trace))
        np.testing.assert_array_equal(
            np.asarray(whole.resampled_trace), np.asarray(seg.resampled_trace)
        )


class TestBenchDiagnosis:
    def test_simulated_slow_capture_flags_itself(self):
        """The round-2 driver capture (100.6 ms/step vs 3.62 expected) must
        flag degraded_environment; a healthy capture must not."""
        import importlib.util
        import os

        spec = importlib.util.spec_from_file_location(
            "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
        )
        bench = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(bench)

        expected, degraded = bench.diagnose_degraded(100.61, 256, 1, "bf16")
        assert expected == 3.62 and degraded
        expected, degraded = bench.diagnose_degraded(3.7, 256, 1, "bf16")
        assert not degraded
        # Unknown config: no expectation, never flags.
        expected, degraded = bench.diagnose_degraded(1e9, 123, 7, "bf16")
        assert expected is None and not degraded

    def test_partial_degradation_flags_probes(self):
        """The official BENCH_r04 session (dispatch 46.9 ms vs healthy
        23.5, matmul 73.9 TF/s vs 182.5) passed the headline check but was
        partially degraded — the probe diagnosis must catch exactly that
        (VERDICT r4 Weak #4), and must stay quiet on the healthy session."""
        import importlib.util
        import os

        spec = importlib.util.spec_from_file_location(
            "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
        )
        bench = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(bench)

        # A degraded session (the r4 official capture was dispatch 46.9,
        # matmul at ~40% of healthy on the old probe scale):
        bad = bench.diagnose_probes(46.86, 60.0)
        assert len(bad) == 1  # dispatch 46.86 < 2x23.5 -> only matmul flags
        assert "matmul" in bad[0]
        bad = bench.diagnose_probes(47.1, 60.0)
        assert len(bad) == 2
        # Healthy round-5 values: clean.
        assert bench.diagnose_probes(23.45, 144.0) == []
        assert bench.diagnose_probes(26.63, 150.0) == []

    @staticmethod
    def _assert_one_degraded_record(proc):
        import json

        assert proc.returncode == 0, proc.stderr[-2000:]
        lines = [l for l in proc.stdout.strip().splitlines() if l.strip()]
        assert len(lines) == 1, proc.stdout
        record = json.loads(lines[0])
        assert record["degraded_environment"] is True
        assert record["value"] == 0.0
        assert "unit" in record and "vs_baseline" in record
        assert "error" in record["extra"]
        return record

    def test_crash_emits_parseable_degraded_record(self):
        """ANY exception escaping main() must still produce the one-line
        JSON record with degraded_environment=true and rc=0 (BENCH_r03 was
        `parsed: null` because the tunnel-outage RuntimeError escaped as a
        bare traceback with rc=1). A malformed env knob crashes main()
        deterministically, before any backend touch."""
        import os
        import subprocess
        import sys

        env = dict(os.environ)
        env["BENCH_LENGTH"] = "not_an_int"
        repo_root = os.path.join(os.path.dirname(__file__), "..")
        proc = subprocess.run(
            [sys.executable, os.path.join(repo_root, "bench.py")],
            capture_output=True,
            text=True,
            env=env,
            timeout=240,
        )
        record = self._assert_one_degraded_record(proc)
        assert "ValueError" in record["extra"]["error"]

    def test_unreachable_backend_emits_parseable_degraded_record(self):
        """Backend-init failure (the actual BENCH_r03 mode). On this image
        the axon plugin registers via sitecustomize regardless of
        JAX_PLATFORMS; with the tunnel dead init HANGS (watchdog path), and
        with it alive the bogus platform name raises at first use
        (try/except path). Either way: one parseable degraded record, rc=0."""
        import os
        import subprocess
        import sys

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "no_such_backend"
        env["BENCH_TIMEOUT_S"] = "90"
        repo_root = os.path.join(os.path.dirname(__file__), "..")
        proc = subprocess.run(
            [sys.executable, os.path.join(repo_root, "bench.py")],
            capture_output=True,
            text=True,
            env=env,
            timeout=300,
        )
        self._assert_one_degraded_record(proc)


class TestManifestLabels:
    def test_many_segment_labels_distinct(self):
        from genie2_tpu.sampling.manifest import _segment_letters

        labels = _segment_letters(60)
        assert len(labels) == 60 and len(set(labels)) == 60
        assert labels[:2] == ["A", "B"] and labels[25] == "Z"
        assert labels[26] == "AA" and labels[27] == "AB"


def ideal_helix(n):
    """Ideal alpha-helix CA trace: radius 2.3 A, rise 1.5 A, 100 deg/res."""
    t = np.arange(n) * np.radians(100.0)
    return np.stack([2.3 * np.cos(t), 2.3 * np.sin(t), 1.5 * np.arange(n)], axis=-1)


def ideal_strand(n):
    """Extended beta-strand-like zigzag, ~3.4 A rise."""
    x = np.arange(n) * 3.4
    y = np.where(np.arange(n) % 2 == 0, 0.0, 1.0)
    return np.stack([x, y, np.zeros(n)], axis=-1)


class TestSecStruct:
    def test_helix_detected(self):
        h, s, c = sec_struct_frac(ideal_helix(30))
        assert h > 0.6, (h, s, c)
        assert helix_statistic(ideal_helix(30)) == 1.0

    def test_strand_detected(self):
        h, s, c = sec_struct_frac(ideal_strand(20))
        assert s > 0.5, (h, s, c)
        assert h < 0.2

    def test_random_coil_mostly_coil(self):
        rng = np.random.default_rng(0)
        coords = np.cumsum(rng.normal(size=(40, 3)) * 2.5, axis=0)
        h, s, c = sec_struct_frac(coords)
        assert c > 0.5, (h, s, c)

    def test_short_chain(self):
        assert assign_secstruct(np.zeros((3, 3))).tolist() == ["c"] * 3


class TestEvalDesigns:
    """tools/eval_designs.py — the native quick-eval the reference defers
    to an external repo for."""

    def _write_pdb(self, path, coords):
        from genie2_tpu.features import create_empty_features, save_features_to_pdb

        f = create_empty_features([len(coords)])
        f["atom_positions"] = np.asarray(coords, np.float32)
        f["aatype"][:, 0] = 1
        save_features_to_pdb(f, str(path))

    def _harness(self):
        import importlib.util
        import os

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        spec = importlib.util.spec_from_file_location(
            "eval_designs", os.path.join(repo, "tools", "eval_designs.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_stats_on_ideal_helix_and_strand(self, tmp_path):
        ev = self._harness()
        self._write_pdb(tmp_path / "h.pdb", ideal_helix(30))
        self._write_pdb(tmp_path / "s.pdb", ideal_strand(30))
        rows = {r["file"]: r for r in ev.evaluate_dir(str(tmp_path))}
        h, s = rows["h.pdb"], rows["s.pdb"]
        assert h["helix_frac"] > 0.6 and h["strand_frac"] < 0.2
        assert s["strand_frac"] > 0.5
        # Ideal helix CA spacing is ~3.8-4.1 A; strand zigzag ~3.5 A.
        assert 3.0 < h["bond_mean"] < 4.5
        assert h["bond_frac_ok"] == 1.0
        assert h["clash_frac"] < 0.2  # helix i,i+3/i+4 are ~5-6 A apart
        assert s["clash_frac"] == 0.0
        assert s["rg"] > h["rg"]  # extended strand is less compact

    def test_empty_dir_raises(self, tmp_path):
        ev = self._harness()
        with pytest.raises(FileNotFoundError):
            ev.evaluate_dir(str(tmp_path))


class TestEMA:
    def test_converges_to_constant(self):
        state = ema_init(jnp.zeros(3))
        x = jnp.array([1.0, 2.0, 3.0])
        for _ in range(200):
            state = ema_update(state, x, decay=0.9)
        np.testing.assert_allclose(np.asarray(ema_read(state, 0.9)), np.asarray(x), rtol=1e-3)


class TestXstartVariance:
    def test_table(self):
        abar = jnp.float32(0.5)
        sigmasq = 1.0
        assert np.isclose(float(xstart_variance(abar, var_type=1)), sigmasq)
        assert np.isclose(float(xstart_variance(abar, var_type=2)), 0.5)
        assert np.isclose(
            float(xstart_variance(abar, var_type=5)), 0.3 / 1.3, rtol=1e-5
        )
        assert np.isclose(
            float(xstart_variance(abar, var_type=4, beta_t=0.1)),
            0.1 / np.sqrt(0.5),
            rtol=1e-5,
        )
        with pytest.raises(ValueError):
            xstart_variance(abar, var_type=3)


class TestCampaignContinuity:
    """tools/campaign_continuity.py — the flagship campaign's resume
    verifier (graceful SIGTERM preemption AND hard-kill replay; the
    reference's epoch-granular Lightning checkpoints keep no step-level
    resume evidence at all)."""

    @staticmethod
    def _checker():
        import importlib.util
        import os

        repo = os.path.join(os.path.dirname(__file__), "..")
        spec = importlib.util.spec_from_file_location(
            "campaign_continuity",
            os.path.join(repo, "tools", "campaign_continuity.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod.check_continuity

    @staticmethod
    def _write(tmp_path, rows):
        import json

        with open(tmp_path / "metrics.jsonl", "w") as f:
            for step, loss in rows:
                f.write(
                    json.dumps(
                        {"step": step, "prefix": "train",
                         "weighted_loss": loss}
                    )
                    + "\n"
                )
        return str(tmp_path)

    def test_graceful_preemption_clean_curve(self, tmp_path):
        check = self._checker()
        v = self._write(
            tmp_path, [(50, 2.0), (100, 1.5), (150, 1.2), (200, 1.0)]
        )
        out = check(v, 100)
        assert out["resumed_through_step"] == 200
        assert "hard_kill_replayed_steps" not in out

    def test_hard_kill_replay_reproduces_losses(self, tmp_path):
        check = self._checker()
        rows = [(50, 2.0), (100, 1.5), (150, 1.2),
                (100, 1.5), (150, 1.2), (200, 1.0)]
        out = check(self._write(tmp_path, rows), 150)
        assert out["hard_kill_replayed_steps"] == 2
        assert out["replay_max_loss_delta"] == 0.0

    def test_replay_loss_mismatch_fails(self, tmp_path):
        check = self._checker()
        rows = [(50, 2.0), (100, 1.5), (150, 1.2),
                (100, 1.9), (150, 1.2), (200, 1.0)]
        with pytest.raises(AssertionError, match="reproduce"):
            check(self._write(tmp_path, rows), 150)

    def test_backjump_to_unseen_step_fails(self, tmp_path):
        check = self._checker()
        rows = [(50, 2.0), (150, 1.2), (120, 1.4), (200, 1.0)]
        with pytest.raises(AssertionError, match="backwards"):
            check(self._write(tmp_path, rows), 150)

    def test_no_progress_after_preemption_fails(self, tmp_path):
        check = self._checker()
        with pytest.raises(AssertionError, match="no steps after"):
            check(self._write(tmp_path, [(50, 2.0), (100, 1.5)]), 100)

    def test_loss_jump_after_resume_fails(self, tmp_path):
        check = self._checker()
        rows = [(50, 0.5), (100, 0.5), (150, 9.0), (200, 9.0)]
        with pytest.raises(AssertionError, match="optimizer"):
            check(self._write(tmp_path, rows), 100)


class TestCampaignReport:
    """tools/campaign_report.py — renders a campaign workdir into the
    markdown + loss-CSV artifacts committed after a flagship run."""

    @staticmethod
    def _module():
        import importlib.util
        import os

        repo = os.path.join(os.path.dirname(__file__), "..")
        spec = importlib.util.spec_from_file_location(
            "campaign_report",
            os.path.join(repo, "tools", "campaign_report.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    @staticmethod
    def _make_workdir(tmp_path, version_dir_in_summary=None):
        import json

        v = tmp_path / "runs" / "flagship" / "version_0"
        v.mkdir(parents=True)
        with open(v / "metrics.jsonl", "w") as f:
            for i in range(1, 41):
                f.write(json.dumps({
                    "step": 50 * i, "prefix": "train",
                    "weighted_loss": 2.0 / i, "residues_per_s": 2000.0 + i,
                }) + "\n")
        summary = {
            "version_dir": version_dir_in_summary or str(v),
            "promoted_epoch": 3, "final_step": 2000, "final_loss": 0.05,
            "quality": {
                "ddpm": {"n_designs": 8, "bond_mean": 3.79,
                         "bond_frac_ok": 0.98, "clash_frac": 0.01,
                         "rg_norm": 2.2, "helix_frac": 0.25,
                         "strand_frac": 0.1, "coil_frac": 0.65},
                "ddim50": {"n_designs": 8, "bond_mean": 3.81,
                           "bond_frac_ok": 0.97, "clash_frac": 0.02,
                           "rg_norm": 2.3, "helix_frac": 0.22,
                           "strand_frac": 0.1, "coil_frac": 0.68},
                "smc": {"ess_min": 1.5, "ess_mean": 3.1, "resamples": 42},
                "trajectory_vs_reference_fixtures": {
                    "z_std_median": 0.91, "z_unit_scale_ok": True,
                    "n_steps_dumped": 20},
            },
        }
        (tmp_path / "campaign_summary.json").write_text(json.dumps(summary))
        (tmp_path / "configuration").write_text(
            "name flagship\nsingleFeatureDimension 384\ncomputeDtype bf16\n"
        )
        (tmp_path / "campaign.log").write_text(
            "PHASE_B_EXIT=124\n"
            + json.dumps({"preempted_at_step": 900,
                          "resumed_through_step": 2000,
                          "loss_window_post_resume": 0.06}) + "\n"
            + "CONTINUITY_EXIT=0\n"
        )
        return str(tmp_path)

    def test_report_sections_and_values(self, tmp_path):
        mod = self._module()
        report = mod.render_report(self._make_workdir(tmp_path))
        assert "final step: 2000" in report
        assert "singleFeatureDimension: 384" in report
        assert "| ddpm | 8 | 3.79 |" in report
        assert "ESS min/mean: 1.5 / 3.1" in report
        assert "z_std_median: 0.91" in report
        assert "preempted at step 900" in report
        assert "no replays (graceful)" in report
        # downsampled loss table keeps endpoints
        assert "| 50 | 2 |" in report and "| 2000 | 0.05 |" in report
        # and stays within the row budget
        assert report.count("| weighted_loss |") == 1
        loss_rows = [l for l in report.splitlines()
                     if l.startswith("| ") and l.split()[1].isdigit()]
        assert len(loss_rows) <= 16

    def test_relocated_workdir_resolves_version_dir(self, tmp_path):
        # summary recorded an absolute path from a previous machine/home
        mod = self._module()
        d = self._make_workdir(
            tmp_path, version_dir_in_summary="/gone/runs/flagship/version_0"
        )
        report = mod.render_report(d)
        assert "| 2000 | 0.05 |" in report  # metrics found via relocation

    def test_loss_csv_full_resolution(self, tmp_path):
        mod = self._module()
        d = self._make_workdir(tmp_path)
        out = tmp_path / "loss.csv"
        n = mod.write_loss_csv(d, str(out))
        lines = out.read_text().splitlines()
        assert n == 40 and len(lines) == 41
        assert lines[0] == "step,weighted_loss,residues_per_s"
        assert lines[1].startswith("50,2.0,")
