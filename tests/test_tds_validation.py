"""TDS scientific-validation e2e test (VERDICT Next #8).

Runs the full loop in tools/tds_validation.py: self-train a tiny model on
synthetic motif-planted structures, run the bench_tds.sh-shaped seeded SMC
workload, and assert the science:

  (a) placement recovery beats the untwisted (plain ancestral) control,
  (b) best-placement motif RMSD of the x0 prediction improves monotonically
      over the reverse trajectory,
  (c) benchmark manifests are emitted in the reference's for_benchmark
      format (results/test002/for_benchmark/06_6E6R/*.csv).

Slow-marked: trains 150 steps + samples 3 trajectories on CPU (~8 min cold,
much less with tests/.jax_test_cache).
"""

import importlib.util
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_harness():
    spec = importlib.util.spec_from_file_location(
        "tds_validation", os.path.join(REPO, "tools", "tds_validation.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_tds_beats_untwisted_control(tmp_path):
    harness = _load_harness()
    result = harness.run_validation(
        str(tmp_path), n_train_steps=150, n_seeds=2, n_particles=4
    )

    # (a) Placement recovery: twisted sampling must recover the planted
    # motif strictly better than the unconditional control.
    assert result["tds_recovery"] > result["control_recovery"]
    assert result["tds_rmsd_mean"] < 0.5 * result["control_rmsd_mean"]

    # (b) Trajectory improvement: best-placement RMSD of x0 decreases over
    # the reverse trajectory (descending step); allow small local noise but
    # require a strong overall decrease.
    traj = {int(k): v for k, v in result["trajectory_rmsd"].items()}
    steps = sorted(traj, reverse=True)  # reverse-time order
    rmsds = [traj[s] for s in steps]
    for a, b in zip(rmsds, rmsds[1:]):
        assert b <= a + 0.15, (steps, rmsds)
    assert rmsds[-1] < 0.25 * rmsds[0]

    # (c) Manifests in the reference's format.
    rundir = tmp_path / "raw" / "m0_r1"
    scaffold = (rundir / "scaffold_info.csv").read_text().splitlines()
    assert scaffold[0] == "sample_num,motif_placements"
    assert len(scaffold) == 1 + 4
    # contig alternates scaffold lengths and segment letters, e.g. 8/A/34.
    placement_parts = scaffold[1].split(",")[1].split("/")
    assert "A" in placement_parts
    motif_info = (rundir / "motif_info.csv").read_text().splitlines()
    assert motif_info[0] == "pdb_name,sample_num,contig,redesign_positions,segment_order"
    assert ",A1-6," in motif_info[1]
