"""Compare diffusion trajectory dumps against the real trained-run fixtures.

The reference ships 19 paired x̂₀/xₜ dumps from an actual trained Genie-2
TDS run (/root/reference/test/, writer smc_sampler_new_new.py:802-812);
tests/test_reference_trajectory.py validates OUR schedule tables against
them. This tool runs the same statistics over dumps OUR samplers write
(--dump_trajectory_every produces the identical file grammar), so a
self-trained model's trajectory can be compared to the real Genie-2 run
at matched steps — the largest achievable fraction of the BASELINE
"reproducing the test/ trajectory PDBs" gate without the LFS-blocked
weights:

  * recovered-ẑ std per step: (xₜ − √ᾱₜ·x̂₀)/√(1−ᾱₜ) must be O(1) —
    validates the dump semantics + schedule end-to-end on a REAL run of
    OUR stack (not just the unit-level tables);
  * Var(xₜ) / (ᾱₜ·Var(x̂₀) + 1−ᾱₜ): the forward-marginal mixture ratio;
  * x̂₀ CA-CA bond mean and Rg per step: the protein-likeness envelope
    the reference's own run traces.

Usage: python tools/compare_trajectories.py DUMP_DIR [T=1000] [--json OUT]
       DUMP_DIR holds x0_predicted_test_{t}.pdb / xt_predicted_test_{t}.pdb
       (a sampler run with --dump_trajectory_every, or /root/reference/test).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def load_ca(path):
    rows = []
    with open(path) as f:
        for line in f:
            if line.startswith("ATOM"):
                rows.append(
                    [float(line[30:38]), float(line[38:46]), float(line[46:54])]
                )
    return np.asarray(rows, dtype=np.float64)


def analyze(dump_dir: str, n_timestep: int):
    import jax

    if os.environ.get("GENIE2_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["GENIE2_PLATFORM"])
    from genie2_tpu.diffusion import Schedule

    s = Schedule.create(n_timestep)
    sac = np.asarray(s.sqrt_alphas_cumprod, np.float64)
    som = np.asarray(s.sqrt_one_minus_alphas_cumprod, np.float64)

    steps = sorted(
        int(m.group(1))
        for p in glob.glob(os.path.join(dump_dir, "x0_predicted_test_*.pdb"))
        if (m := re.search(r"_(\d+)\.pdb$", p))
    )
    rows = []
    for t in steps:
        x0 = load_ca(os.path.join(dump_dir, f"x0_predicted_test_{t}.pdb"))
        xt_path = os.path.join(dump_dir, f"xt_predicted_test_{t}.pdb")
        if not os.path.exists(xt_path) or not len(x0):
            continue
        xt = load_ca(xt_path)
        z = (xt - sac[t] * x0) / som[t]
        mix = (sac[t] ** 2) * x0.var() + som[t] ** 2
        rows.append(
            {
                "t": t,
                "z_std": round(float(z.std()), 4),
                "var_ratio": round(float(xt.var() / mix), 4),
                "x0_bond": round(
                    float(np.linalg.norm(np.diff(x0, axis=0), axis=1).mean()), 3
                ),
                "x0_rg": round(
                    float(np.sqrt(((x0 - x0.mean(0)) ** 2).sum(1).mean())), 2
                ),
            }
        )
    return rows


def main():
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("dump_dir", help="Directory of paired x0/xt dumps")
    parser.add_argument("n_timestep", nargs="?", type=int, default=1000)
    parser.add_argument("--json", dest="json_out", default=None,
                        help="Also write the full summary as JSON")
    ns = parser.parse_args()
    dump_dir, n_timestep, json_out = ns.dump_dir, ns.n_timestep, ns.json_out
    rows = analyze(dump_dir, n_timestep)
    if not rows:
        print(json.dumps({"error": f"no paired dumps under {dump_dir}"}))
        sys.exit(1)

    z_stds = [r["z_std"] for r in rows]
    summary = {
        "dump_dir": dump_dir,
        "n_timestep": n_timestep,
        "n_steps_dumped": len(rows),
        "z_std_median": round(float(np.median(z_stds)), 4),
        "z_std_range": [round(min(z_stds), 4), round(max(z_stds), 4)],
        # The trained reference run measures 0.83-0.92 in distribution;
        # O(1) across the board is the sanity gate for any run.
        "z_unit_scale_ok": bool(0.3 <= np.median(z_stds) <= 3.0),
        "per_step": rows,
    }
    for r in rows:
        print(
            f"t={r['t']:4d} z_std={r['z_std']:.3f} var_ratio={r['var_ratio']:.2f} "
            f"x0_bond={r['x0_bond']:.2f} x0_rg={r['x0_rg']:.1f}",
            flush=True,
        )
    print(json.dumps({k: v for k, v in summary.items() if k != "per_step"}))
    if json_out is not None:
        with open(json_out, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
