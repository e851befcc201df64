"""Markdown report generator for a flagship-campaign workdir.

Turns the campaign driver's outputs (``campaign_summary.json``, the run's
``metrics.jsonl``, the quality-battery ``eval.json`` files, the continuity
line in ``campaign.log``) into the two artifacts we commit after a
campaign: a human-readable markdown report and the full loss curve as CSV.

Counterpart in the reference: the tensorboard event files under
/root/reference/runs/try1/version_*/ — binary, unversioned, and with no
quality battery attached. Here the whole record is plain text in git.

Usage:
    python tools/campaign_report.py WORKDIR [--out report.md]
                                    [--loss_csv loss_curve.csv]
"""

import argparse
import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from campaign_continuity import load_train_records

# Quality-battery columns, in display order (subset of eval_designs FIELDS).
_QUALITY_COLS = [
    "n_designs", "bond_mean", "bond_frac_ok", "clash_frac",
    "rg_norm", "helix_frac", "strand_frac", "coil_frac",
]
# Configuration keys worth echoing into the report header.
_CONFIG_KEYS = [
    "singleFeatureDimension", "pairFeatureDimension",
    "numPairTransformLayers", "numStructureLayers", "numTimesteps",
    "maximumNumResidues", "batchSize", "computeDtype", "learningRate",
    "emaDecay", "asyncCheckpoint",
]


def _read_config(workdir):
    path = os.path.join(workdir, "configuration")
    if not os.path.exists(path):
        return {}
    # Same line discipline as genie2_tpu/config.py: exactly-two-token
    # lines are key/value pairs, everything else is ignored.
    out = {}
    for line in open(path):
        parts = line.split()
        if len(parts) == 2:
            out[parts[0]] = parts[1]
    return out


def _continuity_line(workdir):
    """Last continuity-report JSON printed into campaign.log, if any."""
    path = os.path.join(workdir, "campaign.log")
    if not os.path.exists(path):
        return None
    found = None
    for line in open(path, errors="replace"):
        line = line.strip()
        if line.startswith("{") and '"preempted_at_step"' in line:
            try:
                found = json.loads(line)
            except json.JSONDecodeError:
                pass
    return found


def _downsample(rows, limit=16):
    """<= limit rows, evenly spaced, always keeping first and last."""
    if len(rows) <= limit:
        return rows
    idx = {round(i * (len(rows) - 1) / (limit - 1)) for i in range(limit)}
    return [rows[i] for i in sorted(idx)]


def _fmt(v):
    if isinstance(v, float):
        return f"{v:.4g}"
    return str(v)


def _load_summary_and_records(workdir):
    """(campaign_summary, train records) — resolves the summary's absolute
    version_dir relative to workdir when the workdir was relocated."""
    summary = json.load(open(os.path.join(workdir, "campaign_summary.json")))
    version_dir = summary["version_dir"]
    if not os.path.isdir(version_dir):
        version_dir = os.path.join(
            workdir, "runs", *version_dir.rstrip("/").split("/")[-2:]
        )
    return summary, load_train_records(version_dir)


def render_report(workdir):
    summary, recs = _load_summary_and_records(workdir)
    config = _read_config(workdir)
    lines = ["# Flagship campaign report", ""]

    if config:
        picked = [(k, config[k]) for k in _CONFIG_KEYS if k in config]
        lines += ["## Configuration", ""]
        lines += [f"- {k}: {v}" for k, v in picked] + [""]

    lines += ["## Training", ""]
    lines.append(f"- final step: {summary.get('final_step')}")
    lines.append(f"- final weighted_loss: {_fmt(summary.get('final_loss'))}")
    lines.append(f"- promoted epoch: {summary.get('promoted_epoch')}")
    rates = [r["residues_per_s"] for r in recs if "residues_per_s" in r]
    if rates:
        window = rates[-100:]
        lines.append(
            f"- throughput (last {len(window)} records): "
            f"{statistics.mean(window):.0f} residues/s"
        )
    cont = _continuity_line(workdir)
    if cont:
        lines.append(
            f"- preemption continuity: preempted at step "
            f"{cont['preempted_at_step']}, resumed through "
            f"{cont['resumed_through_step']}"
            + (
                f", {cont['hard_kill_replayed_steps']} replayed steps with "
                f"max loss delta {_fmt(cont['replay_max_loss_delta'])}"
                if "hard_kill_replayed_steps" in cont
                else ", no replays (graceful)"
            )
        )
    lines.append("")

    if recs:
        lines += ["### Loss curve (downsampled)", "",
                  "| step | weighted_loss |", "|---|---|"]
        lines += [
            f"| {r['step']} | {_fmt(r.get('weighted_loss'))} |"
            for r in _downsample(recs)
        ] + [""]

    quality = summary.get("quality", {})
    modes = [m for m in quality if m not in ("smc",
                                             "trajectory_vs_reference_fixtures")]
    if modes:
        lines += ["## Quality battery (eval_designs aggregates)", "",
                  "| mode | " + " | ".join(_QUALITY_COLS) + " |",
                  "|---|" + "---|" * len(_QUALITY_COLS)]
        for m in modes:
            agg = quality[m]
            lines.append(
                f"| {m} | "
                + " | ".join(_fmt(agg.get(c, "-")) for c in _QUALITY_COLS)
                + " |"
            )
        lines.append("")

    if "smc" in quality:
        s = quality["smc"]
        lines += ["## SMC scaffold run", "",
                  f"- ESS min/mean: {_fmt(s['ess_min'])} / "
                  f"{_fmt(s['ess_mean'])}",
                  f"- resampling events: {s['resamples']}", ""]

    if "trajectory_vs_reference_fixtures" in quality:
        t = quality["trajectory_vs_reference_fixtures"]
        lines += ["## Trajectory statistics vs the real Genie-2 fixtures", ""]
        lines += [f"- {k}: {_fmt(v)}" for k, v in t.items()] + [""]

    return "\n".join(lines)


def write_loss_csv(workdir, path):
    _, recs = _load_summary_and_records(workdir)
    with open(path, "w") as f:
        f.write("step,weighted_loss,residues_per_s\n")
        for r in recs:
            f.write(
                f"{r['step']},{r.get('weighted_loss', '')},"
                f"{r.get('residues_per_s', '')}\n"
            )
    return len(recs)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("workdir", help="Campaign workdir (flagship_campaign.sh)")
    parser.add_argument("--out", default=None, help="Write markdown here")
    parser.add_argument("--loss_csv", default=None,
                        help="Also dump the full loss curve as CSV")
    args = parser.parse_args()
    report = render_report(args.workdir)
    if args.out:
        with open(args.out, "w") as f:
            f.write(report + "\n")
        print(f"wrote {args.out}", flush=True)
    else:
        print(report, flush=True)
    if args.loss_csv:
        n = write_loss_csv(args.workdir, args.loss_csv)
        print(f"wrote {args.loss_csv} ({n} records)", flush=True)


if __name__ == "__main__":
    main()
