"""Structural quality report over a directory of generated backbone PDBs.

The reference delegates all evaluation (designability/diversity/novelty) to
the external insilico_design_pipeline repo (README.md:3) and ships nothing
runnable. This tool makes the framework self-contained for the quick
physical sanity checks a practitioner runs first, entirely from the CA
trace:

  * CA-CA bond geometry: mean/std of consecutive distances (ideal ~3.8 A)
    and the fraction inside [3.0, 4.5] A;
  * steric clashes: fraction of non-adjacent residue pairs closer than 4 A
    (|i-j| >= 3);
  * compactness: radius of gyration and its length-normalized form
    Rg / N^0.4 (globular proteins cluster near ~2.2 in these units);
  * secondary structure: P-SEA helix/strand/coil fractions
    (features/secstruct.py).

Usage:
    python tools/eval_designs.py OUTDIR [--csv report.csv]

OUTDIR is scanned recursively for *.pdb (the samplers' pdbs/ layouts all
match). Prints one summary line per file plus aggregate means, and writes
an optional CSV.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def ca_chains(filepath: str):
    """Per-chain CA coordinate arrays in file order."""
    from genie2_tpu.features.pdb import parse_pdb

    _, chains = parse_pdb(filepath)
    return [np.asarray(c, np.float64) for c in chains]


def design_stats(chains) -> dict:
    """Covalent statistics (bonds, SSE) are per-chain — a chain junction is
    not a bond; clashes and Rg are over the whole complex."""
    if isinstance(chains, np.ndarray):
        chains = [chains]
    coords = np.concatenate(chains, axis=0)
    n = len(coords)
    d = np.concatenate(
        [np.linalg.norm(c[1:] - c[:-1], axis=-1) for c in chains if len(c) > 1]
        or [np.zeros(0)]
    )
    pair = np.linalg.norm(coords[:, None] - coords[None, :], axis=-1)
    i, j = np.triu_indices(n, k=3)
    clashes = float((pair[i, j] < 4.0).mean()) if len(i) else 0.0
    rg = float(np.sqrt(((coords - coords.mean(0)) ** 2).sum(-1).mean()))

    from genie2_tpu.features.secstruct import sec_struct_frac

    hec = np.array([sec_struct_frac(c) for c in chains], np.float64)
    weights = np.array([len(c) for c in chains], np.float64)
    helix, strand, coil = (hec * weights[:, None]).sum(0) / weights.sum()
    return {
        "n_res": n,
        "bond_mean": float(d.mean()) if len(d) else float("nan"),
        "bond_std": float(d.std()) if len(d) else float("nan"),
        "bond_frac_ok": float(((d > 3.0) & (d < 4.5)).mean()) if len(d) else 0.0,
        "clash_frac": clashes,
        "rg": rg,
        "rg_norm": rg / max(n, 1) ** 0.4,
        "helix_frac": float(helix),
        "strand_frac": float(strand),
        "coil_frac": float(coil),
    }


FIELDS = [
    "n_res", "bond_mean", "bond_std", "bond_frac_ok", "clash_frac",
    "rg", "rg_norm", "helix_frac", "strand_frac", "coil_frac",
]


def evaluate_dir(outdir: str):
    paths = sorted(glob.glob(os.path.join(outdir, "**", "*.pdb"), recursive=True))
    if not paths:
        raise FileNotFoundError(f"no .pdb files under {outdir}")
    rows = []
    for p in paths:
        stats = design_stats(ca_chains(p))
        stats["file"] = os.path.relpath(p, outdir)
        rows.append(stats)
    return rows


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("outdir", help="Directory scanned recursively for *.pdb")
    parser.add_argument("--csv", default=None, help="Also write a CSV report")
    parser.add_argument("--json", default=None,
                        help="Also write the aggregate metrics as JSON")
    args = parser.parse_args()

    rows = evaluate_dir(args.outdir)
    for r in rows:
        print(
            f"{r['file']}: n={r['n_res']} bond={r['bond_mean']:.2f}"
            f"±{r['bond_std']:.2f} ok={r['bond_frac_ok']:.0%} "
            f"clash={r['clash_frac']:.1%} rg={r['rg']:.1f} "
            f"H/E/C={r['helix_frac']:.0%}/{r['strand_frac']:.0%}/{r['coil_frac']:.0%}",
            flush=True,
        )
    agg = {k: float(np.mean([r[k] for r in rows])) for k in FIELDS}
    print(
        f"AGGREGATE ({len(rows)} designs): "
        + " ".join(f"{k}={v:.3f}" for k, v in agg.items()),
        flush=True,
    )

    if args.json:
        import json

        with open(args.json, "w") as f:
            json.dump({"n_designs": len(rows), **agg}, f, indent=1)
        print(f"wrote {args.json}", flush=True)

    if args.csv:
        import csv

        with open(args.csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["file"] + FIELDS)
            w.writeheader()
            w.writerows({k: r[k] for k in ["file"] + FIELDS} for r in rows)
        print(f"wrote {args.csv}", flush=True)


if __name__ == "__main__":
    main()
