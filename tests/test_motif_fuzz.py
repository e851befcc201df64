"""Fuzz the REMARK-999 motif-spec grammar: parser parity vs the reference
and mask invariants over randomized specs.

The fixed-column grammar (/root/reference/README.md 'Format of Motif
Scaffolding Problem Definition File', motif_utils.py:4-57) is the most
compatibility-sensitive input surface: a one-column slip silently changes
every scaffolding problem. These tests generate random well-formed specs,
render them in the grammar, and check (a) our parser agrees with the
reference's field-for-field, (b) sample_motif_mask's outputs satisfy the
structural invariants for every spec.
"""

import os
import sys

import numpy as np
import pytest

from genie2_tpu.features.motif import load_motif_spec, sample_motif_mask

REFERENCE_ROOT = "/root/reference"


def _random_spec(rng):
    """Random alternating scaffold/motif segments with satisfiable bounds."""
    n_motifs = int(rng.integers(1, 4))
    structures = []
    lo = hi = 0
    for i in range(n_motifs):
        smin = int(rng.integers(1, 12))
        smax = smin + int(rng.integers(0, 12))
        structures.append({"type": "scaffold", "min_length": smin, "max_length": smax})
        lo, hi = lo + smin, hi + smax
        start = int(rng.integers(1, 200))
        length = int(rng.integers(1, 15))
        structures.append(
            {
                "type": "motif",
                "chain": chr(ord("A") + int(rng.integers(0, 3))),
                "start_index": start,
                "end_index": start + length - 1,
                "group": chr(ord("A") + int(rng.integers(0, 2))),
            }
        )
        lo, hi = lo + length, hi + length
    smin = int(rng.integers(1, 12))
    smax = smin + int(rng.integers(0, 12))
    structures.append({"type": "scaffold", "min_length": smin, "max_length": smax})
    lo, hi = lo + smin, hi + smax
    # Bounds guaranteed to intersect [lo, hi] (satisfiable).
    min_total = int(rng.integers(lo, hi + 1))
    max_total = int(rng.integers(min_total, hi + 1))
    return {
        "name": f"fuzz_{int(rng.integers(1e6))}",
        "structures": structures,
        "min_total_length": min_total,
        "max_total_length": max_total,
    }


def _render(spec):
    """Render a spec dict in the reference's fixed-column grammar."""
    lines = [f"REMARK 999 NAME   {spec['name']}"]
    for s in spec["structures"]:
        if s["type"] == "scaffold":
            lines.append(
                f"REMARK 999 INPUT   {s['min_length']:4d}{s['max_length']:4d}"
            )
        else:
            lines.append(
                f"REMARK 999 INPUT  {s['chain']}{s['start_index']:4d}"
                f"{s['end_index']:4d} {s['group']}"
            )
    lines.append(
        f"REMARK 999 MINIMUM TOTAL LENGTH      {spec['min_total_length']}"
    )
    lines.append(
        f"REMARK 999 MAXIMUM TOTAL LENGTH      {spec['max_total_length']}"
    )
    return "\n".join(lines) + "\n"


def _canon(parsed):
    """Reduce a parsed spec to comparable fields (name whitespace varies
    by writer; compare it stripped)."""
    return {
        "name": (parsed["name"] or "").strip(),
        "structures": parsed["structures"],
        "min_total_length": parsed["min_total_length"],
        "max_total_length": parsed["max_total_length"],
    }


@pytest.fixture(scope="module")
def reference_motif_utils():
    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference not available")
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import genie.utils.motif_utils as mu

    return mu


def test_parse_parity_vs_reference_fuzz(tmp_path, reference_motif_utils):
    rng = np.random.default_rng(0)
    for trial in range(50):
        spec = _random_spec(rng)
        path = tmp_path / f"spec_{trial}.pdb"
        path.write_text(_render(spec))
        ours = _canon(load_motif_spec(str(path)))
        theirs = _canon(reference_motif_utils.load_motif_spec(str(path)))
        assert ours == theirs, f"trial {trial}: {ours} != {theirs}"
        # And both recover what we rendered.
        assert ours["structures"] == spec["structures"], f"trial {trial}"
        assert ours["min_total_length"] == spec["min_total_length"]
        assert ours["max_total_length"] == spec["max_total_length"]


def test_sample_motif_mask_invariants_fuzz(tmp_path):
    rng = np.random.default_rng(1)
    for trial in range(50):
        spec = _random_spec(rng)
        out = sample_motif_mask(spec, rng=np.random.default_rng(trial))
        seq = np.asarray(out["sequence"])  # True at motif positions
        group = np.asarray(out["group"])
        struct = np.asarray(out["structure"])
        total = len(seq)
        # Total sampled length within the spec bounds.
        assert spec["min_total_length"] <= total <= spec["max_total_length"], (
            trial, total, spec["min_total_length"], spec["max_total_length"]
        )
        # Motif residue count is fixed by the spec regardless of sampling.
        n_motif_expected = sum(
            s["end_index"] - s["start_index"] + 1
            for s in spec["structures"]
            if s["type"] == "motif"
        )
        assert int(seq.sum()) == n_motif_expected, trial
        # Group labels nonzero exactly at motif positions.
        np.testing.assert_array_equal(group > 0, seq)
        # Structure mask == exact block-diagonal over motif groups.
        expected = (group[:, None] == group[None, :]) & (group > 0)[:, None] & (
            group > 0
        )[None, :]
        assert struct.shape == (total, total)
        np.testing.assert_array_equal(struct, expected)
