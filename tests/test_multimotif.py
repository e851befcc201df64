"""Multi-motif scaffolding e2e (the reference's data/multimotifs workload):
two motif groups with a block-diagonal fixed_structure_mask, sampled through
the full ScaffoldSampler pipeline."""

import os

import jax
import numpy as np

from genie2_tpu.features import load_motif_spec, sample_motif_mask
from genie2_tpu.sampling import ScaffoldSampler
from tests.test_sampler import make_model_and_params, tiny_config

MULTIMOTIF_SPEC = """REMARK 999 NAME   twogroups
REMARK 999 MINIMUM TOTAL LENGTH      24
REMARK 999 MAXIMUM TOTAL LENGTH      34
REMARK 999 INPUT      3   8
REMARK 999 INPUT  A   3   5 A
REMARK 999 INPUT      3   8
REMARK 999 INPUT  B  10  12 B
REMARK 999 INPUT      3   8
"""


def _atoms():
    rng = np.random.default_rng(0)
    lines = []

    def rep(s, idx, sub):
        return s[:idx] + sub + s[idx + len(sub):]

    idx = 1
    for chain, residues in (("A", range(3, 6)), ("B", range(10, 13))):
        for ri in residues:
            x, y, z = rng.normal(size=3) * 5
            line = " " * 80
            line = rep(line, 0, "ATOM")
            line = rep(line, 6, str(idx).rjust(5))
            line = rep(line, 13, "CA")
            line = rep(line, 17, "GLY")
            line = rep(line, 21, chain)
            line = rep(line, 22, str(ri).rjust(4))
            line = rep(line, 30, f"{x:.3f}".rjust(8))
            line = rep(line, 38, f"{y:.3f}".rjust(8))
            line = rep(line, 46, f"{z:.3f}".rjust(8))
            line = rep(line, 77, "C")
            lines.append(line)
            idx += 1
    return "\n".join(lines) + "\n"


def test_multimotif_masks_and_sampling(tmp_path):
    spec_path = str(tmp_path / "mm.pdb")
    open(spec_path, "w").write(MULTIMOTIF_SPEC + _atoms())

    # Mask semantics: two groups, block-diagonal structure mask, no
    # cross-group conditioning (motif_utils.py:118-123 semantics).
    spec = load_motif_spec(spec_path)
    mask = sample_motif_mask(spec, np.random.default_rng(0))
    assert set(np.unique(mask["group"])) == {0, 1, 2}
    ga, gb = mask["group"] == 1, mask["group"] == 2
    assert ga.sum() == 3 and gb.sum() == 3
    assert mask["structure"][np.ix_(ga, gb)].sum() == 0
    assert mask["structure"][np.ix_(ga, ga)].all()
    assert mask["structure"][np.ix_(gb, gb)].all()

    # Full sampler pipeline.
    config = tiny_config()
    model, params = make_model_and_params(config)
    sampler = ScaffoldSampler(model, params, config)
    out = sampler.sample(
        {
            "scale": 0.4,
            "outdir": str(tmp_path / "out"),
            "num_samples": 2,
            "prefix": "mm",
            "offset": 0,
            "filepath": spec_path,
        },
        key=jax.random.PRNGKey(0),
    )
    for i, f in enumerate(out):
        assert 24 <= int(f["num_residues"]) <= 34
        assert f["fixed_sequence_mask"].sum() == 6
        assert set(np.unique(f["fixed_group"])) == {0, 1, 2}
        # The design PDB carries the group as segment id (col 72) for both
        # groups (feat_utils.py:168-182 behavior).
        pdb = open(str(tmp_path / "out" / "pdbs" / f"mm_{i}.pdb")).read()
        segs = {l[72] for l in pdb.splitlines() if l.startswith("ATOM")}
        assert {"A", "B"} <= segs
        # Aligned motif PDB re-indexes both chains onto chain A placements.
        motif_pdb = open(str(tmp_path / "out" / "motif_pdbs" / f"mm_{i}.pdb")).read()
        motif_lines = [l for l in motif_pdb.splitlines() if l.startswith("ATOM")]
        assert len(motif_lines) == 6
        placed = [j + 1 for j, v in enumerate(f["fixed_sequence_mask"]) if v]
        got = [int(l[22:26]) for l in motif_lines]
        assert got == placed
