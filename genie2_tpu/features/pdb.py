"""Minimal fixed-column PDB I/O for C-alpha traces.

Behavioral counterpart of /root/reference/genie/utils/feat_utils.py:67-186
and :365-415: CA-only ATOM records, chains split on chain-ID change,
gzip support, mean-centering on both read and write, and the motif group
written as a segment id in column 72.
"""

from __future__ import annotations

import gzip
from typing import List, Tuple

import numpy as np

from genie2_tpu.features.residues import (
    NUM_RESTYPES,
    RESTYPE_1_TO_3,
    RESTYPE_3_TO_1,
    RESTYPE_ORDER,
    RESTYPES,
)
from genie2_tpu.features.schema import Features, create_empty_features


def parse_pdb(filepath: str) -> Tuple[List[List[int]], List[List[List[float]]]]:
    """Per-chain residue-type indices and CA coordinates from a fixed-column
    PDB. Pure-python fallback for the C++ parser (csrc/pdb_parser.cpp) and
    behavioral counterpart of feat_utils.py:377-415: CA-only ATOM records;
    a new chain starts wherever the chain-ID letter (column 22) changes,
    so a re-appearing ID after an interleaved chain opens a fresh chain.

    Filter-then-vectorize: column slicing and float conversion run as one
    numpy pass over the record block instead of per-line appends."""
    opener = gzip.open if filepath.endswith(".gz") else open
    with opener(filepath, "rt") as fh:
        records = [
            ln
            for ln in fh
            if ln.startswith("ATOM") and ln[13:15].strip() == "CA"
        ]
    if not records:
        return [], []

    types = np.fromiter(
        (RESTYPE_ORDER[RESTYPE_3_TO_1[ln[17:20]]] for ln in records),
        dtype=np.int64,
        count=len(records),
    )
    xyz = np.array(
        [(ln[30:38], ln[38:46], ln[46:54]) for ln in records], dtype=np.float64
    )
    chain_ids = np.array([ln[21] for ln in records])
    starts = np.flatnonzero(
        np.concatenate([[True], chain_ids[1:] != chain_ids[:-1]])
    ).tolist()
    bounds = starts + [len(records)]
    seqs = [types[a:b].tolist() for a, b in zip(bounds, bounds[1:])]
    coords = [xyz[a:b].tolist() for a, b in zip(bounds, bounds[1:])]
    return seqs, coords


def summarize_pdb(filepath: str):
    seqs, _ = parse_pdb(filepath)
    return {
        "num_residues": int(np.sum([len(s) for s in seqs])),
        "num_chains": len(seqs),
    }


def features_from_pdb(filepath: str, use_native: bool = True) -> Features:
    """PDB file -> feature dict with one-hot aatype and mean-centered CA
    coordinates (feat_utils.py:67-93). Uses the C++ parser when available
    (genie2_tpu/features/pdb_native.py, falls back transparently)."""
    if use_native:
        from genie2_tpu.features.pdb_native import parse_pdb_fast

        seqs, coords = parse_pdb_fast(filepath)
    else:
        seqs, coords = parse_pdb(filepath)
    lengths = [len(s) for s in seqs]
    features = create_empty_features(lengths)
    aatype = np.eye(NUM_RESTYPES)[np.concatenate(seqs)]
    positions = np.concatenate(coords)
    positions = positions - positions.mean(axis=0, keepdims=True)
    features["aatype"] = aatype.astype(int)
    features["atom_positions"] = positions.astype(float)
    return features


def save_features_to_pdb(features: Features, filepath: str):
    """Write a CA-only PDB: centered coords rounded to 3 decimals, motif
    group as segment id at column 72, element C at column 77
    (feat_utils.py:136-186)."""

    def replace(string, index, substring):
        return string[:index] + substring + string[index + len(substring):]

    coords = features["atom_positions"]
    coords = coords - coords.mean(axis=0, keepdims=True)
    coords = np.around(coords, decimals=3)

    with open(filepath, "w") as file:
        for i in range(coords.shape[0]):
            residue_name = RESTYPE_1_TO_3[RESTYPES[int(np.argmax(features["aatype"][i]))]]
            group = (
                " "
                if features["fixed_group"][i] == 0
                else chr(int(features["fixed_group"][i]) - 1 + ord("A"))
            )
            line = " " * 80
            line = replace(line, 0, "ATOM")
            line = replace(line, 6, str(i + 1).rjust(5))
            line = replace(line, 13, "CA")
            line = replace(line, 17, residue_name)
            line = replace(line, 21, chr(ord("A") + int(features["chain_index"][i])))
            line = replace(line, 22, str(int(features["residue_index"][i]) + 1).rjust(4))
            line = replace(line, 30, str(coords[i][0]).rjust(8))
            line = replace(line, 38, str(coords[i][1]).rjust(8))
            line = replace(line, 46, str(coords[i][2]).rjust(8))
            line = replace(line, 72, group.ljust(4))
            line = replace(line, 77, "C")
            file.write(line + "\n")


def save_coords_to_pdb(coords: np.ndarray, filepath: str):
    """Write a bare [N, 3] CA trace as a single-chain all-ALA PDB (the
    snapshot/dump convenience wrapper around save_features_to_pdb)."""
    from genie2_tpu.features.schema import create_empty_features

    features = create_empty_features([len(coords)])
    features["atom_positions"] = np.asarray(coords, dtype=float)
    save_features_to_pdb(features, filepath)
