"""The canonical 12-key feature dictionary and its host-side transforms.

Behavioral counterpart of /root/reference/genie/utils/feat_utils.py:17-359.
Features travel as plain dicts of numpy arrays on the host; `to_device`
produces jnp arrays with the reference's dtype table (feat_utils.py:342-359):
int32 for indices/counts/masks, float32 for coordinates, bool for the fixed
conditioning masks.

Keys (per structure, unpadded length N):
    aatype                [N, 20]   one-hot amino-acid types
    num_chains            []        scalar
    num_residues          []        scalar
    num_residues_per_chain[C]
    atom_positions        [N, 3]    C-alpha coordinates
    residue_mask          [N]
    residue_index         [N]
    chain_index           [N]
    fixed_sequence_mask   [N]       motif-sequence conditioning
    fixed_structure_mask  [N, N]    motif-structure conditioning
    fixed_group           [N]       motif group id (0 = scaffold)
    interface_mask        [N]       deprecated, all zeros
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from genie2_tpu.features.residues import NUM_RESTYPES

Features = Dict[str, np.ndarray]

FEATURE_KEYS = [
    "aatype",
    "num_chains",
    "num_residues",
    "num_residues_per_chain",
    "atom_positions",
    "residue_mask",
    "residue_index",
    "chain_index",
    "fixed_sequence_mask",
    "fixed_structure_mask",
    "fixed_group",
    "interface_mask",
]


def create_empty_features(lengths: List[int]) -> Features:
    """Zeroed features for a structure with the given per-chain lengths
    (feat_utils.py:17-65)."""
    num_chains = np.array(len(lengths))
    num_residues = int(np.sum(lengths))
    return {
        "aatype": np.zeros((num_residues, NUM_RESTYPES), dtype=int),
        "num_chains": num_chains.astype(int),
        "num_residues": np.array(num_residues).astype(int),
        "num_residues_per_chain": np.array(lengths).astype(int),
        "atom_positions": np.zeros((num_residues, 3), dtype=float),
        "residue_mask": np.ones(num_residues, dtype=int),
        "residue_index": np.concatenate([np.arange(l) for l in lengths]).astype(int),
        "chain_index": np.concatenate(
            [[i] * l for i, l in enumerate(lengths)]
        ).astype(int),
        "fixed_sequence_mask": np.zeros(num_residues, dtype=bool),
        "fixed_structure_mask": np.zeros((num_residues, num_residues), dtype=bool),
        "fixed_group": np.zeros(num_residues, dtype=int),
        "interface_mask": np.zeros(num_residues, dtype=bool),
    }


def pad_features(features: Features, max_n_chain: int, max_n_res: int) -> Features:
    """Zero-pad a single structure's features (feat_utils.py:192-231)."""
    out = dict(features)
    n_chain = int(features["num_chains"])
    n_res = int(features["num_residues"])
    for key, val in features.items():
        if key == "num_residues_per_chain":
            out[key] = np.concatenate(
                [val, np.zeros(max_n_chain - n_chain, dtype=val.dtype)]
            )
        elif key == "fixed_structure_mask":
            pad = max_n_res - n_res
            out[key] = np.pad(val, [(0, pad), (0, pad)]).astype(val.dtype)
        elif not key.startswith("num"):
            pad = max_n_res - n_res
            out[key] = np.concatenate(
                [val, np.zeros((pad, *val.shape[1:]), dtype=val.dtype)]
            )
    return out


def batchify(list_features: List[Features]) -> Features:
    """Pad to the batch maxima and stack (feat_utils.py:233-268)."""
    max_n_chain = max(int(f["num_chains"]) for f in list_features)
    max_n_res = max(int(f["num_residues"]) for f in list_features)
    padded = [pad_features(f, max_n_chain, max_n_res) for f in list_features]
    return {k: np.stack([p[k] for p in padded], axis=0) for k in list_features[0]}


def debatchify(features: Features) -> List[Features]:
    """Split a batch and strip padding (feat_utils.py:270-302)."""
    out = []
    for i in range(features["aatype"].shape[0]):
        n_chain = int(features["num_chains"][i])
        n_res = int(features["num_residues"][i])
        out.append(
            {
                "num_chains": features["num_chains"][i],
                "num_residues": features["num_residues"][i],
                "num_residues_per_chain": features["num_residues_per_chain"][i, :n_chain],
                "aatype": features["aatype"][i, :n_res],
                "atom_positions": features["atom_positions"][i, :n_res],
                "residue_mask": features["residue_mask"][i, :n_res],
                "residue_index": features["residue_index"][i, :n_res],
                "chain_index": features["chain_index"][i, :n_res],
                "fixed_sequence_mask": features["fixed_sequence_mask"][i, :n_res],
                "fixed_structure_mask": features["fixed_structure_mask"][i, :n_res, :n_res],
                "fixed_group": features["fixed_group"][i, :n_res],
                "interface_mask": features["interface_mask"][i, :n_res],
            }
        )
    return out


# Device dtype table (feat_utils.py:304-359).
_DEVICE_DTYPES = {
    "num_chains": jnp.int32,
    "num_residues": jnp.int32,
    "num_residues_per_chain": jnp.int32,
    "aatype": jnp.int32,
    "atom_positions": jnp.float32,
    "residue_mask": jnp.int32,
    "residue_index": jnp.int32,
    "chain_index": jnp.int32,
    "fixed_sequence_mask": jnp.bool_,
    "fixed_structure_mask": jnp.bool_,
    "fixed_group": jnp.int32,
    "interface_mask": jnp.bool_,
}


def to_device(features: Features) -> Dict[str, jnp.ndarray]:
    """Host numpy batch -> device arrays with canonical dtypes."""
    return {k: jnp.asarray(v, dtype=_DEVICE_DTYPES[k]) for k, v in features.items()}


def to_host(features: Dict[str, jnp.ndarray]) -> Features:
    """Device batch -> host numpy with the reference's numpy dtype table
    (feat_utils.py:323-340)."""
    np_dtypes = {k: (bool if v == jnp.bool_ else (float if v == jnp.float32 else int))
                 for k, v in _DEVICE_DTYPES.items()}
    return {k: np.asarray(v).astype(np_dtypes[k]) for k, v in features.items()}
