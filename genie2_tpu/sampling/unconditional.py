"""Unconditional length-conditioned sampler.

Behavioral counterpart of /root/reference/genie/sampler/unconditional.py:
empty features for a target length, outputs written as
`{outdir}/pdbs/{prefix}_{offset+i}.pdb`.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List

from genie2_tpu.features import create_empty_features, save_features_to_pdb
from genie2_tpu.sampling.base import BaseSampler


class UnconditionalSampler(BaseSampler):
    def setup(self):
        self.add_required_parameter("length")

    def on_sample_start(self, params: Dict[str, Any]):
        os.makedirs(os.path.join(params["outdir"], "pdbs"), exist_ok=True)

    def create_np_features(self, params: Dict[str, Any]):
        return create_empty_features([params["length"]])

    def on_sample_end(self, params: Dict[str, Any], list_np_features: List[Dict]):
        for i, np_features in enumerate(list_np_features):
            name = f"{params['prefix']}_{params['offset'] + i}"
            save_features_to_pdb(
                np_features, os.path.join(params["outdir"], "pdbs", f"{name}.pdb")
            )


class PackedUnconditionalSampler(UnconditionalSampler):
    """Length-packed variant: one batch mixes different target lengths
    (padded to a shared bucket). The reference sweeps lengths one task at a
    time with a fixed batch (sample_unconditional.py:101-120), leaving
    batches ragged at the sweep edges; packing keeps every batch full.

    Required params: `lengths` (one per sample) and `names` (output file
    stem per sample, e.g. "173_2")."""

    def setup(self):
        self.add_required_parameter("lengths")
        self.add_required_parameter("names")

    def validate_parameters(self, params: Dict[str, Any]) -> bool:
        ok = super().validate_parameters(params)
        return ok and len(params["lengths"]) == len(params["names"])

    def create_np_features_batch(self, params: Dict[str, Any]):
        return [create_empty_features([l]) for l in params["lengths"]]

    def on_sample_end(self, params: Dict[str, Any], list_np_features: List[Dict]):
        for name, np_features in zip(params["names"], list_np_features):
            save_features_to_pdb(
                np_features, os.path.join(params["outdir"], "pdbs", f"{name}.pdb")
            )
