"""Fixed-placement motif scaffolding sampler.

Behavioral counterpart of /root/reference/genie/sampler/scaffold.py: motif
conditioning flows entirely through the fixed sequence/structure masks
consumed by the feature nets; the reverse loop is unchanged. A fresh legal
placement is sampled per sample (scaffold.py:100), and each design is saved
alongside an aligned motif PDB for evaluation (scaffold.py:148-169).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List

import numpy as np

from genie2_tpu.features import features_from_motif_pdb, save_features_to_pdb
from genie2_tpu.features.motif import save_motif_pdb
from genie2_tpu.sampling.base import BaseSampler


class ScaffoldSampler(BaseSampler):
    def setup(self):
        self.add_required_parameter("filepath")
        self._rng = np.random.default_rng()

    def on_sample_start(self, params: Dict[str, Any]):
        os.makedirs(os.path.join(params["outdir"], "pdbs"), exist_ok=True)
        os.makedirs(os.path.join(params["outdir"], "motif_pdbs"), exist_ok=True)

    def create_np_features(self, params: Dict[str, Any]):
        return features_from_motif_pdb(params["filepath"], self._rng)

    def on_sample_end(self, params: Dict[str, Any], list_np_features: List[Dict]):
        for i, np_features in enumerate(list_np_features):
            name = f"{params['prefix']}_{params['offset'] + i}"
            save_features_to_pdb(
                np_features, os.path.join(params["outdir"], "pdbs", f"{name}.pdb")
            )
            save_motif_pdb(
                params["filepath"],
                np_features["fixed_sequence_mask"],
                os.path.join(params["outdir"], "motif_pdbs", f"{name}.pdb"),
            )
