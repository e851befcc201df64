"""Configuration for genie2_tpu.

Keeps the reference's UX contract (/root/reference/genie/config.py:9-107):
a whitespace-separated `key value` text file with camelCase keys, parsed
into five groups (io / diffusion / model / training / optimization) with
identical defaults. Adds a TPU group for mesh / precision knobs that have
no reference counterpart.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional


def _parse_value(raw: str):
    if raw == "True":
        return True
    if raw == "False":
        return False
    return raw


def load_config_file(filename: str) -> Dict[str, Any]:
    """Parse the reference's `key value` grammar (config.py:95-107):
    lines with exactly two whitespace-separated tokens; literal True/False
    become booleans; everything else stays a string until coerced."""
    config: Dict[str, Any] = {}
    with open(filename) as file:
        for line in file:
            elts = line.split()
            if len(elts) == 2:
                config[elts[0]] = _parse_value(elts[1])
    return config


def _int_or_none(x):
    return int(x) if x is not None else None


def _float_or_none(x):
    return float(x) if x is not None else None


@dataclasses.dataclass
class Config:
    """Five dict groups with the reference's keys and defaults, plus `tpu`."""

    io: Dict[str, Any] = dataclasses.field(default_factory=dict)
    diffusion: Dict[str, Any] = dataclasses.field(default_factory=dict)
    model: Dict[str, Any] = dataclasses.field(default_factory=dict)
    training: Dict[str, Any] = dataclasses.field(default_factory=dict)
    optimization: Dict[str, Any] = dataclasses.field(default_factory=dict)
    tpu: Dict[str, Any] = dataclasses.field(default_factory=dict)

    def __init__(self, filename: Optional[str] = None, overrides: Optional[Dict[str, Any]] = None):
        raw = {} if filename is None else load_config_file(filename)
        if overrides:
            # String override values go through the same parser as file
            # values, so overrides={"remat": "False"} behaves like the
            # config line `remat False` (bool("False") is True otherwise).
            raw.update(
                {
                    k: _parse_value(v) if isinstance(v, str) else v
                    for k, v in overrides.items()
                }
            )
        self._build(raw)

    def _build(self, c: Dict[str, Any]):
        self.io = {
            "name": c.get("name", None),
            "rootdir": c.get("rootDirectory", "runs"),
            "datadir": c.get("dataDirectory", "data/afdbreps_l-256_plddt_80/pdbs"),
            "min_n_res": _int_or_none(c.get("minimumNumResidues", 20)),
            "max_n_res": _int_or_none(c.get("maximumNumResidues", 256)),
            "max_n_chain": _int_or_none(c.get("maximumNumChains", 1)),
            "validation_split": _float_or_none(c.get("validationSplit", None)),
            # Motif conditioning (training-time augmentation).
            "motif_prob": float(c.get("motifProbability", 0.8)),
            "motif_min_pct_res": float(c.get("motifMinimumPercentageResidues", 0.05)),
            "motif_max_pct_res": float(c.get("motifMaximumPercentageResidues", 0.5)),
            "motif_min_n_seg": int(c.get("motifMinimumNumberSegments", 1)),
            "motif_max_n_seg": int(c.get("motifMaximumNumberSegments", 4)),
        }
        self.diffusion = {
            "n_timestep": int(c.get("numTimesteps", 1000)),
            "schedule": c.get("schedule", "cosine"),
        }
        self.model = {
            "c_s": int(c.get("singleFeatureDimension", 384)),
            "c_p": int(c.get("pairFeatureDimension", 128)),
            "rescale": float(c.get("rescale", 1)),
            # Single feature network.
            "c_pos_emb": int(c.get("positionalEmbeddingDimension", 256)),
            "c_chain_emb": int(c.get("chainEmbeddingDimension", 64)),
            "c_timestep_emb": int(c.get("timestepEmbeddingDimension", 512)),
            # Pair feature network.
            "relpos_k": int(c.get("relativePositionK", 32)),
            "template_dist_min": float(c.get("templateDistanceMinimum", 2)),
            "template_dist_step": float(c.get("templateDistanceStep", 0.5)),
            "template_dist_n_bin": int(c.get("templateDistanceNumBins", 37)),
            # Pair transform network.
            "n_pair_transform_layer": int(c.get("numPairTransformLayers", 5)),
            "include_mul_update": bool(c.get("includeTriangularMultiplicativeUpdate", True)),
            "include_tri_att": bool(c.get("includeTriangularAttention", False)),
            "c_hidden_mul": int(c.get("triangularMultiplicativeHiddenDimension", 128)),
            "c_hidden_tri_att": int(c.get("triangularAttentionHiddenDimension", 32)),
            "n_head_tri": int(c.get("triangularAttentionNumHeads", 4)),
            "tri_dropout": float(c.get("triangularDropout", 0.25)),
            "pair_transition_n": int(c.get("pairTransitionN", 4)),
            # Structure network.
            "n_structure_layer": int(c.get("numStructureLayers", 8)),
            "n_structure_block": int(c.get("numStructureBlocks", 1)),
            "c_hidden_ipa": int(c.get("ipaHiddenDimension", 16)),
            "n_head_ipa": int(c.get("ipaNumHeads", 12)),
            "n_qk_point": int(c.get("ipaNumQkPoints", 4)),
            "n_v_point": int(c.get("ipaNumVPoints", 8)),
            "ipa_dropout": float(c.get("ipaDropout", 0.1)),
            "n_structure_transition_layer": int(c.get("numStructureTransitionLayers", 1)),
            "structure_transition_dropout": float(c.get("structureTransitionDropout", 0.1)),
        }
        self.training = {
            "seed": int(c.get("seed", 100)),
            "n_epoch": int(c.get("numEpoches", 1)),
            "batch_size": int(c.get("batchSize", 1)),
            "log_every_n_step": int(c.get("logEverySteps", 1000)),
            "checkpoint_every_n_epoch": int(c.get("checkpointEveryEpoches", 500)),
            "condition_loss_weight": int(c.get("conditionLossWeight", 1)),
            # Weight EMA decay (0 = off; no reference counterpart).
            "ema_decay": float(c.get("emaDecay", 0)),
            # Mid-epoch resume-state cadence in optimizer steps (0 = only at
            # the per-epoch checkpoint cadence; no reference counterpart —
            # the reference loses everything since the last epoch boundary).
            "save_state_every_n_step": int(c.get("saveStateEverySteps", 0)),
            # Non-blocking checkpoint writes (utils/model_io.AsyncSaver):
            # orbax serializes + writes on a background thread while
            # training continues; publication stays atomic.
            "async_checkpoint": bool(c.get("asyncCheckpoint", False)),
            # Async input-pipeline buffer depth (batches computed + placed
            # ahead of the device step on a background thread; 0 = fully
            # synchronous). Counterpart of the reference's DataLoader
            # workers (data_module.py:145-179).
            "prefetch_depth": int(c.get("prefetchDepth", 2)),
            # Optimizer steps per device dispatch (lax.scan over K stacked
            # batches; 1 = classic one-step dispatch). Amortizes the
            # tunnel's per-dispatch host issue cost exactly like the
            # samplers' steps_per_dispatch; numerics are step-identical
            # (train/state.make_train_scan_step). No reference counterpart.
            "scan_steps": int(c.get("scanSteps", 1)),
        }
        self.optimization = {
            "lr": float(c.get("learningRate", 1e-4)),
        }
        # TPU-specific knobs (no reference counterpart).
        self.tpu = {
            # bfloat16 activations with fp32 accumulation ("bf16") or full
            # fp32 ("fp32", parity mode).
            "compute_dtype": c.get("computeDtype", "fp32"),
            # rot_to_quat extraction in the pair featurizer: "closed"
            # (canonical-sign Shepperd, the TPU default) or "eigh" (the
            # reference's eigen-decomposition, affine_utils.py:336-355).
            # Torch-converted checkpoints stamp their method into
            # {ckpt}.meta.json and the loaders honor it (BENCH_NOTES.md
            # round-3 quat-sign study).
            "rot_to_quat_method": c.get("rotToQuatMethod", "closed"),
            # Use Pallas kernels for the pair stack when available.
            "use_pallas": bool(c.get("usePallas", False)),
            # Triangle-attention row-chunk size (0 = off). Scans the row
            # axis in chunks so the O(H N^3) attention logits never
            # materialize — required for tri-att past N~512 (the unchunked
            # logits at N=1024, H=4 are ~17 GB bf16). Identical numerics.
            "tri_att_chunk": int(c.get("triangleAttentionChunk", 0)),
            # Data-parallel mesh axis size; -1 = all local devices.
            "mesh_data": int(c.get("meshData", -1)),
            # Sequence-parallel mesh axis size (>1 shards the pair tensor's
            # i-axis over a second 'seq' mesh axis — the long-context
            # scaling story past N=256; SURVEY §5).
            "mesh_seq": int(c.get("meshSeq", 1)),
            # Tensor-parallel mesh axis size (>1 shards the weights and
            # their Adam moments over a 'model' mesh axis, Megatron-style;
            # parallel/tensor_parallel.py). Composes with meshSeq into a
            # 3-D ('data','seq','model') mesh.
            "mesh_model": int(c.get("meshModel", 1)),
            # Rematerialize the pair stack in backward (needed at N=256;
            # can be disabled for small models/tests).
            "remat": bool(c.get("remat", True)),
        }

    def as_dict(self) -> Dict[str, Any]:
        return {
            "io": self.io,
            "diffusion": self.diffusion,
            "model": self.model,
            "training": self.training,
            "optimization": self.optimization,
            "tpu": self.tpu,
        }

    def save(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.as_dict(), f, indent=2)

    def __repr__(self):
        return f"Config({json.dumps(self.as_dict(), indent=2)})"
