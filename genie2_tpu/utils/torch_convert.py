"""torch (Lightning) checkpoint -> flax params converter.

The reference distributes weights as PyTorch Lightning checkpoints
(/root/reference/genie/utils/model_io.py:79-173, layouts
`version_{v}/checkpoints/epoch={E}.ckpt` and `checkpoints/epoch.{E}.ckpt`).
This module maps the reference Denoiser's state_dict onto the genie2_tpu
flax parameter tree so released weights load directly (torch Linear weights
are [out, in] and transpose to flax [in, out] kernels; LayerNorm weight ->
scale).

Import of torch happens lazily so the library never requires it at runtime.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

_PAIR_FEATURE_LINEARS = {
    "linear_s_p_i",
    "linear_s_p_j",
    "linear_relpos",
    "linear_template",
    "linear_motif_template",
}
_TRI_MUL_LINEARS = {
    "linear_a_p",
    "linear_a_g",
    "linear_b_p",
    "linear_b_g",
    "linear_g",
    "linear_z",
}
_LAYER_NORMS = {"layer_norm", "layer_norm_in", "layer_norm_out", "ipa_layer_norm"}
_IPA_LINEARS = {
    "linear_q",
    "linear_kv",
    "linear_q_points",
    "linear_kv_points",
    "linear_b",
    "linear_out",
}
_MHA_LINEARS = {"linear_q", "linear_k", "linear_v", "linear_g", "linear_o"}


def _map_key(key: str) -> Tuple[Tuple[str, ...], str]:
    """torch state_dict key -> (flax path, kind) where kind in
    {linear, layer_norm, param}."""
    parts = key.split(".")
    leaf = parts[-1]  # weight / bias / head_weights
    mod = parts[:-1]

    if parts[-1] == "head_weights":
        # structure_net.net.{i}.ipa.head_weights
        i = mod[2]
        return ("structure_net", f"layer_{i}", "ipa", "head_weights"), "param"

    if mod[0] == "single_feature_net":
        return ("single_feature_net", "linear", "Dense_0", leaf), "linear"

    if mod[0] == "pair_feature_net":
        name = mod[1]
        if name not in _PAIR_FEATURE_LINEARS:
            raise KeyError(key)
        return ("pair_feature_net", name, "Dense_0", leaf), "linear"

    if mod[0] == "pair_transform_net":
        # pair_transform_net.net.{i}.{module}...
        i = mod[2]
        module = mod[3]
        base = ("pair_transform_net", f"layer_{i}", module)
        rest = mod[4:]
        if module in ("tri_mul_out", "tri_mul_in"):
            (sub,) = rest
            if sub in _TRI_MUL_LINEARS:
                return (*base, sub, "Dense_0", leaf), "linear"
            if sub in _LAYER_NORMS:
                return (*base, sub, leaf), "layer_norm"
        if module in ("tri_att_start", "tri_att_end"):
            if rest == ["layer_norm"]:
                return (*base, "layer_norm", leaf), "layer_norm"
            if rest == ["linear"]:
                return (*base, "linear", "Dense_0", leaf), "linear"
            if rest[0] == "mha" and rest[1] in _MHA_LINEARS:
                return (*base, "mha", rest[1], "Dense_0", leaf), "linear"
        if module == "pair_transition":
            (sub,) = rest
            if sub == "layer_norm":
                return (*base, "layer_norm", leaf), "layer_norm"
            if sub in ("linear_1", "linear_2"):
                return (*base, sub, "Dense_0", leaf), "linear"
        raise KeyError(key)

    if mod[0] == "structure_net":
        i = mod[2]
        module = mod[3]
        base = ("structure_net", f"layer_{i}")
        rest = mod[4:]
        if module == "ipa":
            (sub,) = rest
            if sub in _IPA_LINEARS:
                return (*base, "ipa", sub, "Dense_0", leaf), "linear"
            raise KeyError(key)
        if module == "ipa_layer_norm":
            return (*base, "ipa_layer_norm", leaf), "layer_norm"
        if module == "transition":
            if rest == ["layer_norm"]:
                return (*base, "transition", "layer_norm", leaf), "layer_norm"
            # transition.layers.{j}.linear_{k}
            if rest[0] == "layers":
                j, lin = rest[1], rest[2]
                return (*base, "transition", f"layer_{j}_{lin}", "Dense_0", leaf), "linear"
        if module == "bb_update":
            return (*base, "bb_update", "linear", "Dense_0", leaf), "linear"
        raise KeyError(key)

    raise KeyError(key)


def convert_torch_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Reference Denoiser state_dict (with or without Lightning's 'model.'
    prefix) -> flax variables dict {'params': ...}."""
    params: Dict[str, Any] = {}

    for key, tensor in state_dict.items():
        if key.startswith("model."):
            key = key[len("model."):]
        value = np.asarray(
            tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor
        )
        path, kind = _map_key(key)
        leaf = path[-1]
        if kind == "linear" and leaf == "weight":
            value = value.T
            leaf = "kernel"
        elif kind == "layer_norm" and leaf == "weight":
            leaf = "scale"
        elif leaf in ("bias", "head_weights"):
            pass
        else:
            raise KeyError(f"unhandled leaf for {key}: {leaf}")

        node = params
        for name in path[:-1]:
            node = node.setdefault(name, {})
        node[leaf if leaf != "head_weights" else "head_weights"] = value

    return {"params": params}


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a Lightning .ckpt (or raw state_dict) and convert."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    return convert_torch_state_dict(state_dict)
