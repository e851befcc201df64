"""The SE(3)-equivariant denoiser.

Behavioral counterpart of /root/reference/genie/model/model.py:10-192:
rescale frames -> single features -> pair features -> pair transform stack ->
IPA structure net -> descale -> noise prediction z = trans_in - trans_out.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from genie2_tpu.geometry import Rigid
from genie2_tpu.nn.feature_nets import PairFeatureNet, SingleFeatureNet
from genie2_tpu.nn.pair_stack import PairTransformNet
from genie2_tpu.nn.structure import StructureNet


class Denoiser(nn.Module):
    """Given noisy frames at timestep t, predict the added noise."""

    c_s: int
    c_p: int
    n_timestep: int
    rescale: float

    c_pos_emb: int
    c_chain_emb: int
    c_timestep_emb: int
    max_n_res: int
    max_n_chain: int

    relpos_k: int
    template_dist_min: float
    template_dist_step: float
    template_dist_n_bin: int

    n_pair_transform_layer: int
    include_mul_update: bool
    include_tri_att: bool
    c_hidden_mul: int
    c_hidden_tri_att: int
    n_head_tri: int
    tri_dropout: float
    pair_transition_n: int

    n_structure_layer: int
    n_structure_block: int
    c_hidden_ipa: int
    n_head_ipa: int
    n_qk_point: int
    n_v_point: int
    ipa_dropout: float
    n_structure_transition_layer: int
    structure_transition_dropout: float

    use_pallas: bool = False
    remat: bool = True
    # Row-chunk size for triangle attention (0 = off): bounds the
    # [B, N, H, N, N] logits at O(chunk * H * N^2), the knob that takes
    # tri-att past the N~512 memory wall (tpu.tri_att_chunk).
    tri_att_chunk: int = 0
    # rot_to_quat extraction in the pair featurizer ("closed" | "eigh");
    # torch-converted checkpoints select "eigh" via {ckpt}.meta.json.
    quat_method: str = "closed"
    # Optional NamedSharding for residue-indexed activations (batch over
    # 'data', first residue axis over 'seq'): sequence-sharding of the
    # O(N^2) pair tensor over a 2-D mesh. None = unsharded (GSPMD still
    # applies plain data parallelism from the input sharding). SURVEY §5
    # long-context row; the reference has nothing comparable (its memory
    # story is eval-time chunk_layer chunking, tensor_utils.py:109-213).
    pair_sharding: Any = None

    @classmethod
    def from_config(cls, config, mesh=None) -> "Denoiser":
        """Build from a genie2_tpu.config.Config. Passing a mesh with a
        'seq' axis (config.tpu['mesh_seq'] > 1) turns on sequence sharding
        of the pair stack."""
        from genie2_tpu.parallel import pair_sharding as _pair_sharding

        return cls(
            **config.model,
            n_timestep=config.diffusion["n_timestep"],
            max_n_res=config.io["max_n_res"],
            max_n_chain=config.io["max_n_chain"],
            use_pallas=config.tpu.get("use_pallas", False),
            remat=config.tpu.get("remat", True),
            tri_att_chunk=config.tpu.get("tri_att_chunk", 0),
            quat_method=config.tpu.get("rot_to_quat_method", "closed"),
            pair_sharding=_pair_sharding(mesh),
        )

    @nn.compact
    def __call__(
        self, ts: Rigid, timesteps: jnp.ndarray, features: Dict[str, Any],
        deterministic: bool = True,
        static_pair_bias: jnp.ndarray = None,
    ) -> Dict[str, Any]:
        from genie2_tpu.parallel import constrain

        trans_in = ts.trans
        # The caller's translation dtype selects the compute precision (the
        # bf16 policy passes bf16 frames); encodings are built in fp32 for
        # accuracy and the activations are cast here so a bf16 run stays
        # bf16 through the O(N^2)/O(N^3) stacks.
        compute_dtype = ts.trans.dtype
        ts = ts.scale_translation(self.rescale)

        s = SingleFeatureNet(
            c_s=self.c_s,
            n_timestep=self.n_timestep,
            c_pos_emb=self.c_pos_emb,
            c_chain_emb=self.c_chain_emb,
            c_timestep_emb=self.c_timestep_emb,
            max_n_res=self.max_n_res,
            max_n_chain=self.max_n_chain,
            name="single_feature_net",
        )(ts, timesteps, features).astype(compute_dtype)
        s = constrain(s, self.pair_sharding)

        p = PairFeatureNet(
            c_s=self.c_s,
            c_p=self.c_p,
            n_timestep=self.n_timestep,
            relpos_k=self.relpos_k,
            template_dist_min=self.template_dist_min,
            template_dist_step=self.template_dist_step,
            template_dist_n_bin=self.template_dist_n_bin,
            quat_method=self.quat_method,
            name="pair_feature_net",
        )(s, ts, timesteps, features, static_bias=static_pair_bias).astype(
            compute_dtype
        )
        p = constrain(p, self.pair_sharding)

        if self.n_pair_transform_layer > 0:
            p = PairTransformNet(
                c_p=self.c_p,
                n_pair_transform_layer=self.n_pair_transform_layer,
                include_mul_update=self.include_mul_update,
                include_tri_att=self.include_tri_att,
                c_hidden_mul=self.c_hidden_mul,
                c_hidden_tri_att=self.c_hidden_tri_att,
                n_head_tri=self.n_head_tri,
                tri_dropout=self.tri_dropout,
                pair_transition_n=self.pair_transition_n,
                use_pallas=self.use_pallas,
                tri_att_chunk=self.tri_att_chunk,
                remat=self.remat,
                pair_sharding=self.pair_sharding,
                name="pair_transform_net",
            )(p, features, deterministic=deterministic)

        states, ts = StructureNet(
            c_s=self.c_s,
            c_p=self.c_p,
            n_structure_layer=self.n_structure_layer,
            n_structure_block=self.n_structure_block,
            c_hidden_ipa=self.c_hidden_ipa,
            n_head_ipa=self.n_head_ipa,
            n_qk_point=self.n_qk_point,
            n_v_point=self.n_v_point,
            ipa_dropout=self.ipa_dropout,
            n_structure_transition_layer=self.n_structure_transition_layer,
            structure_transition_dropout=self.structure_transition_dropout,
            name="structure_net",
        )(s, p, ts, features, deterministic=deterministic)

        ts = ts.scale_translation(1.0 / self.rescale)

        return {
            "z": trans_in - ts.trans,
            "s": s,
            "p": p,
            "states": states,
            "ts": ts,
        }
