"""Full-denoiser numerical parity: torch reference -> weight converter ->
genie2_tpu flax model, same inputs, same outputs.

The one intentional divergence is rot_to_quat: the reference extracts
quaternions via torch.linalg.eigh, whose eigenvector SIGN is
implementation-defined (SURVEY.md hard-part #3); genie2_tpu uses a
closed-form extraction with a canonical sign. For an apples-to-apples
comparison we monkeypatch the reference's pair featurizer with a torch
closed-form implementation that mirrors ours exactly (the test process only;
nothing under /root/reference is modified).

This is the measured, documented policy — see
tests/test_parity_full_config.py: raw torch-eigh signs agree with ANY fixed
convention only ~half the time (they are LAPACK-internal), the reference's
own z moves ~4e-2 under a sign-convention change, and at flagship dims the
flax model matches the sign-canonicalized reference to <2e-4.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from genie2_tpu.config import Config
from genie2_tpu.features import batchify, create_empty_features, to_device
from genie2_tpu.geometry import Rigid, frenet_frames
from genie2_tpu.nn import Denoiser
from genie2_tpu.utils.torch_convert import convert_torch_state_dict

DIMS = dict(
    c_s=32,
    c_p=16,
    n_timestep=50,
    rescale=1.0,
    c_pos_emb=16,
    c_chain_emb=8,
    c_timestep_emb=16,
    max_n_res=32,
    max_n_chain=1,
    relpos_k=4,
    template_dist_min=2.0,
    template_dist_step=0.5,
    template_dist_n_bin=9,
    n_pair_transform_layer=2,
    include_mul_update=True,
    include_tri_att=True,
    c_hidden_mul=8,
    c_hidden_tri_att=4,
    n_head_tri=2,
    tri_dropout=0.25,
    pair_transition_n=2,
    n_structure_layer=2,
    n_structure_block=1,
    c_hidden_ipa=4,
    n_head_ipa=2,
    n_qk_point=2,
    n_v_point=3,
    ipa_dropout=0.1,
    n_structure_transition_layer=1,
    structure_transition_dropout=0.1,
)


def torch_closed_form_rot_to_quat(rot):
    """torch mirror of genie2_tpu.geometry.quat.rot_to_quat(method='closed')."""
    xx, xy, xz = rot[..., 0, 0], rot[..., 0, 1], rot[..., 0, 2]
    yx, yy, yz = rot[..., 1, 0], rot[..., 1, 1], rot[..., 1, 2]
    zx, zy, zz = rot[..., 2, 0], rot[..., 2, 1], rot[..., 2, 2]
    tr = xx + yy + zz
    qw = torch.stack([1.0 + tr, zy - yz, xz - zx, yx - xy], dim=-1)
    qx = torch.stack([zy - yz, 1.0 + xx - yy - zz, xy + yx, xz + zx], dim=-1)
    qy = torch.stack([xz - zx, xy + yx, 1.0 + yy - xx - zz, yz + zy], dim=-1)
    qz = torch.stack([yx - xy, xz + zx, yz + zy, 1.0 + zz - xx - yy], dim=-1)
    cands = torch.stack([qw, qx, qy, qz], dim=-2)
    diags = torch.stack([qw[..., 0], qx[..., 1], qy[..., 2], qz[..., 3]], dim=-1)
    best = torch.argmax(diags, dim=-1)
    q = torch.gather(
        cands, -2, best[..., None, None].expand(*best.shape, 1, 4)
    ).squeeze(-2)
    q = q / torch.linalg.norm(q, dim=-1, keepdim=True)
    lead = torch.gather(q, -1, torch.argmax(torch.abs(q), dim=-1, keepdim=True))
    return q * torch.sign(lead)


@pytest.fixture(scope="module")
def torch_model():
    from genie.model.model import Denoiser as TorchDenoiser
    import genie.model.pair_feature_net as ref_pfn

    # Patch only in this process; the reference repo is read-only.
    ref_pfn.rot_to_quat = torch_closed_form_rot_to_quat

    torch.manual_seed(0)
    model = TorchDenoiser(**DIMS)
    model.eval()
    return model


def make_features(with_motif: bool):
    f = create_empty_features([24])
    if with_motif:
        rng = np.random.default_rng(0)
        seq = np.zeros(24, dtype=bool)
        seq[5:10] = True
        seq[14:17] = True
        f["fixed_sequence_mask"] = seq
        f["fixed_structure_mask"] = (seq[:, None] * seq[None, :]).astype(bool)
        f["fixed_group"] = seq.astype(int)
        f["aatype"] = np.eye(20)[rng.integers(0, 20, 24)].astype(int)
        f["atom_positions"][seq] = rng.normal(size=(seq.sum(), 3)) * 4
    return batchify([f, dict(f)])


def torch_features(batch):
    from genie.utils.feat_utils import convert_np_features_to_tensor

    return convert_np_features_to_tensor(
        {k: np.asarray(v) for k, v in batch.items()}, "cpu"
    )


@pytest.mark.parametrize("with_motif", [False, True])
def test_full_denoiser_parity(torch_model, with_motif):
    from genie.utils.affine_utils import T as TorchT
    from genie.utils.geo_utils import compute_frenet_frames as torch_frames

    batch = make_features(with_motif)
    rng = np.random.default_rng(42)
    trans_np = rng.normal(size=batch["atom_positions"].shape).astype(np.float32) * 3
    t_np = np.array([7, 31], dtype=np.int64)

    # Torch forward.
    tf = torch_features(batch)
    trans_t = torch.tensor(trans_np)
    rots_t = torch_frames(trans_t, tf["chain_index"], tf["residue_mask"])
    with torch.no_grad():
        out_t = torch_model(TorchT(rots_t, trans_t), torch.tensor(t_np), tf)

    # Flax forward with converted weights.
    config_overrides = {}
    model = Denoiser(
        use_pallas=False,
        **DIMS,
    )
    variables = convert_torch_state_dict(torch_model.state_dict())
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    feats = to_device(batch)
    trans_j = jnp.asarray(trans_np)
    rots_j = frenet_frames(trans_j, feats["chain_index"], feats["residue_mask"])
    out_j = model.apply(
        variables, Rigid(rots_j, trans_j), jnp.asarray(t_np, jnp.int32), feats
    )

    # Frames parity first (inputs identical).
    np.testing.assert_allclose(
        np.asarray(rots_j), rots_t.numpy(), atol=1e-5, err_msg="frames diverge"
    )

    for key_name in ["s", "p"]:
        np.testing.assert_allclose(
            np.asarray(out_j[key_name]),
            out_t[key_name].numpy(),
            atol=2e-4,
            err_msg=f"{key_name} diverges (motif={with_motif})",
        )
    np.testing.assert_allclose(
        np.asarray(out_j["z"]),
        out_t["z"].numpy(),
        atol=1e-4,
        err_msg=f"z diverges (motif={with_motif})",
    )


def test_converter_tree_matches_init():
    """The converted tree must have exactly the init-generated structure."""
    from genie.model.model import Denoiser as TorchDenoiser

    torch.manual_seed(1)
    tm = TorchDenoiser(**DIMS)
    converted = convert_torch_state_dict(tm.state_dict())

    model = Denoiser(use_pallas=False, **DIMS)
    batch = make_features(False)
    feats = to_device(batch)
    trans = jnp.zeros(batch["atom_positions"].shape, jnp.float32)
    rots = frenet_frames(trans, feats["chain_index"], feats["residue_mask"])
    params = model.init(
        jax.random.PRNGKey(0), Rigid(rots, trans), jnp.array([1, 1]), feats
    )

    def paths(tree):
        return {
            jax.tree_util.keystr(p): tuple(l.shape)
            for p, l in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    assert paths(converted) == paths(params)
