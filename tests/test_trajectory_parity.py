"""Whole-trajectory parity vs the torch reference with injected noise.

RNG streams can't match across frameworks, so the parity harness fixes the
randomness: identical x_T and per-step noise are fed to (a) the torch
reference's reverse-update equations (base.py:236-282, written out below
with the reference's own schedule tensors) and (b) the jitted scan
(ancestral_sample_injected). Coordinates must track within tolerance over
the full trajectory — this is the BASELINE.md 'fixed-seed trajectory'
parity gate, scaled down to a test-sized model/schedule.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from genie2_tpu.diffusion import Schedule
from genie2_tpu.features import batchify, create_empty_features, to_device
from genie2_tpu.nn import Denoiser
from genie2_tpu.sampling import ancestral_sample_injected
from genie2_tpu.utils.torch_convert import convert_torch_state_dict
from tests.test_parity_torch import DIMS, torch_closed_form_rot_to_quat, torch_features


def torch_reference_trajectory(torch_model, tf, init_trans, noises, scale, n_timestep):
    """The reference sampler's reverse loop, torch ops, schedule from
    ddpm.py:36-66 / update equations from base.py:236-282."""
    from genie.diffusion.schedule import get_betas
    from genie.utils.affine_utils import T as TorchT
    from genie.utils.geo_utils import compute_frenet_frames

    betas = get_betas(n_timestep, "cosine")
    alphas = 1.0 - betas
    alphas_cumprod = torch.cumprod(alphas, 0)
    sqrt_alphas = torch.sqrt(alphas)
    sqrt_betas = torch.sqrt(betas)
    sqrt_one_minus_alphas_cumprod = torch.sqrt(1.0 - alphas_cumprod)

    num_samples = init_trans.shape[0]
    mask = tf["residue_mask"]
    trans = init_trans.clone()
    trajectory = []
    with torch.no_grad():
        for i, step in enumerate(range(n_timestep, 0, -1)):
            timesteps = torch.tensor([step] * num_samples).int()
            rots = compute_frenet_frames(trans, tf["chain_index"], mask)
            z_pred = torch_model(TorchT(rots, trans), timesteps, tf)["z"]
            w_z = (1.0 - alphas[timesteps]) / sqrt_one_minus_alphas_cumprod[timesteps]
            trans_mean = (1.0 / sqrt_alphas[timesteps]).view(-1, 1, 1) * (
                trans - w_z.view(-1, 1, 1) * z_pred
            )
            trans_mean = trans_mean * mask.unsqueeze(-1)
            if step == 1:
                trans = trans_mean
            else:
                sigma = sqrt_betas[timesteps].view(-1, 1, 1)
                trans = trans_mean + scale * sigma * noises[i]
                trans = trans * mask.unsqueeze(-1)
            trajectory.append(trans.clone())
    return trans, torch.stack(trajectory)


def test_injected_noise_trajectory_parity():
    from genie.model.model import Denoiser as TorchDenoiser
    import genie.model.pair_feature_net as ref_pfn

    ref_pfn.rot_to_quat = torch_closed_form_rot_to_quat

    n_timestep = 20
    dims = dict(DIMS)
    dims["n_timestep"] = n_timestep
    torch.manual_seed(3)
    torch_model = TorchDenoiser(**dims)
    torch_model.eval()

    batch = batchify([create_empty_features([24]) for _ in range(2)])
    rng = np.random.default_rng(0)
    init_trans = rng.normal(size=batch["atom_positions"].shape).astype(np.float32)
    noises = rng.normal(size=(n_timestep, *init_trans.shape)).astype(np.float32)
    scale = 0.6

    # Torch reference.
    tf = torch_features(batch)
    final_t, traj_t = torch_reference_trajectory(
        torch_model, tf, torch.tensor(init_trans), torch.tensor(noises), scale, n_timestep
    )

    # Ours with converted weights and the same noise.
    model = Denoiser(use_pallas=False, **dims)
    variables = jax.tree_util.tree_map(
        jnp.asarray, convert_torch_state_dict(torch_model.state_dict())
    )
    schedule = Schedule.create(n_timestep)
    feats = to_device(batch)
    final_j, traj_j = ancestral_sample_injected(
        model.apply,
        variables,
        schedule,
        feats,
        jnp.asarray(init_trans),
        jnp.asarray(noises),
        jnp.float32(scale),
    )

    np.testing.assert_allclose(
        np.asarray(traj_j), traj_t.numpy(), atol=5e-4,
        err_msg="trajectories diverge",
    )
    np.testing.assert_allclose(np.asarray(final_j), final_t.numpy(), atol=5e-4)
