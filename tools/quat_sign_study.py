"""Quaternion-sign study on realistic pair-orientation inputs.

Settles the trained-weight contingency (round-2 VERDICT Weak #4): the
reference's PairFeatureNet feeds quaternions of R_i @ R_j Frenet products
through torch.linalg.eigh (affine_utils.py:336-355), whose eigenvector
signs are LAPACK-arbitrary; this framework's default is a closed-form
extraction with a canonical sign (largest-|component| positive,
geometry/quat.py). If the released trained weights ever load, which
rot_to_quat method should inference use?

This tool measures, on REALISTIC inputs (Frenet R_i @ R_j products of
protein-like random-walk CA traces at several diffusion noise levels —
not random rotations):

  1. value agreement |q_a . q_b| ~ 1 for all method pairs (sanity: the
     quaternions agree up to sign);
  2. sign agreement of torch-eigh vs (a) jax closed-canonical,
     (b) jax eigh, (c) torch-eigh-then-canonicalized;
  3. whether torch-eigh's sign is itself predictable from the canonical
     convention (if (c) is ~100%, canonicalizing torch's output is a
     faithful proxy, and the question reduces to how often torch's raw
     sign equals canonical).

Output: a table for BENCH_NOTES.md. CPU-only (torch is CPU in this image).

Usage: python tools/quat_sign_study.py [n_structures] [length]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

from genie2_tpu.geometry import frenet_frames, rot_to_quat  # noqa: E402
from genie2_tpu.geometry.quat import _k_matrix  # noqa: E402


def realistic_coords(rng, n, length):
    """Protein-like CA random walks: 3.8 A steps with directional
    persistence (the distribution sampled trajectories converge toward)."""
    out = np.zeros((n, length, 3))
    for i in range(n):
        d = rng.normal(size=3)
        pts = [np.zeros(3)]
        for _ in range(length - 1):
            d = 0.7 * d + 0.3 * rng.normal(size=3)
            d /= np.linalg.norm(d)
            pts.append(pts[-1] + 3.8 * d)
        out[i] = np.stack(pts) - np.mean(pts, axis=0)
    return out


def noisy(coords, rng, frac):
    """Interpolate toward scaled Gaussian noise: frac=0 clean, 1 pure
    noise (the q_sample continuum a reverse trajectory traverses)."""
    return np.sqrt(1 - frac) * coords + np.sqrt(frac) * rng.normal(
        size=coords.shape
    ) * 10.0


def pair_products(coords):
    """Frenet frames -> R_i @ R_j pair products [B, N, N, 3, 3] (the
    reference's convention, pair_feature_net.py:286-291)."""
    B, N, _ = coords.shape
    chain = jnp.zeros((B, N), jnp.int32)
    mask = jnp.ones((B, N), jnp.int32)
    rots = frenet_frames(jnp.asarray(coords, jnp.float32), chain, mask)
    r = jnp.matmul(rots[:, None, :, :, :], rots[:, :, None, :, :])
    return np.asarray(r).reshape(-1, 3, 3)


def torch_eigh_quat(rots):
    """The reference's extraction: largest-eigenvalue eigenvector of the
    Davenport K matrix via torch.linalg.eigh (affine_utils.py:336-355)."""
    k = np.asarray(_k_matrix(jnp.asarray(rots)))
    _, vec = torch.linalg.eigh(torch.from_numpy(k))
    return vec[..., -1].numpy()


def canonicalize(q):
    """Largest-|component|-positive sign convention (geometry/quat.py)."""
    lead = np.take_along_axis(q, np.argmax(np.abs(q), axis=-1)[..., None], -1)
    return q * np.sign(lead)


def sign_agreement(qa, qb):
    """Fraction of quaternions with the same sign (after checking the
    values agree up to sign)."""
    dots = np.abs(np.sum(qa * qb, axis=-1))
    value_ok = float(np.mean(dots > 0.999))
    same_sign = float(np.mean(np.sum(qa * qb, axis=-1) > 0))
    return value_ok, same_sign


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    length = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    rng = np.random.default_rng(0)
    clean = realistic_coords(rng, n, length)

    print(f"# {n} structures x L={length} -> {n * length * length} pair quats per row")
    print("| noise frac | torch-eigh vs closed-canonical | torch-eigh vs jax-eigh"
          " | canon(torch-eigh) vs closed-canonical |")
    print("|---|---|---|---|")
    for frac in (0.0, 0.25, 0.5, 0.9, 1.0):
        coords = noisy(clean, np.random.default_rng(1), frac)
        rots = pair_products(coords)
        q_torch = torch_eigh_quat(rots)
        q_closed = np.asarray(rot_to_quat(jnp.asarray(rots), method="closed"))
        q_jeigh = np.asarray(rot_to_quat(jnp.asarray(rots), method="eigh"))

        v1, s1 = sign_agreement(q_torch, q_closed)
        v2, s2 = sign_agreement(q_torch, q_jeigh)
        v3, s3 = sign_agreement(canonicalize(q_torch), q_closed)
        print(
            f"| {frac:.2f} | {s1 * 100:5.1f}% (values {v1 * 100:.1f}%) "
            f"| {s2 * 100:5.1f}% (values {v2 * 100:.1f}%) "
            f"| {s3 * 100:5.1f}% (values {v3 * 100:.1f}%) |"
        )

    os._exit(0)


if __name__ == "__main__":
    main()
