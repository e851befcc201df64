"""Synthetic protein-backbone corpus generator (flagship campaign phase 0).

This environment has zero egress, so the flagship-dims training campaign
(tools/flagship_campaign.sh) trains on synthetic CA traces instead of a
fetched AFDB subset (tools/fetch_afdb.py is the networked path; the packed
cache and training stack are identical either way). Structures are mixed
secondary-structure backbones — ideal alpha-helix and beta-strand segments
joined by random-coil loops, each segment rigidly rotated to a random
orientation and chained at the 3.8 Å CA-CA bond — so helix/strand content,
bond statistics, and radius of gyration are meaningful signals for the
quality battery (tools/eval_designs.py, tools/sampler_quality.py).

Usage: python tools/make_synthetic_corpus.py OUTDIR [n=4000] [min_len=20]
       [max_len=256] [seed=0]
Writes OUTDIR/synth_{i:06d}.pdb (CA-only, the training pipeline's input
grammar) — ~4k structures/min.
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _rotation(rng) -> np.ndarray:
    """Uniform random rotation (QR of a Gaussian, sign-fixed)."""
    q, r = np.linalg.qr(rng.normal(size=(3, 3)))
    q *= np.sign(np.diag(r))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return q


def _helix(n: int) -> np.ndarray:
    t = np.arange(n) * np.radians(100.0)
    return np.stack(
        [2.3 * np.cos(t), 2.3 * np.sin(t), 1.5 * np.arange(n)], axis=-1
    )


def _strand(n: int) -> np.ndarray:
    x = np.arange(n) * 3.3
    y = np.where(np.arange(n) % 2 == 0, 0.0, 0.9)
    return np.stack([x, y, np.zeros(n)], axis=-1)


def _loop(n: int, rng) -> np.ndarray:
    steps = rng.normal(size=(n, 3))
    steps /= np.linalg.norm(steps, axis=-1, keepdims=True)
    # Mild persistence so loops wander instead of balling up.
    for i in range(1, n):
        steps[i] = 0.5 * steps[i - 1] + 0.5 * steps[i]
        steps[i] /= np.linalg.norm(steps[i])
    return np.cumsum(3.8 * steps, axis=0)


def make_backbone(length: int, rng) -> np.ndarray:
    """One mixed-SSE CA trace of exactly `length` residues."""
    pieces = []
    placed = 0
    end = np.zeros(3)
    while placed < length:
        kind = rng.choice(["helix", "strand", "loop"], p=[0.45, 0.25, 0.30])
        n = int(
            rng.integers(*{"helix": (6, 20), "strand": (4, 10), "loop": (2, 8)}[kind])
        )
        n = min(n, length - placed)
        seg = {"helix": _helix, "strand": _strand}.get(kind, lambda m: _loop(m, rng))(n)
        seg = (seg - seg[0]) @ _rotation(rng).T
        # Chain at a 3.8 Å bond in a random direction off the last CA.
        if pieces:
            d = rng.normal(size=3)
            seg = seg + end + 3.8 * d / np.linalg.norm(d)
        pieces.append(seg)
        end = seg[-1]
        placed += n
    xyz = np.concatenate(pieces)
    return xyz - xyz.mean(0)


def main(outdir: str, n: int = 4000, min_len: int = 20, max_len: int = 256,
         seed: int = 0):
    from genie2_tpu.features import create_empty_features, save_features_to_pdb

    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        length = int(rng.integers(min_len, max_len + 1))
        feats = create_empty_features([length])
        feats["atom_positions"] = make_backbone(length, rng).astype(np.float32)
        feats["aatype"][:] = np.eye(feats["aatype"].shape[-1])[
            rng.integers(0, 20, length)
        ]
        save_features_to_pdb(feats, os.path.join(outdir, f"synth_{i:06d}.pdb"))
        if (i + 1) % 1000 == 0:
            print(f"[corpus] {i + 1}/{n}", file=sys.stderr, flush=True)
    print(f"[corpus] wrote {n} structures to {outdir}", flush=True)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(
        a[0],
        n=int(a[1]) if len(a) > 1 else 4000,
        min_len=int(a[2]) if len(a) > 2 else 20,
        max_len=int(a[3]) if len(a) > 3 else 256,
        seed=int(a[4]) if len(a) > 4 else 0,
    )
