"""Checkpoint conversion CLI: torch Lightning .ckpt -> orbax directory.

The loaders already convert torch checkpoints transparently on every load
(utils/model_io.load_params); this CLI does the conversion ONCE so
production inference never pays the torch import + conversion cost, and
torch stops being a runtime dependency:

    python -m genie2_tpu.cli.convert_checkpoint epoch.30.ckpt epoch.30.orbax.ckpt

The output directory drops into either checkpoint layout (rename to
`epoch.{E}.ckpt` in a release `checkpoints/` dir). Counterpart of the
reference's Lightning `load_from_checkpoint` distribution flow
(model_io.py:137-173 + git-LFS .ckpt files) for a jax-native deployment.
"""

from __future__ import annotations

import argparse
import os


def run(args):
    import json

    import jax

    from genie2_tpu.utils.model_io import save_params
    from genie2_tpu.utils.torch_convert import load_torch_checkpoint

    if not os.path.isfile(args.src):
        raise FileNotFoundError(args.src)
    variables = load_torch_checkpoint(args.src)
    n_arrays = len(jax.tree_util.tree_leaves(variables))
    n_params = sum(
        x.size for x in jax.tree_util.tree_leaves(variables)
    )
    save_params(args.dst, variables)
    # Stamp provenance so the loaders select the reference-compatible
    # rot_to_quat method (eigen-decomposition) for these weights. The
    # round-3 quat-sign study (tools/quat_sign_study.py, BENCH_NOTES.md)
    # shows torch-eigh signs are LAPACK-arbitrary (~51% agreement with any
    # convention), so NO jax method reproduces them exactly; "eigh" is the
    # measured-closest (~58%) and matches the reference's algorithm.
    meta_path = args.dst.rstrip("/") + ".meta.json"
    with open(meta_path, "w") as f:
        json.dump(
            {
                "source": "torch_lightning",
                "source_file": os.path.basename(args.src),
                "rot_to_quat_method": "eigh",
            },
            f,
        )
    print(
        f"converted {args.src} -> {args.dst}: "
        f"{n_arrays} arrays, {n_params:,} parameters "
        f"(metadata: {os.path.basename(meta_path)})",
        flush=True,
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("src", help="torch Lightning .ckpt (or raw state_dict)")
    parser.add_argument("dst", help="output orbax checkpoint directory")
    run(parser.parse_args())


if __name__ == "__main__":
    main()
