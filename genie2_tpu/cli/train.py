"""Training CLI.

Counterpart of /root/reference/genie/train.py: `python -m genie2_tpu.cli.train
-c CONFIG [-t]`. Devices come from the jax runtime (one process drives the
whole mesh — no Lightning-style process spawning; multi-host runs call
jax.distributed.initialize() via --distributed).
"""

from __future__ import annotations

import argparse
import os
import shutil

import jax


def main(args):
    if args.distributed:
        jax.distributed.initialize()

    from genie2_tpu.config import Config
    from genie2_tpu.train.data import (
        MotifAugmentConfig,
        StructureDataset,
        resolve_filepath,
        setup_split,
    )
    from genie2_tpu.train.loop import Trainer

    config = Config(args.config)
    name = config.io["name"] or "run"

    train_names, val_names = setup_split(
        rootdir=config.io["rootdir"],
        name=name,
        datadir=config.io["datadir"],
        min_n_res=config.io["min_n_res"],
        max_n_res=config.io["max_n_res"],
        max_n_chain=config.io["max_n_chain"],
        validation_split=config.io["validation_split"],
        seed=config.training["seed"],
    )

    def build_dataset(names, cache_name, limit=None):
        filepaths = [
            p
            for p in (resolve_filepath(config.io["datadir"], n) for n in names)
            if p is not None
        ]
        if limit:
            filepaths = filepaths[:limit]
        if not filepaths:
            return None
        return StructureDataset(
            filepaths,
            max_n_res=config.io["max_n_res"],
            max_n_chain=config.io["max_n_chain"],
            motif=MotifAugmentConfig.from_config(config),
            cache_path=os.path.join(config.io["rootdir"], name, cache_name),
        )

    # Packed on-disk cache (memmap-backed, corpus-scale) is the default.
    # --test runs get their own cache name (they see a 16-file subset; the
    # packed cache also fingerprints its corpus, so a mismatched cache
    # would be rebuilt rather than silently served). A pre-existing
    # round-2 .npz cache at the legacy name is still honored.
    limit = 16 if args.test else None

    def cache_name(base):
        if limit:
            return f"{base}_test"
        legacy = os.path.join(config.io["rootdir"], name, f"{base}.npz")
        return f"{base}.npz" if os.path.exists(legacy) else base

    dataset = build_dataset(train_names, cache_name("parsed_cache"), limit)
    if dataset is None:
        raise FileNotFoundError(
            f"no training structures found under {config.io['datadir']!r} "
            f"(split listed {len(train_names)} names)"
        )
    val_dataset = build_dataset(
        val_names or [], cache_name("parsed_cache_val"), limit
    )
    print(
        f"dataset: {len(dataset)} train / "
        f"{len(val_dataset) if val_dataset else 0} val structures on "
        f"{len(jax.devices())} device(s)"
    )

    trainer = Trainer(
        config, resume=args.resume, init_from=getattr(args, "init_from", None)
    )
    # Persist the configuration next to the checkpoints, as the reference
    # does (re-read at inference; model_io.py:49-62).
    shutil.copyfile(
        args.config, os.path.join(config.io["rootdir"], name, "configuration")
    )
    trainer.fit(
        dataset,
        resume=args.resume,
        val_dataset=val_dataset,
        save_state_every_n_step=config.training["save_state_every_n_step"],
    )


def cli():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str, required=True,
                        help="Path for configuration file")
    parser.add_argument("-t", "--test", action="store_true", default=False,
                        help="Enable test mode (16-structure subset)")
    parser.add_argument("--resume", action="store_true", default=False,
                        help="Continue from the latest version's resume_state "
                             "(step-granular; reproduces the uninterrupted run)")
    parser.add_argument("--distributed", action="store_true", default=False,
                        help="Initialize jax.distributed (multi-host)")
    parser.add_argument("--init_from", type=str, default=None,
                        help="Fine-tune: initialize weights from a checkpoint "
                             "(orbax dir or torch Lightning .ckpt), fresh "
                             "optimizer state")
    main(parser.parse_args())


if __name__ == "__main__":
    cli()
