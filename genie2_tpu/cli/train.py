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

    train_names, _ = setup_split(
        rootdir=config.io["rootdir"],
        name=name,
        datadir=config.io["datadir"],
        min_n_res=config.io["min_n_res"],
        max_n_res=config.io["max_n_res"],
        max_n_chain=config.io["max_n_chain"],
        validation_split=config.io["validation_split"],
        seed=config.training["seed"],
    )
    filepaths = [
        p
        for p in (resolve_filepath(config.io["datadir"], n) for n in train_names)
        if p is not None
    ]
    if args.test:
        filepaths = filepaths[:16]

    dataset = StructureDataset(
        filepaths,
        max_n_res=config.io["max_n_res"],
        max_n_chain=config.io["max_n_chain"],
        motif=MotifAugmentConfig.from_config(config),
        cache_path=os.path.join(config.io["rootdir"], name, "parsed_cache.npz"),
    )
    print(f"dataset: {len(dataset)} structures on {len(jax.devices())} device(s)")

    trainer = Trainer(config)
    # Persist the configuration next to the checkpoints, as the reference
    # does (re-read at inference; model_io.py:49-62).
    shutil.copyfile(
        args.config, os.path.join(config.io["rootdir"], name, "configuration")
    )
    trainer.fit(dataset)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str, required=True,
                        help="Path for configuration file")
    parser.add_argument("-t", "--test", action="store_true", default=False,
                        help="Enable test mode (16-structure subset)")
    parser.add_argument("--distributed", action="store_true", default=False,
                        help="Initialize jax.distributed (multi-host)")
    main(parser.parse_args())
