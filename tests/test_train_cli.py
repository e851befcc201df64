"""The train CLI (genie2_tpu/cli/train.py) end-to-end on the CPU mesh.

The Trainer class is covered by test_train; this drives the actual CLI
entry (config file -> split -> packed cache -> Trainer -> checkpoints),
including the 3-D mesh config keys (meshData/meshSeq/meshModel) — the
full `genie2-train -c configuration` path a user runs, reference
counterpart /root/reference/genie/train.py.
"""

import argparse
import os

import numpy as np
import pytest

CONFIG = """\
name tcli
rootDirectory {root}
dataDirectory {data}
minimumNumResidues 10
maximumNumResidues 24
numTimesteps 8
singleFeatureDimension 16
pairFeatureDimension 8
positionalEmbeddingDimension 8
chainEmbeddingDimension 4
timestepEmbeddingDimension 8
templateDistanceNumBins 5
numPairTransformLayers 1
triangularMultiplicativeHiddenDimension 4
numStructureLayers 1
ipaHiddenDimension 4
ipaNumHeads 2
ipaNumQkPoints 2
ipaNumVPoints 2
remat False
seed 100
numEpoches 1
batchSize 4
logEverySteps 1
checkpointEveryEpoches 1
learningRate 1e-3
{extra}
"""


def _write_data(tmp_path, n=8):
    from genie2_tpu.features import create_empty_features, save_features_to_pdb

    data = tmp_path / "data"
    data.mkdir()
    rng = np.random.default_rng(0)
    for i in range(n):
        length = int(rng.integers(12, 24))
        f = create_empty_features([length])
        steps = rng.normal(size=(length, 3))
        steps /= np.linalg.norm(steps, axis=-1, keepdims=True)
        f["atom_positions"] = np.cumsum(3.8 * steps, axis=0).astype(np.float32)
        f["aatype"][:] = np.eye(f["aatype"].shape[-1])[rng.integers(0, 20, length)]
        save_features_to_pdb(f, str(data / f"walk_{i}.pdb"))
    return str(data)


def _run_cli(tmp_path, extra=""):
    from genie2_tpu.cli.train import main

    root = tmp_path / "runs"
    data = _write_data(tmp_path)
    cfg_path = tmp_path / "configuration"
    cfg_path.write_text(CONFIG.format(root=str(root), data=data, extra=extra))
    main(argparse.Namespace(
        config=str(cfg_path), test=False, resume=False,
        distributed=False, init_from=None,
    ))
    return root / "tcli"


@pytest.mark.slow
def test_train_cli_end_to_end(tmp_path, capsys):
    # batchSize 4 must divide the 'data' axis; the test env exposes 8
    # virtual devices, so pin meshData (the -1 default means all).
    workdir = _run_cli(tmp_path, extra="meshData 4\n")
    out = capsys.readouterr().out
    assert "dataset: " in out and "weighted_loss" in out
    # Checkpoints in the reference's training layout + persisted config.
    ckpt = workdir / "version_0" / "checkpoints" / "epoch=0.ckpt"
    assert ckpt.is_dir()
    assert (workdir / "configuration").exists()
    # Packed cache was built and used.
    assert (workdir / "parsed_cache" / "meta.json").exists()
    assert (workdir / "version_0" / "metrics.jsonl").exists()


@pytest.mark.slow
def test_train_cli_mesh3d_config_keys(tmp_path, capsys):
    """meshData/meshSeq/meshModel through the CLI: the Trainer builds the
    3-D mesh and the run completes with finite losses."""
    workdir = _run_cli(
        tmp_path, extra="meshData 2\nmeshSeq 2\nmeshModel 2\n"
    )
    out = capsys.readouterr().out
    assert "weighted_loss" in out
    assert (workdir / "version_0" / "checkpoints" / "epoch=0.ckpt").is_dir()
    import json

    losses = [
        json.loads(line)["weighted_loss"]
        for line in open(workdir / "version_0" / "metrics.jsonl")
        if json.loads(line).get("prefix", "train") == "train"
    ]
    assert losses and all(np.isfinite(losses))
