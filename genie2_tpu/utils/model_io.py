"""Model / checkpoint I/O.

Behavioral counterpart of /root/reference/genie/utils/model_io.py:9-173,
with the same two on-disk layouts:

  * training layout:  {rootdir}/{name}/version_{v}/checkpoints/epoch={E}.ckpt
  * release layout:   {rootdir}/{name}/checkpoints/epoch.{E}.ckpt

Checkpoints written by this framework are orbax directories named with the
same stem (epoch={E}.ckpt/); torch Lightning .ckpt FILES at either location
are loaded transparently through the weight converter, so the reference's
released checkpoints drop in unchanged. Configuration files use the
reference's `key value` grammar and are re-read at inference
(model_io.py:49-62).
"""

from __future__ import annotations

import glob
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from genie2_tpu.config import Config
from genie2_tpu.nn import Denoiser


def _epoch_of(path: str) -> Optional[int]:
    m = re.search(r"epoch[=.](\d+)\.ckpt", os.path.basename(path))
    return int(m.group(1)) if m else None


def get_versions(rootdir: str, name: str):
    basedir = os.path.join(rootdir, name)
    return sorted(
        int(d.split("_")[-1])
        for d in glob.glob(os.path.join(basedir, "version_*"))
    )


def get_epochs(rootdir: str, name: str, version: int):
    pattern = os.path.join(
        rootdir, name, f"version_{version}", "checkpoints", "*.ckpt*"
    )
    return sorted(
        e for e in (_epoch_of(p) for p in glob.glob(pattern)) if e is not None
    )


def load_config(rootdir: str, name: str) -> Config:
    return Config(os.path.join(rootdir, name, "configuration"))


def checkpoint_metadata(ckpt_path: str) -> Dict[str, Any]:
    """Sidecar metadata ({ckpt}.meta.json) written by the checkpoint
    converter: provenance + the rot_to_quat method the weights were
    trained with (BENCH_NOTES.md round-3 quat-sign study)."""
    import json

    meta_path = ckpt_path.rstrip("/") + ".meta.json"
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    return {}


def _apply_metadata(config: Config, model: Denoiser, ckpt_path: str, mesh):
    """Rebuild the model if the checkpoint's stamped metadata overrides a
    config default (today: rot_to_quat_method for torch-converted
    weights). A raw torch .ckpt FILE loaded without the converter gets
    the same eigh default the converter would have stamped — both ways of
    loading the reference's released weights must behave identically."""
    meta = checkpoint_metadata(ckpt_path)
    method = meta.get("rot_to_quat_method")
    if method is None and os.path.isfile(ckpt_path):
        method = "eigh"  # torch-trained weights (see quat-sign study)
    if method and method != config.tpu.get("rot_to_quat_method", "closed"):
        print(f"[model_io] checkpoint metadata selects rot_to_quat={method}")
        config.tpu["rot_to_quat_method"] = method
        model = Denoiser.from_config(config, mesh=mesh)
    return model


def init_params(model: Denoiser, config: Config, seed: int = 0):
    """Fresh parameters for a Denoiser (the reference's untrained fallback,
    model_io.py:64-77)."""
    import jax.numpy as jnp

    from genie2_tpu.features import batchify, create_empty_features, to_device
    from genie2_tpu.geometry import Rigid, frenet_frames

    length = min(32, config.io["max_n_res"])
    feats = to_device(batchify([create_empty_features([length])]))

    # One compiled program instead of thousands of eager dispatches (eager
    # round-trips are very slow on remote-compile backends).
    @jax.jit
    def _init(key):
        trans = jnp.zeros((1, length, 3), jnp.float32)
        rots = frenet_frames(trans, feats["chain_index"], feats["residue_mask"])
        return model.init(key, Rigid(rots, trans), jnp.array([1], jnp.int32), feats)

    return _init(jax.random.PRNGKey(seed))


def save_params(path: str, variables: Dict[str, Any]):
    """Save a variables pytree as an orbax checkpoint directory."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), variables, force=True)
    ckptr.wait_until_finished()


class AsyncSaver:
    """Non-blocking checkpoint writes (asyncCheckpoint config key).

    save() returns once orbax has snapshotted the tree; serialization and
    disk I/O proceed on orbax's background thread while training
    continues. Publication is atomic (tmp dir + rename), so a reader
    never sees a partial checkpoint — a crash mid-write just loses that
    save. A second save() first waits out any in-flight one (saves to the
    same path, e.g. resume_state, must serialize); wait() drains
    everything — call it before reading back or exiting.

    The reference has nothing comparable (Lightning's default checkpoint
    callback blocks the training loop for the whole write).

    Caveat (CPU hosts): issuing a FRESH XLA compilation after async saves
    have run segfaulted in native code on a 1-core CPU host (jax CPU
    backend_compile_and_load with orbax's writer machinery warm; observed
    in full test-suite runs, cache on and off). Training's natural order
    — the step compiles on its first call, checkpoints follow — never
    hits this; avoid introducing mid-training recompiles (new jit
    closures / new shapes) between async saves on CPU."""

    def __init__(self):
        import orbax.checkpoint as ocp

        self._ckptr = ocp.StandardCheckpointer()

    def save(self, path: str, variables: Dict[str, Any]):
        self._ckptr.wait_until_finished()
        self._ckptr.save(os.path.abspath(path), variables, force=True)

    def wait(self):
        self._ckptr.wait_until_finished()


def load_params(path: str, target: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Load either an orbax checkpoint directory or a torch Lightning .ckpt
    file (converted on the fly)."""
    if os.path.isfile(path):
        from genie2_tpu.utils.torch_convert import load_torch_checkpoint

        return load_torch_checkpoint(path)
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype), target
        )
        return ckptr.restore(os.path.abspath(path), abstract)
    return ckptr.restore(os.path.abspath(path))


def load_model(
    rootdir: str,
    name: str,
    version: Optional[int] = None,
    epoch: Optional[int] = None,
    mesh=None,
) -> Tuple[Denoiser, Dict[str, Any], Config]:
    """Training-layout loader with latest-version/epoch discovery and an
    untrained fallback (model_io.py:79-137). A mesh with a 'seq' axis turns
    on sequence-sharding constraints inside the model."""
    config = load_config(rootdir, name)
    model = Denoiser.from_config(config, mesh=mesh)

    versions = get_versions(rootdir, name)
    if version is None:
        if not versions:
            print("No checkpoint available (version); using untrained model")
            return model, init_params(model, config), config
        version = max(versions)
    else:
        assert version in versions, f"Missing checkpoint version: {version}"

    epochs = get_epochs(rootdir, name, version)
    if epoch is None:
        if not epochs:
            print("No checkpoint available (epoch); using untrained model")
            return model, init_params(model, config), config
        epoch = max(epochs)
    else:
        assert epoch in epochs, f"Missing checkpoint epoch: {epoch}"

    ckpt_dir = os.path.join(rootdir, name, f"version_{version}", "checkpoints")
    candidates = [
        p
        for p in sorted(glob.glob(os.path.join(ckpt_dir, f"epoch={epoch}.ckpt*")))
        if not p.endswith(".meta.json")  # converter sidecar, not a ckpt
    ]
    print(f"Loading checkpoint: {candidates[0]}")
    model = _apply_metadata(config, model, candidates[0], mesh)
    return model, load_params(candidates[0], init_params(model, config)), config


def load_pretrained_model(
    rootdir: str, name: str, epoch: int, ema: bool = False, mesh=None
) -> Tuple[Denoiser, Dict[str, Any], Config]:
    """Release-layout loader (model_io.py:139-173). With ema=True, loads the
    weight-EMA checkpoint the Trainer writes alongside the raw weights
    (`epoch.{E}.ema.ckpt`; the reference has no weight EMA at all). A mesh
    with a 'seq' axis turns on sequence-sharding constraints inside the
    model (long-context inference)."""
    config = load_config(rootdir, name)
    model = Denoiser.from_config(config, mesh=mesh)
    stem = f"epoch.{epoch}.ema.ckpt" if ema else f"epoch.{epoch}.ckpt"
    base = os.path.join(rootdir, name, "checkpoints", stem)
    if not os.path.exists(base):
        raise FileNotFoundError(f"Missing checkpoint: {base}")
    print(f"Loading checkpoint: {base}")
    model = _apply_metadata(config, model, base, mesh)
    return model, load_params(base, init_params(model, config)), config
