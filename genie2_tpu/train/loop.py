"""Training orchestration.

Behavioral counterpart of /root/reference/genie/train.py:14-82 (Lightning
Trainer + DDP + ModelCheckpoint + TB/wandb loggers), rebuilt as a plain loop
over the jitted data-parallel train step:

  * device mesh instead of DDP (parallel/mesh.py)
  * orbax checkpoints in the reference's training layout
    ({rootdir}/{name}/version_{v}/checkpoints/epoch={E}.ckpt/)
  * metrics as JSONL + stdout (no heavyweight logger dependencies; the
    metrics dict matches the reference's logged scalars, genie.py:106-118)
  * deterministic PRNG ladder: one fold per (epoch, step)
"""

from __future__ import annotations

import os
import shutil
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from genie2_tpu.config import Config
from genie2_tpu.diffusion import Schedule
from genie2_tpu.features import to_device
from genie2_tpu.nn import Denoiser
from genie2_tpu.parallel import create_mesh, replicate, shard_batch
from genie2_tpu.train.data import StructureDataset
from genie2_tpu.train.prefetch import prefetch
from genie2_tpu.train.state import (
    TrainState,
    create_train_state,
    make_train_scan_step,
    make_train_step,
)
from genie2_tpu.utils.model_io import init_params, load_params, save_params


class MetricsLogger:
    """stdout + LoggerSet (JSONL always; wandb via GENIE2_WANDB_PROJECT env,
    TensorBoard via GENIE2_TENSORBOARD=1 — both optional, matching the
    reference's TB+wandb pair, train.py:20-32)."""

    def __init__(self, logdir: str, log_every: int = 1):
        from genie2_tpu.utils.loggers import LoggerSet

        os.makedirs(logdir, exist_ok=True)
        self.log_every = log_every
        self._set = LoggerSet(
            logdir,
            wandb_project=os.environ.get("GENIE2_WANDB_PROJECT"),
            tensorboard=os.environ.get("GENIE2_TENSORBOARD") == "1",
        )

    def log(self, step: int, metrics: Dict, prefix: str = "train"):
        # The step cadence only thins the per-step train stream; epoch-level
        # records (val_loss) land on arbitrary steps and were silently
        # dropped whenever the epoch length wasn't a cadence multiple
        # (round-5 fix).
        if prefix == "train" and step % self.log_every != 0:
            return
        floats = {k: float(np.asarray(v)) for k, v in metrics.items()}
        self._set.log(step, floats, prefix)
        printable = " ".join(f"{k}={v:.4f}" for k, v in floats.items())
        print(f"[{prefix} step {step}] {printable}", flush=True)

    def finish(self):
        self._set.finish()


def _versions(basedir: str):
    return [
        int(d.split("_")[-1])
        for d in os.listdir(basedir)
        if d.startswith("version_") and d.split("_")[-1].isdigit()
    ] if os.path.isdir(basedir) else []


def next_version(basedir: str) -> int:
    versions = _versions(basedir)
    return max(versions) + 1 if versions else 0


def latest_version(basedir: str) -> Optional[int]:
    versions = _versions(basedir)
    return max(versions) if versions else None


class Trainer:
    """Epoch loop + checkpointing over the jitted DP train step."""

    def __init__(
        self,
        config: Config,
        model: Optional[Denoiser] = None,
        use_mesh: bool = True,
        version: Optional[int] = None,
        resume: bool = False,
        init_from: Optional[str] = None,
    ):
        self.config = config
        n_seq = config.tpu.get("mesh_seq", 1)
        n_model = config.tpu.get("mesh_model", 1)
        self.mesh = (
            create_mesh(
                config.tpu.get("mesh_data", -1), n_seq=n_seq, n_model=n_model
            )
            if use_mesh and (len(jax.devices()) > 1 or n_seq > 1 or n_model > 1)
            else None
        )
        self.model = model or Denoiser.from_config(config, mesh=self.mesh)
        self.schedule = Schedule.create(
            config.diffusion["n_timestep"], config.diffusion["schedule"]
        )

        name = config.io["name"] or "run"
        basedir = os.path.join(config.io["rootdir"], name)
        if version is None:
            # Resuming continues the latest existing version (the
            # reference's load_model picks max version_*, model_io.py:79-137);
            # a fresh run opens the next one.
            version = latest_version(basedir) if resume else None
            if version is None:
                version = next_version(basedir)
        self.version = version
        self.workdir = os.path.join(basedir, f"version_{self.version}")
        self.ckpt_dir = os.path.join(self.workdir, "checkpoints")
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.logger = MetricsLogger(
            self.workdir, log_every=config.training["log_every_n_step"]
        )

        # Non-blocking checkpoint writes (asyncCheckpoint config key):
        # orbax serializes + writes on a background thread while training
        # continues. save/restore below route through _save_tree and drain
        # via _ckpt_wait (fit() end, preemption, restore).
        self._saver = None
        if config.training.get("async_checkpoint", False):
            from genie2_tpu.utils.model_io import AsyncSaver

            self._saver = AsyncSaver()

        params = init_params(self.model, config, seed=config.training["seed"])
        if init_from:
            # Fine-tune: start from existing weights (orbax dir or torch
            # Lightning .ckpt via the converter) with a FRESH optimizer —
            # the reference's continue-training flow reloads weights the
            # same way (model_io.py:79-137 under train.py:50).
            print(f"[finetune] initializing weights from {init_from}", flush=True)
            params = load_params(init_from, jax.device_get(params))
        self.state, self._tx = create_train_state(
            params, config.optimization["lr"],
            ema_decay=config.training.get("ema_decay", 0.0),
        )
        if self.mesh is not None:
            self.state = self._place_state(self.state)
        self._step_fn = make_train_step(
            self.model,
            self.schedule,
            self._tx,
            config.training["condition_loss_weight"],
            compute_dtype=config.tpu.get("compute_dtype", "fp32"),
            ema_decay=config.training.get("ema_decay", 0.0),
        )
        self._scan_step_fn = None
        if config.training.get("scan_steps", 1) > 1:
            if self.mesh is not None:
                raise ValueError(
                    "scanSteps > 1 is single-device only for now (stacked "
                    "batches are not mesh-sharded); drop meshSeq/meshModel "
                    "or set scanSteps 1"
                )
            self._scan_step_fn = make_train_scan_step(
                self.model,
                self.schedule,
                self._tx,
                config.training["condition_loss_weight"],
                compute_dtype=config.tpu.get("compute_dtype", "fp32"),
                ema_decay=config.training.get("ema_decay", 0.0),
            )

    def _save_tree(self, path, tree):
        if self._saver is not None:
            self._saver.save(path, tree)
        else:
            save_params(path, tree)

    def _ckpt_wait(self):
        if self._saver is not None:
            self._saver.wait()

    def save_checkpoint(self, epoch: int):
        path = os.path.join(self.ckpt_dir, f"epoch={epoch}.ckpt")
        self._save_tree(path, jax.device_get(self.state.params))
        if self.state.ema is not None:
            self._save_tree(
                os.path.join(self.ckpt_dir, f"epoch={epoch}.ema.ckpt"),
                jax.device_get(self.state.ema),
            )
        return path

    # -------------------------------------------------------------- #
    # Full-state checkpointing (params + optimizer + position in the
    # data order): preemption-safe, STEP-granular resume, which the
    # reference lacks entirely (SURVEY.md §5 checkpoint/resume). RNG
    # needs no saving: every key is a pure fold_in of
    # (seed, epoch, step-in-epoch), and the data order is a pure
    # function of (seed, epoch, batch index) — see fit().
    # -------------------------------------------------------------- #

    def _promote_resume(self):
        """Fold a committed resume_state.new over resume_state.

        save_state always writes to the .new name: orbax's force=True
        overwrite DELETES the destination before the (possibly async)
        write commits, so saving straight onto resume_state would leave a
        window — the whole background-write duration with asyncCheckpoint
        on — where NO resume point exists on disk; a SIGKILL there (the
        preemption grace-period expiring) would destroy the only resume
        state. With the .new scheme a complete checkpoint exists at every
        instant: orbax commits .new atomically (tmp + rename), and this
        promote rmtree's the old copy only while the newer .new is
        already complete."""
        base = os.path.join(self.ckpt_dir, "resume_state")
        new = base + ".new"
        if os.path.isdir(new):
            if os.path.isdir(base):
                shutil.rmtree(base)
            os.replace(new, base)

    def save_state(self, epoch: int, step_in_epoch: int = 0):
        path = os.path.join(self.ckpt_dir, "resume_state")
        blob = {
            "params": jax.device_get(self.state.params),
            "opt_state": jax.device_get(self.state.opt_state),
            "step": int(self.state.step),
            "epoch": epoch,
            "step_in_epoch": step_in_epoch,
        }
        if self.state.ema is not None:
            blob["ema"] = jax.device_get(self.state.ema)
        # Land (and promote) any previous save first, then write to .new —
        # see _promote_resume for why never directly onto resume_state.
        self._ckpt_wait()
        self._promote_resume()
        self._save_tree(path + ".new", blob)
        return path

    def restore_state(self):
        """Restore a resume_state checkpoint if present; returns
        (start_epoch, start_step_in_epoch) or None."""
        self._ckpt_wait()  # an in-flight async save must land first
        self._promote_resume()
        path = os.path.join(self.ckpt_dir, "resume_state")
        if not os.path.isdir(path):
            return None
        target = {
            "params": jax.device_get(self.state.params),
            "opt_state": jax.device_get(self.state.opt_state),
            "step": 0,
            "epoch": 0,
            "step_in_epoch": 0,
        }
        if self.state.ema is not None:
            target["ema"] = jax.device_get(self.state.ema)
        blob = load_params(path, target)
        state = TrainState(
            params=blob["params"],
            opt_state=blob["opt_state"],
            step=jnp.asarray(blob["step"], jnp.int32),
            ema=blob.get("ema"),
        )
        self.state = (
            self._place_state(state)
            if self.mesh is not None
            else jax.tree_util.tree_map(jnp.asarray, state)
        )
        return int(blob["epoch"]), int(blob.get("step_in_epoch", 0))

    def _place_state(self, state):
        """Place a TrainState on the mesh: replicated for pure DP/seq
        meshes; weights + Adam moments sharded over 'model' when the mesh
        has a tensor-parallel axis (meshModel config key)."""
        if "model" in self.mesh.axis_names:  # size-1 axes dropped by create_mesh
            from genie2_tpu.parallel import place_train_state

            return place_train_state(state, self.mesh)
        return replicate(state, self.mesh)

    def _make_eval_step(self):
        """Built once, cached on the instance — a fresh jit per evaluate()
        call would recompile every validation epoch."""
        from genie2_tpu.diffusion import q_sample
        from genie2_tpu.geometry import Rigid, frenet_frames
        from genie2_tpu.train.loss import genie_loss

        model, schedule = self.model, self.schedule
        w = self.config.training["condition_loss_weight"]

        @jax.jit
        def eval_step(params, features, key):
            t_key, noise_key = jax.random.split(key)
            x0 = features["atom_positions"]
            t = jax.random.randint(t_key, (x0.shape[0],), 0, schedule.n_timestep) + 1
            mask = features["residue_mask"].astype(x0.dtype)[..., None]
            z = jax.random.normal(noise_key, x0.shape, x0.dtype) * mask
            trans_t = q_sample(schedule, x0, t, z)
            rots_t = frenet_frames(trans_t, features["chain_index"], features["residue_mask"])
            out = model.apply(params, Rigid(rots_t, trans_t), t, features)
            loss, _ = genie_loss(out["z"], z, features, w)
            return loss

        return eval_step

    def evaluate(self, dataset, batch_size: int, key, max_batches: int = 16):
        """Mean weighted loss over a validation dataset (the reference has
        no validation dataloader at all, data_module.py)."""
        if getattr(self, "_eval_fn", None) is None:
            self._eval_fn = self._make_eval_step()

        # A validation set smaller than the train batch would otherwise be
        # dropped entirely by drop_last and report nan.
        batch_size = max(1, min(batch_size, len(dataset)))
        rng = np.random.default_rng(0)
        losses = []
        for i, batch in enumerate(dataset.epoch(batch_size, rng, drop_last=True)):
            if i >= max_batches:
                break
            key, sub = jax.random.split(key)
            losses.append(float(self._eval_fn(self.state.params, to_device(batch), sub)))
        return float(np.mean(losses)) if losses else float("nan")

    def fit(
        self,
        dataset: StructureDataset,
        n_epoch: Optional[int] = None,
        resume: bool = False,
        val_dataset: Optional[StructureDataset] = None,
        save_state_every_n_step: int = 0,
    ):
        """Epoch loop. All randomness is a pure function of position:

          * step RNG     = fold_in(fold_in(PRNGKey(seed), epoch), batch_idx)
          * data order   = default_rng([seed, epoch]) + per-batch child seeds
          * val RNG      = fold_in(epoch_key, 2**30)

        so a run killed anywhere and resumed from resume_state reproduces
        the uninterrupted loss curve exactly (tests/test_train.py).
        `save_state_every_n_step` > 0 adds mid-epoch resume points on top of
        the per-checkpoint cadence.

        Preemption: fit() traps SIGTERM (the signal TPU preemptible/spot
        pods receive before eviction) and, at the next step boundary,
        saves resume_state and returns cleanly — so a preempted run
        restarted with --resume continues exactly where it left off with
        no save_state_every_n_step cadence needed. The reference has no
        preemption handling at all (Lightning DDP defaults; SURVEY §5
        failure-recovery row). The previous handler is restored on exit.
        """
        import signal

        cfg = self.config.training
        n_epoch = n_epoch if n_epoch is not None else cfg["n_epoch"]
        batch_size = cfg["batch_size"]
        scan_k = cfg.get("scan_steps", 1) if self._scan_step_fn is not None else 1
        base_key = jax.random.PRNGKey(cfg["seed"])
        start_epoch, start_batch = 0, 0
        if resume:
            restored = self.restore_state()
            if restored is not None:
                start_epoch, start_batch = restored
                print(
                    f"[resume] epoch {start_epoch}, batch {start_batch}, "
                    f"step {int(self.state.step)}",
                    flush=True,
                )

        def place(batch):
            # Runs on the prefetch thread: the host-side residue count plus
            # the (async) host->device transfer, both off the step loop.
            n_res = int(batch["residue_mask"].sum())
            device_batch = (
                shard_batch(batch, self.mesh)
                if self.mesh is not None
                else to_device(batch)
            )
            return n_res, device_batch

        preempt = {"signum": None}

        def _on_sigterm(signum, frame):
            # Just set the flag: the step loop saves at the next step
            # boundary (saving from inside a signal handler could tear a
            # half-written checkpoint out of an in-flight save_state).
            preempt["signum"] = signum

        # Sentinel (not None): signal.signal legitimately returns None when
        # the previous handler was installed outside Python — restoring
        # must still happen then (to SIG_DFL, the closest expressible),
        # or _on_sigterm would outlive fit() and swallow SIGTERM forever.
        no_trap = object()
        try:
            prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
        except ValueError:  # not the main thread; run without the trap
            prev_handler = no_trap

        depth = cfg.get("prefetch_depth", 2)
        residues_done = 0
        # Host-side mirror of state.step: fetching the device counter every
        # step would synchronize the dispatch queue (one int() per step) and
        # defeat the prefetch overlap entirely.
        step = int(self.state.step)
        t0 = time.perf_counter()
        # Instantaneous-throughput window (round 5): the old cumulative
        # residues_done/(t-t0) average folded compile/startup into every
        # later reading — the round-4 campaign's "66 ms/step" was largely
        # this artifact (the loop itself measures 37 ms, variant E of
        # tools/diagnose_train_gap.py). Rate is now computed between
        # consecutive logged steps.
        win_res, win_t = 0, t0

        # fold_in(epoch_key, b) issued per step is a separate device
        # dispatch; on the tunneled TPU each dispatch costs ~7-9 ms of
        # host-side issue time (diagnose_train_gap variant E). Precompute
        # the identical keys in CHUNKed one-dispatch batches and hand the
        # step a host-resident (2,) uint32 key that rides the step's own
        # call — byte-identical RNG stream, one fewer dispatch per step.
        KEY_CHUNK = 512

        def key_table(epoch_key, start):
            ks = jax.vmap(lambda b: jax.random.fold_in(epoch_key, b))(
                start + jnp.arange(KEY_CHUNK)
            )
            return np.asarray(jax.device_get(ks))

        try:
            for epoch in range(start_epoch, n_epoch):
                epoch_key = jax.random.fold_in(base_key, epoch)
                data_rng = np.random.default_rng([cfg["seed"], epoch])
                skip = start_batch if epoch == start_epoch else 0
                keys = key_table(epoch_key, skip)
                keys_start = skip

                def log_window(step_i, metrics_i):
                    nonlocal win_res, win_t
                    now = time.perf_counter()
                    metrics_i["residues_per_s"] = (
                        (residues_done - win_res) / (now - win_t)
                    )
                    win_res, win_t = residues_done, now
                    self.logger.log(step_i, metrics_i)

                if scan_k > 1:
                    # K steps per dispatch (scanSteps>1): group K numpy
                    # batches, stack on the prefetch thread, run the
                    # lax.scan step. A short tail group (< K) falls back
                    # to the single-step program.
                    def grouped_epoch():
                        buf = []
                        for np_batch in dataset.epoch(
                            batch_size, data_rng, start_batch=skip
                        ):
                            buf.append(np_batch)
                            if len(buf) == scan_k:
                                yield buf
                                buf = []
                        if buf:
                            yield buf

                    def place_group(group):
                        n_res = sum(int(g["residue_mask"].sum()) for g in group)
                        if len(group) == scan_k:
                            stacked = {
                                k2: np.stack([g[k2] for g in group])
                                for k2 in group[0]
                            }
                            return len(group), n_res, to_device(stacked)
                        return len(group), n_res, [to_device(g) for g in group]

                    batches = prefetch(grouped_epoch(), place_group, depth)
                else:
                    batches = prefetch(
                        dataset.epoch(batch_size, data_rng, start_batch=skip),
                        place,
                        depth,
                    )
                try:
                    if scan_k > 1:
                        b_cur = skip
                        for k_eff, n_res, placed in batches:
                            if b_cur - keys_start + k_eff > KEY_CHUNK:
                                keys = key_table(epoch_key, b_cur)
                                keys_start = b_cur
                            off = b_cur - keys_start
                            kslice = keys[off : off + k_eff]
                            scan_metrics = last_metrics = None
                            if isinstance(placed, list):  # tail group
                                for i, db in enumerate(placed):
                                    self.state, last_metrics = self._step_fn(
                                        self.state, db, kslice[i]
                                    )
                            else:
                                self.state, scan_metrics = self._scan_step_fn(
                                    self.state, placed, kslice
                                )
                            step0 = step
                            step += k_eff
                            residues_done += n_res
                            for i in range(k_eff):
                                s_i = step0 + i + 1
                                if s_i % self.logger.log_every != 0:
                                    continue
                                if scan_metrics is not None:
                                    log_window(
                                        s_i,
                                        {k2: v[i] for k2, v in scan_metrics.items()},
                                    )
                                elif i == k_eff - 1:  # tail: last step only
                                    log_window(s_i, dict(last_metrics))
                            b_cur += k_eff
                            if save_state_every_n_step and (
                                b_cur // save_state_every_n_step
                                > (b_cur - k_eff) // save_state_every_n_step
                            ):
                                self.save_state(epoch, b_cur)
                            if preempt["signum"] is not None:
                                path = self.save_state(epoch, b_cur)
                                print(
                                    f"[preempt] signal {preempt['signum']}: saved "
                                    f"{path} (epoch {epoch}, batch {b_cur}, step "
                                    f"{step}); exiting cleanly — restart with "
                                    "--resume",
                                    flush=True,
                                )
                                return self.state
                    else:
                        for b, (n_res, device_batch) in enumerate(batches, start=skip):
                            if b - keys_start >= KEY_CHUNK:
                                keys = key_table(epoch_key, b)
                                keys_start = b
                            step_key = keys[b - keys_start]
                            self.state, metrics = self._step_fn(self.state, device_batch, step_key)
                            step += 1
                            residues_done += n_res
                            if step % self.logger.log_every == 0:
                                log_window(step, dict(metrics))
                            if save_state_every_n_step and (b + 1) % save_state_every_n_step == 0:
                                self.save_state(epoch, b + 1)
                            if preempt["signum"] is not None:
                                path = self.save_state(epoch, b + 1)
                                print(
                                    f"[preempt] signal {preempt['signum']}: saved "
                                    f"{path} (epoch {epoch}, batch {b + 1}, step "
                                    f"{step}); exiting cleanly — restart with "
                                    "--resume",
                                    flush=True,
                                )
                                return self.state
                finally:
                    if hasattr(batches, "close"):
                        batches.close()
                if val_dataset is not None:
                    val_key = jax.random.fold_in(epoch_key, 2**30)
                    val_loss = self.evaluate(val_dataset, batch_size, val_key)
                    self.logger.log(step, {"val_loss": val_loss}, prefix="val")
                if (epoch + 1) % cfg["checkpoint_every_n_epoch"] == 0 or epoch == n_epoch - 1:
                    path = self.save_checkpoint(epoch)
                    self.save_state(epoch + 1, 0)
                    print(f"[checkpoint] epoch {epoch} -> {path}", flush=True)
        finally:
            if prev_handler is not no_trap:
                signal.signal(
                    signal.SIGTERM,
                    prev_handler if prev_handler is not None else signal.SIG_DFL,
                )
            # Drain async checkpoint writes and promote the last resume
            # point to its canonical name: fit() returning (or raising)
            # means every checkpoint it reported is durably on disk.
            self._ckpt_wait()
            self._promote_resume()
        return self.state
