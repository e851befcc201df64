"""Sampler orchestration.

Keeps the reference's template-method API surface
(/root/reference/genie/sampler/base.py:15-323: setup / on_sample_start /
create_features / on_sample_end, required-parameter validation) while the
inner loop is the single jitted scan from genie2_tpu.sampling.ddpm.
"""

from __future__ import annotations

import os
from abc import ABC, abstractmethod
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from genie2_tpu.diffusion import Schedule
from genie2_tpu.features import batchify, debatchify, to_device, to_host
from genie2_tpu.sampling.ddpm import (
    ancestral_sample,
    ancestral_sample_with_trajectory,
    ddim_sample,
    eta_schedule_below,
)
from genie2_tpu.sampling.dpm_solver import dpm_solver_sample


def bucket_length(n: int, multiple: int = 32) -> int:
    """Round a sequence length up to a bucket so XLA compiles once per
    bucket instead of once per length (the reference re-enters the Python
    loop per length; we re-enter a cached executable per bucket)."""
    return max(multiple, ((n + multiple - 1) // multiple) * multiple)


class BaseSampler(ABC):
    """Template-method sampler over a jitted reverse-diffusion scan."""

    def __init__(
        self,
        model,
        params,
        config,
        bucket: int = 32,
        compute_dtype: Optional[str] = None,
        mesh=None,
    ):
        from genie2_tpu.nn.policy import cast_floating, make_apply_fn

        self.model = model
        self.config = config
        self.schedule = Schedule.create(
            config.diffusion["n_timestep"], config.diffusion["schedule"]
        )
        self.bucket = bucket
        self.compute_dtype = compute_dtype or config.tpu.get("compute_dtype", "fp32")
        # Pre-cast params once so the scan body doesn't re-cast per step.
        if self.compute_dtype in ("bf16", "bfloat16"):
            self.params = cast_floating(params, jnp.bfloat16)
        else:
            self.params = params
        # Multi-device: params replicated over the mesh, sample batches
        # sharded over the 'data' axis (replaces the reference's
        # process-per-GPU fan-out, multiprocessor.py:59-100). Per-sample RNG
        # in the reverse scan makes sharded outputs bit-identical to
        # single-device outputs (tests/test_cli.py).
        self.mesh = mesh
        if mesh is not None:
            if "model" in mesh.axis_names:  # size-1 axes dropped by create_mesh
                # Tensor parallelism: weights sharded over the 'model'
                # axis (parallel/tensor_parallel.py); activations follow
                # via GSPMD. Outputs are allclose (not bit-identical) to
                # single-device — psum changes the reduction order.
                from genie2_tpu.parallel import place_params

                self.params = place_params(self.params, mesh)
            else:
                from genie2_tpu.parallel import replicate

                self.params = replicate(self.params, mesh)
        self.apply_fn = make_apply_fn(model, self.compute_dtype, cast_params=False)
        self._static_bias_fn = self._build_static_bias_fn()
        self.required = ["scale", "outdir", "num_samples", "prefix", "offset"]
        self.setup()

    def _build_static_bias_fn(self):
        """Jitted computation of the step-invariant pair-feature bias
        (relpos + motif template), hoisted out of the reverse loop."""
        from genie2_tpu.nn.feature_nets import PairFeatureNet

        m = self.model
        pfn = PairFeatureNet(
            c_s=m.c_s,
            c_p=m.c_p,
            n_timestep=m.n_timestep,
            relpos_k=m.relpos_k,
            template_dist_min=m.template_dist_min,
            template_dist_step=m.template_dist_step,
            template_dist_n_bin=m.template_dist_n_bin,
            quat_method=m.quat_method,
        )
        out_dtype = (
            jnp.bfloat16 if self.compute_dtype in ("bf16", "bfloat16") else jnp.float32
        )

        @jax.jit
        def fn(params, feats):
            sub = {"params": params["params"]["pair_feature_net"]}
            bias = pfn.apply(sub, feats, method=PairFeatureNet.static_bias)
            return bias.astype(out_dtype)

        return fn

    def _write_trajectory(
        self, params: Dict[str, Any], snapshots, snap_steps, n_res: int
    ):
        """x_t snapshot PDBs in the reference's test/ fixture filename
        grammar (xt_predicted_test_{step}.pdb, sample 0 of the batch —
        smc_sampler_new_new.py:802-812). Each sample() call gets its own
        `test/{prefix}_{offset}/` subdir so batches/lengths in a sweep
        don't clobber each other, and snapshots are trimmed to the real
        (unpadded) residue count."""
        from genie2_tpu.features import save_coords_to_pdb

        dump_dir = os.path.join(
            params["outdir"], "test", f"{params['prefix']}_{params['offset']}"
        )
        os.makedirs(dump_dir, exist_ok=True)
        for step, snap in zip(snap_steps, snapshots):
            save_coords_to_pdb(
                np.asarray(snap[0][:n_res]),
                os.path.join(dump_dir, f"xt_predicted_test_{step}.pdb"),
            )

    def _cfg_apply_fn(self, strength: float):
        """Classifier-free-guidance wrapper around apply_fn, cached per
        strength so the jitted reverse scan compiles once per value (the
        scan treats apply_fn as a static argument)."""
        cache = getattr(self, "_cfg_cache", None)
        if cache is None:
            cache = self._cfg_cache = {}
        if strength not in cache:
            base_fn = self.apply_fn
            w = 1.0 + float(strength)

            def cfg_fn(params, ts, t, feats, **kwargs):
                sub = feats["cfg_uncond"]
                feats_c = {k: v for k, v in feats.items() if k != "cfg_uncond"}
                feats_u = {**feats_c, **sub}
                z_c = base_fn(params, ts, t, feats_c, **kwargs)["z"]
                z_u = base_fn(params, ts, t, feats_u, **kwargs)["z"]
                return {"z": z_u + w * (z_c - z_u)}

            cache[strength] = cfg_fn
        return cache[strength]

    # ------------------------------------------------------------------ #
    # Hooks (the reference's abstract surface, base.py:39-129)
    # ------------------------------------------------------------------ #

    @abstractmethod
    def setup(self):
        ...

    @abstractmethod
    def on_sample_start(self, params: Dict[str, Any]):
        ...

    @abstractmethod
    def create_np_features(self, params: Dict[str, Any]):
        ...

    @abstractmethod
    def on_sample_end(self, params: Dict[str, Any], list_np_features: List[Dict]):
        ...

    def create_np_features_batch(self, params: Dict[str, Any]) -> List[Dict]:
        """Default: num_samples independent draws of create_np_features.
        Packed samplers override this to mix per-sample shapes in one batch
        (padding makes mixed lengths free — the model is mask-invariant)."""
        return [self.create_np_features(params) for _ in range(params["num_samples"])]

    def add_required_parameter(self, name: str):
        self.required.append(name)

    def validate_parameters(self, params: Dict[str, Any]) -> bool:
        return all(name in params for name in self.required)

    # ------------------------------------------------------------------ #
    # Sampling
    # ------------------------------------------------------------------ #

    def sample(self, params: Dict[str, Any], key: Optional[jax.Array] = None):
        if not self.validate_parameters(params):
            missing = [n for n in self.required if n not in params]
            raise ValueError(f"missing required sampling parameters: {missing}")
        self.on_sample_start(params)
        list_np_features = self._sample(params, key)
        self.on_sample_end(params, list_np_features)
        return list_np_features

    def sample_ids(self, params: Dict[str, Any], n: int) -> np.ndarray:
        """Global per-sample RNG stream ids: offset + position. A sample's
        trajectory depends only on (seed, its id, padded length) — not on
        batch size, packing, or device count."""
        return int(params["offset"]) + np.arange(n, dtype=np.int32)

    def _sample(self, params: Dict[str, Any], key: Optional[jax.Array] = None):
        if key is None:
            key = jax.random.PRNGKey(int(params.get("seed", 0)))

        host_features = self.create_np_features_batch(params)
        batch = batchify([dict(f) for f in host_features])
        n_real = batch["aatype"].shape[0]
        ids = self.sample_ids(params, n_real)

        # Pad the residue axis to a bucket; padded positions are masked and
        # provably do not affect real residues (tests/test_denoiser.py).
        n = batch["residue_mask"].shape[1]
        n_padded = bucket_length(n, self.bucket)
        if n_padded != n:
            pad = n_padded - n
            for k, v in batch.items():
                if k == "fixed_structure_mask":
                    batch[k] = np.pad(v, [(0, 0), (0, pad), (0, pad)])
                elif not k.startswith("num"):
                    batch[k] = np.pad(
                        v, [(0, 0), (0, pad)] + [(0, 0)] * (v.ndim - 2)
                    )

        if self.mesh is not None:
            from genie2_tpu.parallel import shard_batch

            # Pad the batch axis to a data-axis multiple by repeating row 0
            # with throwaway RNG ids; per-sample RNG makes the dummies inert
            # and they are sliced off below. (On a 2-D ('data','seq') mesh
            # only the data axis carries batch; 'seq' shards the pair
            # tensor inside the model.)
            from genie2_tpu.parallel import data_axis_size

            n_dev = data_axis_size(self.mesh)
            n_total = -(-n_real // n_dev) * n_dev
            if n_total != n_real:
                reps = n_total - n_real
                for k, v in batch.items():
                    batch[k] = np.concatenate([v, np.repeat(v[:1], reps, axis=0)])
                ids = np.concatenate([ids, -np.arange(1, reps + 1, dtype=np.int32)])
            features = shard_batch(to_device(batch), self.mesh)
            ids = jax.device_put(
                jnp.asarray(ids), jax.sharding.NamedSharding(
                    self.mesh, jax.sharding.PartitionSpec("data"))
            )
        else:
            features = to_device(batch)
            ids = jnp.asarray(ids)

        features["static_pair_bias"] = self._static_bias_fn(self.params, features)

        # Classifier-free guidance (the reference defines --strength but
        # never uses it, sample_scaffold.py:161; here strength > 0 really
        # guides): eps = eps_uncond + (1 + strength) * (eps_cond -
        # eps_uncond), with the unconditional branch = the same features
        # with the fixed (motif) masks zeroed. strength = 0 is exactly the
        # plain conditional model (no second model call).
        strength = float(params.get("strength") or 0.0)
        if strength > 0:
            uncond = dict(features)
            uncond.pop("static_pair_bias", None)
            uncond["fixed_sequence_mask"] = jnp.zeros_like(
                features["fixed_sequence_mask"]
            )
            uncond["fixed_structure_mask"] = jnp.zeros_like(
                features["fixed_structure_mask"]
            )
            features["cfg_uncond"] = {
                "fixed_sequence_mask": uncond["fixed_sequence_mask"],
                "fixed_structure_mask": uncond["fixed_structure_mask"],
                "static_pair_bias": self._static_bias_fn(self.params, uncond),
            }
            apply_fn = self._cfg_apply_fn(strength)
        else:
            apply_fn = self.apply_fn

        ddim_steps = int(params.get("ddim_steps") or 0)
        dpm_steps = int(params.get("dpm_steps") or 0)
        if ddim_steps and dpm_steps:
            raise ValueError("ddim_steps and dpm_steps are mutually exclusive")
        if int(params.get("dump_trajectory_every") or 0) and (ddim_steps or dpm_steps):
            # Snapshots come from the full ancestral scan; a K-step solver
            # has no 1000-step trajectory to snapshot. Fail loudly instead
            # of silently dropping the dumps.
            raise ValueError(
                "dump_trajectory_every requires the full ancestral sampler; "
                "it cannot be combined with ddim_steps/dpm_steps"
            )
        if int(params.get("ddim_eta_switch_t") or 0) and not ddim_steps:
            # The hybrid stochasticity schedule only exists on the DDIM
            # path (DPM-2M is deterministic by construction; the full
            # ancestral sampler is already stochastic at every step).
            # Fail loudly instead of silently running without it.
            raise ValueError(
                "ddim_eta_switch_t requires ddim_steps; it has no effect "
                "on the ancestral or dpm_steps samplers"
            )
        spacing = str(params.get("fast_spacing") or "uniform")
        if dpm_steps:
            # Second-order multistep (DPM-Solver++ 2M): better fidelity
            # than DDIM at the same aggressive step count, deterministic.
            trans = dpm_solver_sample(
                apply_fn,
                self.params,
                self.schedule,
                features,
                key,
                dpm_steps,
                self.schedule.n_timestep,
                spacing=spacing,
                sample_ids=ids,
            )
        elif ddim_steps:
            # Accelerated DDIM path (no reference counterpart): a K-step
            # subsequence of the T-step schedule, eta in [0, 1].
            # ddim_eta_switch_t > 0 selects a hybrid stochasticity
            # schedule: deterministic ODE (eta=0) while t > switch_t,
            # eta (default 1) at or below — re-injecting ancestral-like
            # noise only on the final steps (the structure-sharpening
            # regime; tools/sampler_quality.py round-4 study).
            eta = float(params.get("ddim_eta", 0.0))
            switch_t = int(params.get("ddim_eta_switch_t") or 0)
            if switch_t:
                eta = eta_schedule_below(
                    self.schedule.n_timestep, ddim_steps, switch_t,
                    eta_low=eta or 1.0, spacing=spacing,
                )
            trans = ddim_sample(
                apply_fn,
                self.params,
                self.schedule,
                features,
                key,
                ddim_steps,
                self.schedule.n_timestep,
                eta=eta,
                scale=float(params["scale"]),
                spacing=spacing,
                sample_ids=ids,
            )
        elif int(params.get("dump_trajectory_every") or 0):
            # x_t snapshots every K steps (the reference dev-sampler's
            # test/ fixture mechanism, smc_sampler_new_new.py:802-812 —
            # available on every ancestral sampler here, not just SMC).
            trans, snapshots, snap_steps = ancestral_sample_with_trajectory(
                apply_fn,
                self.params,
                self.schedule,
                features,
                key,
                jnp.float32(params["scale"]),
                self.schedule.n_timestep,
                record_every=int(params["dump_trajectory_every"]),
                sample_ids=ids,
            )
            self._write_trajectory(
                params, snapshots, snap_steps,
                int(np.asarray(batch["num_residues"][0]).reshape(-1)[0]),
            )
        else:
            trans = ancestral_sample(
                apply_fn,
                self.params,
                self.schedule,
                features,
                key,
                jnp.float32(params["scale"]),
                self.schedule.n_timestep,
                sample_ids=ids,
            )

        features = dict(features)
        features.pop("static_pair_bias", None)
        features.pop("cfg_uncond", None)
        features["atom_positions"] = trans
        np_features = to_host(features)
        return debatchify(np_features)[:n_real]
