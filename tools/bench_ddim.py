"""Accelerated-sampling (DDIM) + long-context throughput measurements.

Two questions bench.py's 1000-step headline doesn't answer:

  1. What does the DDIM path (--ddim_steps K) deliver end-to-end? Per-step
     cost is the same denoiser call, so samples/min should scale ~1000/K;
     this verifies nothing else creeps in (schedule gather, extra casts).
  2. Does the flagship model run past the reference's N=256 cap on a real
     chip, and at what step cost? (The reference caps maximumNumResidues at
     256, config.py:23; long context is this framework's seq-shard story.)

Usage: python tools/bench_ddim.py [ddim|long|both]
Env: BENCH_LENGTH (256), BENCH_DDIM_STEPS (50), BENCH_LONG_LENGTH (512),
BENCH_LONG_STEPS (200), BENCH_DTYPE (bf16).

Prints one JSON line per measurement.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def build(length, n_steps, dtype, extra_overrides=None):
    from genie2_tpu.config import Config
    from genie2_tpu.diffusion import Schedule
    from genie2_tpu.features import batchify, create_empty_features, to_device
    from genie2_tpu.geometry import Rigid, frenet_frames
    from genie2_tpu.nn import Denoiser
    from genie2_tpu.nn.feature_nets import PairFeatureNet
    from genie2_tpu.nn.policy import make_apply_fn

    overrides = {"maximumNumResidues": length, "numTimesteps": n_steps}
    overrides.update(extra_overrides or {})
    config = Config(overrides=overrides)
    model = Denoiser.from_config(config)
    schedule = Schedule.create(n_steps)
    feats = to_device(batchify([create_empty_features([length])]))

    @jax.jit
    def init_params(key):
        trans0 = jnp.zeros((1, length, 3), jnp.float32)
        rots0 = frenet_frames(trans0, feats["chain_index"], feats["residue_mask"])
        t0 = jnp.full((1,), n_steps, jnp.int32)
        return model.init(key, Rigid(rots0, trans0), t0, feats)

    params = init_params(jax.random.PRNGKey(1))
    apply_fn = make_apply_fn(model, dtype)

    pfn = PairFeatureNet(
        c_s=model.c_s, c_p=model.c_p, n_timestep=model.n_timestep,
        relpos_k=model.relpos_k, template_dist_min=model.template_dist_min,
        template_dist_step=model.template_dist_step,
        template_dist_n_bin=model.template_dist_n_bin,
    )
    bias_dtype = jnp.bfloat16 if dtype in ("bf16", "bfloat16") else jnp.float32

    @jax.jit
    def static_bias(params, f):
        sub = {"params": params["params"]["pair_feature_net"]}
        return pfn.apply(sub, f, method=PairFeatureNet.static_bias).astype(bias_dtype)

    feats["static_pair_bias"] = static_bias(params, feats)
    return model, params, schedule, feats, apply_fn


def bench_ddim(dtype):
    from genie2_tpu.sampling import ddim_sample

    length = int(os.environ.get("BENCH_LENGTH", "256"))
    k = int(os.environ.get("BENCH_DDIM_STEPS", "50"))
    _, params, schedule, feats, apply_fn = build(length, 1000, dtype)

    def run(key):
        out = ddim_sample(apply_fn, params, schedule, feats, key, k, 1000)
        return float(jnp.sum(out))  # dependent-scalar sync (tunnel no-op fix)

    run(jax.random.PRNGKey(2))  # warmup/compile
    t0 = time.perf_counter()
    run(jax.random.PRNGKey(3))
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": f"ddim{k}_samples_per_min_L{length}",
        "value": round(60.0 / dt, 2),
        "unit": "samples/min",
        "extra": {"step_ms": round(dt / k * 1e3, 2), "n_steps": k,
                  "length": length, "dtype": dtype},
    }), flush=True)


def bench_long(dtype):
    from genie2_tpu.sampling import ancestral_sample

    length = int(os.environ.get("BENCH_LONG_LENGTH", "512"))
    n_steps = int(os.environ.get("BENCH_LONG_STEPS", "200"))
    _, params, schedule, feats, apply_fn = build(length, 1000, dtype)

    def run(key):
        out = ancestral_sample(
            apply_fn, params, schedule, feats, key, jnp.float32(0.6), n_steps
        )
        return float(jnp.sum(out))

    run(jax.random.PRNGKey(2))
    t0 = time.perf_counter()
    run(jax.random.PRNGKey(3))
    dt = time.perf_counter() - t0
    step_ms = dt / n_steps * 1e3
    print(json.dumps({
        "metric": f"long_context_step_ms_L{length}",
        "value": round(step_ms, 2),
        "unit": "ms/step",
        "extra": {"projected_samples_per_min_1000step": round(60.0 / (step_ms), 2),
                  "n_steps_measured": n_steps, "length": length, "dtype": dtype},
    }), flush=True)


def bench_triatt(dtype):
    """Full pair stack INCLUDING triangle attention at long context, via
    row-chunked attention (triangleAttentionChunk; nn/primitives.py
    _row_chunked_attention). Unchunked N=1024 logits are O(H N^3) ~ 8.6 GB
    bf16 — over half of HBM for one intermediate; the chunk bounds the live
    logit block so the full AF2-style stack runs at 2-4x the reference's
    N=256 cap on one chip. Env: BENCH_TRIATT_LENGTHS (512,1024),
    BENCH_TRIATT_CHUNK (128), BENCH_TRIATT_STEPS (10)."""
    from genie2_tpu.sampling import ancestral_sample

    lengths = [
        int(x)
        for x in os.environ.get("BENCH_TRIATT_LENGTHS", "512,1024").split(",")
    ]
    chunk = int(os.environ.get("BENCH_TRIATT_CHUNK", "128"))
    n_steps = int(os.environ.get("BENCH_TRIATT_STEPS", "10"))
    for length in lengths:
        _, params, schedule, feats, apply_fn = build(
            length, 1000, dtype,
            extra_overrides={
                "includeTriangularAttention": "True",
                "triangleAttentionChunk": chunk,
            },
        )

        def run(key):
            out = ancestral_sample(
                apply_fn, params, schedule, feats, key, jnp.float32(0.6),
                n_steps, steps_per_dispatch=5,
            )
            return float(jnp.sum(out))

        run(jax.random.PRNGKey(2))  # warmup/compile
        t0 = time.perf_counter()
        run(jax.random.PRNGKey(3))
        dt = time.perf_counter() - t0
        step_ms = dt / n_steps * 1e3
        print(json.dumps({
            "metric": f"triatt_full_stack_step_ms_L{length}",
            "value": round(step_ms, 2),
            "unit": "ms/step",
            "extra": {"tri_att_chunk": chunk, "n_steps_measured": n_steps,
                      "length": length, "dtype": dtype},
        }), flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    dtype = os.environ.get("BENCH_DTYPE", "bf16")
    if which in ("ddim", "both"):
        bench_ddim(dtype)
    if which in ("long", "both"):
        bench_long(dtype)
    if which == "triatt":
        bench_triatt(dtype)
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)  # tunnel hangs at interpreter exit
