"""Settle the MXU-ceiling contradiction (VERDICT r4 Weak #5 / Next #5).

BENCH_NOTES round 2 derived a 104 TF/s bf16 ceiling from 4096^3 matmuls and
called the 3.62 ms sampling step "76% of roofline" (285.9 GFLOP / 3.62 ms =
79 TF/s). The round-4 healthy probe read 182.5 TF/s on a 2048^3 chain —
incompatible: either the ceiling is ~180 TF/s and the step is at ~43% MFU
with unexplained headroom, or the probe overcounts.

This tool measures, in ONE session so every number shares the same tunnel
health:
  1. chained-matmul bf16 rate at n = 1024..8192 (dispatch-floor-corrected,
     both with the bench.py chain shape and a fresh-operands variant that
     defeats any possible algebraic short-circuit);
  2. fp32 rate at n = 2048/4096 (this chip runs bf16 == fp32 per CLAUDE.md
     gotcha #10 — if bf16 reads 2x fp32, something is wrong with a probe);
  3. the flagship sampling step's XLA-reported FLOPs (cost analysis) and
     measured time -> MFU against each candidate ceiling.

Run exclusively on the TPU (gotcha #5). Prints one JSON line.
Usage: python tools/mxu_ceiling_study.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def dispatch_floor_s(n=5):
    f = jax.jit(lambda v: v + 1.0)
    x = jnp.float32(1.0)
    float(f(x))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def chain_rate_tf_s(n, iters, dtype, floor_s, fresh_b=False):
    """Rate of `iters` chained n^3 matmuls. fresh_b=True multiplies by a
    scan-carried RNG-refreshed operand instead of the same `a` every
    iteration (rules out compiler exploitation of the repeated operand)."""
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (n, n), dtype)

    if fresh_b:

        @jax.jit
        def chain(a):
            def body(carry, i):
                b, k = carry
                k, sub = jax.random.split(k)
                nxt = jnp.dot(b, a) + jax.random.normal(sub, (n, n), dtype) * 0
                return (nxt, k), None

            (out, _), _ = jax.lax.scan(
                body, (a, jax.random.PRNGKey(1)), jnp.arange(iters)
            )
            return jnp.sum(out.astype(jnp.float32))

    else:

        @jax.jit
        def chain(a):
            def body(b, _):
                return jnp.dot(b, a), None

            out, _ = jax.lax.scan(body, a, None, length=iters)
            return jnp.sum(out.astype(jnp.float32))

    float(chain(a))  # compile + on-chip load
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(a))
        best = min(best, time.perf_counter() - t0)
    # Report BOTH raw and floor-corrected: the bench.py probe subtracts the
    # null-dispatch floor from a chain whose compute is only ~2x the floor,
    # so an over-subtraction inflates the rate — a candidate explanation
    # for the 104-vs-182 TF/s contradiction. The chains here carry >=17
    # TFLOP so the two rates should nearly agree; if they do not, the
    # correction (not the chip) was the variable.
    raw = 2 * n**3 * iters / best / 1e12
    corrected = 2 * n**3 * iters / max(best - floor_s, best / 2) / 1e12
    return round(raw, 1), round(corrected, 1), round(best * 1e3, 1)


def sampling_step_flops_and_ms():
    """Flagship denoiser step: XLA cost-analysis FLOPs + measured ms."""
    from genie2_tpu.config import Config
    from genie2_tpu.features import batchify, create_empty_features, to_device
    from genie2_tpu.geometry import Rigid, frenet_frames
    from genie2_tpu.nn import Denoiser
    from genie2_tpu.nn.policy import make_apply_fn

    length, n_steps = 256, 1000
    config = Config(
        overrides={"maximumNumResidues": length, "numTimesteps": n_steps}
    )
    model = Denoiser.from_config(config)
    feats = to_device(batchify([create_empty_features([length])]))

    @jax.jit
    def init_p(key):
        tr0 = jnp.zeros((1, length, 3), jnp.float32)
        r0 = frenet_frames(tr0, feats["chain_index"], feats["residue_mask"])
        return model.init(
            key, Rigid(r0, tr0), jnp.full((1,), n_steps, jnp.int32), feats
        )

    params = init_p(jax.random.PRNGKey(1))
    apply_fn = make_apply_fn(model, "bf16")

    # Same static-pair-bias hoist as bench.py / the samplers, so the step
    # measured here has the headline step's exact op mix.
    from genie2_tpu.nn.feature_nets import PairFeatureNet

    pfn = PairFeatureNet(
        c_s=model.c_s, c_p=model.c_p, n_timestep=model.n_timestep,
        relpos_k=model.relpos_k, template_dist_min=model.template_dist_min,
        template_dist_step=model.template_dist_step,
        template_dist_n_bin=model.template_dist_n_bin,
        quat_method=model.quat_method,
    )

    @jax.jit
    def static_bias(p, f):
        sub = {"params": p["params"]["pair_feature_net"]}
        return pfn.apply(
            sub, f, method=PairFeatureNet.static_bias
        ).astype(jnp.bfloat16)

    feats["static_pair_bias"] = static_bias(params, feats)

    # 100 chained denoiser calls per dispatch, exactly like the sampler's
    # scan segments — a single dispatch would drown the 3.6 ms step in the
    # ~26 ms fixed dispatch latency (CLAUDE.md gotcha #3).
    seg = 100

    def run_segment(params, trans, feats):
        def body(tr, i):
            rots = frenet_frames(
                tr, feats["chain_index"], feats["residue_mask"]
            )
            t = jnp.full((1,), 500, jnp.int32) - i
            z = apply_fn(params, Rigid(rots, tr), t, feats)["z"]
            return z.astype(jnp.float32), None

        out, _ = jax.lax.scan(body, trans, jnp.arange(seg))
        return out

    trans = jax.random.normal(jax.random.PRNGKey(2), (1, length, 3), jnp.float32)
    compiled = jax.jit(run_segment).lower(params, trans, feats).compile()
    # XLA cost analysis counts a while/scan BODY once (it cannot know the
    # trip count), so the reported flops ARE per-step already — the first
    # run of this tool divided by seg again and "found" 2.8 GFLOP/step;
    # x100 recovers the 280 GFLOP that matches BENCH_NOTES' hand count
    # (285.9 GFLOP). Same for bytes accessed.
    try:
        ca = compiled.cost_analysis()
        flops = ca["flops"]
        bytes_accessed = ca.get("bytes accessed")
    except Exception:
        flops = bytes_accessed = None
    _sync(compiled(params, trans, feats))  # load on chip
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(compiled(params, trans, feats))
        best = min(best, time.perf_counter() - t0)
    return flops, bytes_accessed, best / seg * 1e3


def main():
    floor = dispatch_floor_s()
    out = {"dispatch_floor_ms": round(floor * 1e3, 2), "rates": {}}
    if os.environ.get("MXU_STEP_ONLY") == "1":
        # Targeted re-run of just the step analysis (the chains are ~9 min
        # of chip time); peak defaults to the full run's measured value.
        out["rates"]["bf16_n4096"] = {"tf_s_raw": 166.9}
        flops, bytes_accessed, step_ms = sampling_step_flops_and_ms()
        _emit_step(out, flops, bytes_accessed, step_ms)
        print(json.dumps(out), flush=True)
        return

    # FLOP budget per chain >=17 TFLOP so compute >> the ~26 ms dispatch
    # floor everywhere (chains stay well under the ~60 s watchdog).
    for n, iters in [(1024, 8192), (2048, 1024), (4096, 256), (8192, 32)]:
        raw, corr, ms = chain_rate_tf_s(n, iters, jnp.bfloat16, floor)
        out["rates"][f"bf16_n{n}"] = {
            "tf_s_raw": raw, "tf_s_floor_corrected": corr, "chain_ms": ms
        }
    for n, iters in [(2048, 1024), (4096, 256)]:
        raw, corr, ms = chain_rate_tf_s(n, iters, jnp.float32, floor)
        out["rates"][f"fp32_n{n}"] = {
            "tf_s_raw": raw, "tf_s_floor_corrected": corr, "chain_ms": ms
        }
    # The EXACT bench.py probe shape (n=2048, iters=256, ~4.4 TFLOP): if
    # its floor-corrected rate disagrees with the >=17-TFLOP chains above,
    # the bench probe's correction is the artifact.
    raw, corr, ms = chain_rate_tf_s(2048, 256, jnp.bfloat16, floor)
    out["rates"]["bf16_n2048_benchprobe"] = {
        "tf_s_raw": raw, "tf_s_floor_corrected": corr, "chain_ms": ms
    }
    # Fresh-operand control.
    raw, corr, ms = chain_rate_tf_s(2048, 1024, jnp.bfloat16, floor, fresh_b=True)
    out["rates"]["bf16_n2048_freshB"] = {
        "tf_s_raw": raw, "tf_s_floor_corrected": corr, "chain_ms": ms
    }

    flops, bytes_accessed, step_ms = sampling_step_flops_and_ms()
    _emit_step(out, flops, bytes_accessed, step_ms)
    print(json.dumps(out), flush=True)


def _emit_step(out, flops, bytes_accessed, step_ms):
    out["sampling_step"] = {
        "xla_cost_analysis_gflop_per_step": round(flops / 1e9, 1) if flops else None,
        "xla_bytes_accessed_mb_per_step": (
            round(bytes_accessed / 1e6, 1) if bytes_accessed else None
        ),
        "dispatched_step_ms": round(step_ms, 2),
    }
    if flops:
        achieved = flops / (step_ms / 1e3) / 1e12
        out["sampling_step"]["achieved_tf_s"] = round(achieved, 1)
        peak = max(
            v["tf_s_raw"] for k, v in out["rates"].items() if k.startswith("bf16")
        )
        out["sampling_step"]["mfu_vs_session_peak"] = round(achieved / peak, 3)
        out["sampling_step"]["session_peak_tf_s"] = peak
        if bytes_accessed:
            # Roofline: which ceiling binds this op mix? (HBM ~280 GB/s
            # measured on this chip, CLAUDE.md gotcha #10.)
            intensity = flops / bytes_accessed
            out["sampling_step"]["arithmetic_intensity_flop_per_byte"] = round(
                intensity, 1
            )
            out["sampling_step"]["hbm_bound_time_ms_at_280GBs"] = round(
                bytes_accessed / 280e9 * 1e3, 2
            )
            out["sampling_step"]["mxu_bound_time_ms_at_peak"] = round(
                flops / (peak * 1e12) * 1e3, 2
            )


if __name__ == "__main__":
    try:
        main()
    finally:
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)
