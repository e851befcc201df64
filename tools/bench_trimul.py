"""TriMul redesign microbench (round 2, VERDICT item #2).

Times the pieces of the triangle multiplicative update at flagship dims
(B=4, N=256, C=c_hidden=128, bf16) to find where the 2.2x-off-roofline time
actually goes, plus candidate Pallas pipelines:

  module    full TriangleMultiplicativeUpdate.apply (outgoing)
  trans     PairTransition.apply
  einsum    raw contraction in model layout (XLA batched dot)
  einsum_cm raw contraction channel-major (XLA)
  proj      LN + 4 gated projections (XLA, model layout)
  cm0       Pallas cm kernel, operands already channel-major (phase B alone)
  cmfull    Pallas cm kernel with full-K resident tiles (reads a,b once)
  projcm    Pallas fused LN+gated-proj writing channel-major (phase A)
  epi       Pallas fused LN_out+linear_z+gate epilogue (phase C)
  pipe      full 3-kernel TriMul pipeline (A -> B -> C)

Usage: PROBES=module,einsum python tools/bench_trimul.py [ITERS]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, N, C = 4, 256, 128
ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 20
DT = jnp.bfloat16
PROBES = set(
    os.environ.get(
        "PROBES",
        "module,trans,einsum,einsum_cm,proj,cm0,cmfull,projcm,epi,pipe,"
        "copy,bigmm,einsum_km,cm_km",
    ).split(",")
)


def timed(name, fn, *args):
    @jax.jit
    def run(args):
        def body(carry, _):
            out = fn(*carry[1:], carry[0])
            return (out, *carry[1:]), None

        (out, *_), _ = jax.lax.scan(body, args, None, length=ITERS)
        return jnp.sum(out.astype(jnp.float32))

    # fn signature: fn(*static_args, carry) -> carry-like
    s = run(args)
    float(jax.device_get(s))
    t0 = time.perf_counter()
    s = run(args)
    float(jax.device_get(s))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:14s} {dt:8.3f} ms/iter", flush=True)
    return dt


def _weights(tm_params):
    p0 = tm_params["params"]
    return {
        "ln_in_scale": p0["layer_norm_in"]["scale"],
        "ln_in_bias": p0["layer_norm_in"]["bias"],
        "w_ap": p0["linear_a_p"]["Dense_0"]["kernel"],
        "b_ap": p0["linear_a_p"]["Dense_0"]["bias"],
        "w_ag": p0["linear_a_g"]["Dense_0"]["kernel"],
        "b_ag": p0["linear_a_g"]["Dense_0"]["bias"],
        "w_bp": p0["linear_b_p"]["Dense_0"]["kernel"],
        "b_bp": p0["linear_b_p"]["Dense_0"]["bias"],
        "w_bg": p0["linear_b_g"]["Dense_0"]["kernel"],
        "b_bg": p0["linear_b_g"]["Dense_0"]["bias"],
        "ln_out_scale": p0["layer_norm_out"]["scale"],
        "ln_out_bias": p0["layer_norm_out"]["bias"],
        "w_z": p0["linear_z"]["Dense_0"]["kernel"],
        "b_z": p0["linear_z"]["Dense_0"]["bias"],
        "w_g": p0["linear_g"]["Dense_0"]["kernel"],
        "b_g": p0["linear_g"]["Dense_0"]["bias"],
    }


def main():
    from genie2_tpu.nn.pair_stack import PairTransition, TriangleMultiplicativeUpdate

    key = jax.random.PRNGKey(0)
    z = jax.random.normal(key, (B, N, N, C), DT)
    mask = jnp.ones((B, N, N), DT)

    tm = TriangleMultiplicativeUpdate(c_z=C, c_hidden=C, outgoing=True)
    tm_params = jax.tree_util.tree_map(
        lambda x: x.astype(DT),
        tm.init(jax.random.PRNGKey(1), z, mask),
    )

    if "module" in PROBES:
        timed("module", lambda p: tm.apply(tm_params, p, mask) + 1e-6 * p, z)

    tr = PairTransition(c_z=C, n=4)
    tr_params = jax.tree_util.tree_map(
        lambda x: x.astype(DT), tr.init(jax.random.PRNGKey(2), z)
    )
    if "trans" in PROBES:
        timed("trans", lambda p: tr.apply(tr_params, p) + 1e-6 * p, z)

    if "einsum" in PROBES:
        timed("einsum", lambda a: jnp.einsum("bikc,bjkc->bijc", a, a) * 1e-6 + a, z)

    # Pure probes: the carry IS the op output (scale fuses into the dot
    # epilogue) — no extra HBM passes from the timing harness.
    if "einsum_p" in PROBES:
        timed("einsum_p", lambda a: jnp.einsum("bikc,bjkc->bijc", a, a) * 0.0625, z)
    if "einsum_cm_p" in PROBES:
        zc = jnp.transpose(z, (0, 3, 1, 2))
        timed(
            "einsum_cm_p", lambda a: jnp.einsum("bcik,bcjk->bcij", a, a) * 0.0625, zc
        )
    if "cmfull_p" in PROBES:
        from genie2_tpu.ops.trimul_fused import contract_cm_fullk

        zc = jnp.transpose(z, (0, 3, 1, 2)) * 0.01
        # carry = raw kernel output (values saturate; timing unaffected)
        timed("cmfull_p", lambda a: contract_cm_fullk(a, a), zc)
    if "module_p" in PROBES:
        def mod_p(p):
            out = tm.apply(tm_params, p, mask)
            return out * jax.lax.rsqrt(jnp.mean(jnp.square(out)) + 1e-3)

        timed("module_p", mod_p, z)
    if "pipe_p" in PROBES:
        from genie2_tpu.ops.trimul_fused import trimul_fused as _tf

        def pipe_p(p):
            out = _tf(p, jnp.ones((B, N), DT), _weights(tm_params), outgoing=True)
            return out * jax.lax.rsqrt(jnp.mean(jnp.square(out)) + 1e-3)

        timed("pipe_p", pipe_p, z)

    z_cm = jnp.transpose(z, (0, 3, 1, 2))
    if "einsum_cm" in PROBES:
        timed(
            "einsum_cm",
            lambda a: jnp.einsum("bcik,bcjk->bcij", a, a) * 1e-6 + a,
            z_cm,
        )

    # ---- calibration probes -------------------------------------------- #
    if "copy" in PROBES:
        # Pure HBM streaming: read + write one contraction-operand's worth
        # x3 (a, b, out) = 201 MB round trip, no compute.
        big = jnp.ones((3, B, C, N, N), DT)
        timed("copy", lambda a: a * 1.0000001, big)

    if "bigmm" in PROBES:
        # One large MXU matmul with the same total FLOPs as the contraction
        # (17.2 GF): [B*N*N, C] x [C, C] has 1/128 the flops, so use
        # [B*N*N, C] @ [C, C*?]... instead: [8192, 2048] @ [2048, 1024]
        # = 34 GF, squarely compute-bound => calibrates the MXU ceiling.
        m1 = jnp.ones((8192, 2048), DT)
        m2 = jnp.ones((2048, 1024), DT)
        timed(
            "bigmm",
            lambda a: a + 1e-9 * jnp.pad(
                jnp.dot(a[:, :2048], m2, preferred_element_type=jnp.float32
                        ).astype(DT), ((0, 0), (0, 1024))),
            m1,
        )

    if "einsum_km" in PROBES:
        # rhs stored k-major: the MXU-native [M,K]x[K,N] orientation.
        timed(
            "einsum_km",
            lambda a: jnp.einsum("bcik,bckj->bcij", a, a) * 1e-6 + a,
            z_cm,
        )

    if "cm_km" in PROBES:
        from genie2_tpu.ops.trimul_fused import contract_cm_fullk_km

        timed(
            "cm_km",
            lambda a: contract_cm_fullk_km(a, a) * 1e-6 + a,
            z_cm,
        )

    # ---- overlap / MXU-rate probes ------------------------------------- #
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import functools

    if "mxu" in PROBES:
        # Pure MXU rate for the contraction's dot shape: data resident in
        # VMEM, 16 dots per kernel invocation, single grid step.
        REPS = 16

        def mxu_kernel(a_ref, o_ref):
            a = a_ref[...]

            def body(i, acc):
                return acc + jax.lax.dot_general(
                    a, a, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).astype(a.dtype)

            o_ref[...] = jax.lax.fori_loop(0, REPS, body, jnp.zeros_like(a))

        small = jnp.ones((8, 256, 256), DT)  # one CB=8 block

        @jax.jit
        def mxu_fn(a):
            return pl.pallas_call(
                mxu_kernel,
                out_shape=jax.ShapeDtypeStruct(small.shape, DT),
            )(a) * 1e-9 + a

        dt = timed("mxu16", mxu_fn, small)
        flops = 16 * 2 * 8 * 256**3
        print(f"  -> resident MXU rate {flops / dt / 1e9:.1f} TF/s")

    if "cm_par" in PROBES:
        def kern(a_ref, b_ref, o_ref):
            o_ref[0] = jax.lax.dot_general(
                a_ref[0], b_ref[0], (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(o_ref.dtype)

        for cb in (8, 16, 32):
            spec = pl.BlockSpec((1, cb, N, N), lambda b, c: (b, c, 0, 0))

            @jax.jit
            def cm_par_fn(a, cb=cb, spec=spec):
                return pl.pallas_call(
                    kern,
                    grid=(B, C // cb),
                    in_specs=[spec, spec],
                    out_specs=spec,
                    out_shape=jax.ShapeDtypeStruct((B, C, N, N), DT),
                    compiler_params=pltpu.CompilerParams(
                        dimension_semantics=("parallel", "parallel"),
                    ),
                )(a, a) * 1e-6 + a

            timed(f"cm_par{cb}", cm_par_fn, z_cm)

    if "cm_bf16acc" in PROBES:
        def kern16(a_ref, b_ref, o_ref):
            o_ref[0] = jax.lax.dot_general(
                a_ref[0], b_ref[0], (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.bfloat16,
            )

        spec8 = pl.BlockSpec((1, 8, N, N), lambda b, c: (b, c, 0, 0))

        @jax.jit
        def cm16_fn(a):
            return pl.pallas_call(
                kern16,
                grid=(B, C // 8),
                in_specs=[spec8, spec8],
                out_specs=spec8,
                out_shape=jax.ShapeDtypeStruct((B, C, N, N), DT),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel"),
                ),
            )(a, a) * 1e-6 + a

        timed("cm_bf16acc", cm16_fn, z_cm)

    # LN + 4 gated projections (XLA baseline for phase A).
    import flax.linen as nn

    p0 = tm_params["params"]

    def proj_fn(p):
        zn = nn.LayerNorm().apply(
            {"params": p0["layer_norm_in"]}, p
        )
        def lin(name):
            w = p0[name]["Dense_0"]["kernel"]
            b = p0[name]["Dense_0"]["bias"]
            return zn @ w + b

        a = lin("linear_a_p") * jax.nn.sigmoid(lin("linear_a_g"))
        bb = lin("linear_b_p") * jax.nn.sigmoid(lin("linear_b_g"))
        return a + bb

    if "proj" in PROBES:
        timed("proj", lambda p: proj_fn(p) * 1e-6 + p, z)

    # --- Pallas candidates ---------------------------------------------- #
    from genie2_tpu.ops.triangle import _triangle_multiply_cm
    from genie2_tpu.ops.trimul_fused import (
        contract_cm_fullk,
        epilogue_cm,
        project_gated_cm,
        trimul_fused,
    )

    if "cm0" in PROBES:
        timed(
            "cm0",
            lambda a: _triangle_multiply_cm(a, a) * 1e-6 + a,
            z_cm,
        )
    if "cmfull" in PROBES:
        timed(
            "cmfull",
            lambda a: contract_cm_fullk(a, a) * 1e-6 + a,
            z_cm,
        )

    res_mask = jnp.ones((B, N), DT)
    weights = _weights(tm_params)

    if "projcm" in PROBES:
        def projcm_fn(p):
            a_cm, b_cm = project_gated_cm(p, res_mask, weights)
            return jnp.transpose(a_cm + b_cm, (0, 2, 3, 1)) * 1e-6 + p

        timed("projcm", projcm_fn, z)

    if "epi" in PROBES:
        def epi_fn(p):
            out = epilogue_cm(z_cm, p, weights)
            return out * 1e-6 + p

        timed("epi", epi_fn, z)

    if "pipe" in PROBES:
        def pipe_fn(p):
            return trimul_fused(p, res_mask, weights, outgoing=True) * 1e-6 + p

        timed("pipe", pipe_fn, z)

        # Numerical check against the flax module.
        ref = tm.apply(tm_params, z, mask)
        got = trimul_fused(z, res_mask, weights, outgoing=True)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
        print(f"pipe max|err| vs module: {err:.4e}")


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
