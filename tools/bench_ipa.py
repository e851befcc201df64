"""Fused-IPA kernel speed verdict at the flagship shape (VERDICT r3 #5).

Times the flax InvariantPointAttention (XLA) against the Pallas
flash-style kernel path (ops/ipa_fused.py) at the flagship shape
(N=256, H=12, C=16, Pq=4, Pv=8, c_z=128, c_s=384, B=1), bf16 and fp32.
Both paths run K chained iterations inside one jit (s feeds back through
the layer) so the ~26 ms dispatch floor is amortized away.

Usage: python tools/bench_ipa.py [n_res] [iters]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 100
CS, CZ, H, C, PQ, PV = 384, 128, 12, 16, 4, 8


def main():
    from genie2_tpu.geometry import Rigid
    from genie2_tpu.nn.structure import InvariantPointAttention
    from genie2_tpu.ops.ipa_fused import fused_ipa_attention

    rng = np.random.default_rng(0)
    s0 = jnp.asarray(rng.normal(size=(1, N, CS)).astype(np.float32))
    trans = jnp.asarray(rng.normal(size=(1, N, 3)).astype(np.float32) * 5)
    qm, _ = np.linalg.qr(rng.normal(size=(1, N, 3, 3)))
    t = Rigid(jnp.asarray(qm.astype(np.float32)), trans)
    mask = jnp.ones((1, N), jnp.int32)

    ipa = InvariantPointAttention(
        c_s=CS, c_z=CZ, c_hidden=C, no_heads=H, no_qk_points=PQ, no_v_points=PV
    )

    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    for dtype in (jnp.bfloat16, jnp.float32):
        z = jnp.asarray(rng.normal(size=(1, N, N, CZ))).astype(dtype)
        sD = s0.astype(dtype)
        params = ipa.init(jax.random.PRNGKey(0), sD, z, t, mask)
        params = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)

        p = params["params"]
        dense = lambda name: (
            p[name]["Dense_0"]["kernel"],
            p[name]["Dense_0"].get("bias", jnp.zeros((1,), dtype)),
        )
        wq, bq = dense("linear_q")
        wkv, bkv = dense("linear_kv")
        wqp, bqp = dense("linear_q_points")
        wkvp, bkvp = dense("linear_kv_points")
        wb_, bb_ = dense("linear_b")
        wo, bo = dense("linear_out")
        hw = jax.nn.softplus(p["head_weights"].astype(jnp.float32))
        t0 = Rigid(t.rots[0].astype(dtype), t.trans[0].astype(dtype))
        maskf = jnp.ones((N,), jnp.float32)

        def xla_layer(s):
            return ipa.apply(params, s, z, t, mask)

        def kernel_layer(s):
            s2 = s[0]
            q = (s2 @ wq + bq).reshape(N, H, C)
            kv = (s2 @ wkv + bkv).reshape(N, H, 2 * C)
            k, v = kv[..., :C], kv[..., C:]

            def to_pts(x, npts):
                x = jnp.stack(jnp.split(x, 3, axis=-1), axis=-1)
                x = t0.unsqueeze(-1).apply(x)
                return x.reshape(N, H, npts, 3)

            q_pts = to_pts(s2 @ wqp + bqp, PQ)
            kv_pts = to_pts(s2 @ wkvp + bkvp, PQ + PV)
            k_pts, v_pts = kv_pts[:, :, :PQ], kv_pts[:, :, PQ:]
            o, o_pt, o_pair = fused_ipa_attention(
                q, k, v, q_pts, k_pts, v_pts, z[0], wb_, bb_, hw, maskf
            )
            o_pt = t0.unsqueeze(-1).unsqueeze(-1).invert_apply(o_pt)
            o_norm = jnp.sqrt(jnp.sum(o_pt.astype(jnp.float32) ** 2, axis=-1) + 1e-8)
            cat = jnp.concatenate(
                [
                    o.reshape(N, H * C),
                    o_pt.reshape(N, H * PV, 3)[..., 0],
                    o_pt.reshape(N, H * PV, 3)[..., 1],
                    o_pt.reshape(N, H * PV, 3)[..., 2],
                    o_norm.astype(o.dtype).reshape(N, H * PV),
                    o_pair.reshape(N, H * CZ),
                ],
                axis=-1,
            )
            return (cat @ wo + bo)[None]

        results = {}
        for label, layer in (("xla", xla_layer), ("pallas", kernel_layer)):

            @jax.jit
            def chained(s):
                def body(s, _):
                    return layer(s).astype(s.dtype), None

                out, _ = jax.lax.scan(body, s, None, length=ITERS)
                return out

            out = chained(sD)
            sync(out)  # compile + load
            best = np.inf
            for _ in range(3):
                tic = time.perf_counter()
                sync(chained(sD))
                best = min(best, time.perf_counter() - tic)
            results[label] = best / ITERS * 1e3
            print(
                f"N={N} dtype={jnp.dtype(dtype).name} {label:6s}: "
                f"{results[label]:.3f} ms/IPA-layer",
                flush=True,
            )
        # Numerics cross-check on chip at this dtype.
        d = np.abs(
            np.asarray(xla_layer(sD), np.float32)
            - np.asarray(kernel_layer(sD), np.float32)
        ).max()
        print(
            f"  pallas/xla = {results['pallas'] / results['xla']:.2f}x, "
            f"max |diff| = {d:.2e}",
            flush=True,
        )

    os._exit(0)


if __name__ == "__main__":
    main()
