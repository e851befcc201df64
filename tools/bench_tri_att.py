"""Flash tri-att kernel speed verdict at the flagship tri-att shape.

Times the XLA attention core (row-chunked, the long-context default —
nn/primitives._row_chunked_attention) against the Pallas flash kernel
(ops/tri_att_flash.py) at flagship tri-att dims (H=4, c=32) over the pair
rep widths that matter (N=256/512/1024), bf16 and fp32. Both paths run K
chained iterations inside one jit (output feeds back) so the ~26 ms
dispatch floor is amortized away. The projections/gating/output linear are
excluded on BOTH sides — this isolates the part the kernel replaces (the
O(H N^3) logits).

Usage: python tools/bench_tri_att.py [lengths_csv] [iters]
Env: BENCH_CHUNK (default 64) for the XLA row-chunk size.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

LENGTHS = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "256,512").split(",")]
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 20
H, C = 4, 32
CHUNK = int(os.environ.get("BENCH_CHUNK", "64"))


def xla_chunked_core(q, k, v, tb, mask, chunk, inf=1e9):
    """The PRODUCTION row-chunked attention core, called directly so the
    benchmark can never drift from what the model runs: mask bias
    [I,1,1,J] is per-row-sliced (rank == q's, -4 dim == I), the triangle
    bias tb[None] is scan-invariant (broadcast -4 dim)."""
    from genie2_tpu.nn.primitives import _row_chunked_attention

    mask_bias = inf * (mask[:, None, None, :] - 1.0)  # [I, 1, 1, J]
    return _row_chunked_attention(
        q, k, v, [mask_bias, tb[None]], chunk, q.shape[0]
    )


def main():
    from genie2_tpu.ops.tri_att_flash import flash_tri_attention

    rng = np.random.default_rng(0)

    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    for n in LENGTHS:
        for dtype in (jnp.bfloat16, jnp.float32):
            q0 = jnp.asarray(rng.normal(size=(n, n, H, C)), jnp.float32).astype(dtype)
            k0 = jnp.asarray(rng.normal(size=(n, n, H, C)), jnp.float32).astype(dtype)
            v0 = jnp.asarray(rng.normal(size=(n, n, H, C)), jnp.float32).astype(dtype)
            tb = jnp.asarray(rng.normal(size=(H, n, n)), jnp.float32).astype(dtype)
            mask = jnp.ones((n, n), jnp.float32)

            def xla_fn(v):
                return xla_chunked_core(q0, k0, v, tb, mask, CHUNK)

            def pallas_fn(v):
                return flash_tri_attention(q0, k0, v, tb, mask)

            results = {}
            for label, fn in (("xla", xla_fn), ("pallas", pallas_fn)):

                @jax.jit
                def chained(v):
                    def body(v, _):
                        return fn(v).astype(v.dtype), None

                    out, _ = jax.lax.scan(body, v, None, length=ITERS)
                    return out

                out = chained(v0)
                sync(out)  # compile + load
                best = np.inf
                for _ in range(3):
                    tic = time.perf_counter()
                    sync(chained(v0))
                    best = min(best, time.perf_counter() - tic)
                results[label] = best / ITERS * 1e3
                print(
                    f"N={n} dtype={jnp.dtype(dtype).name} {label:6s}: "
                    f"{results[label]:.3f} ms/direction",
                    flush=True,
                )
            d = np.abs(
                np.asarray(xla_fn(v0), np.float32)
                - np.asarray(pallas_fn(v0), np.float32)
            ).max()
            flops = 2 * 2 * H * C * n**3
            print(
                f"  pallas/xla = {results['pallas'] / results['xla']:.2f}x, "
                f"max |diff| = {d:.2e}, "
                f"pallas {flops / (results['pallas'] * 1e-3) / 1e12:.2f} TF/s",
                flush=True,
            )

    os._exit(0)


if __name__ == "__main__":
    main()
