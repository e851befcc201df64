"""Flash triangle attention Pallas kernel (online softmax, no HBM logits).

VERDICT (measured on chip, tools/bench_tri_att.py — see BENCH_NOTES
round 3): **XLA's row-chunked path wins at every shape tried**; this
kernel is kept default-off as a documented null result, same as the
TriMul and IPA kernels. At flagship tri-att dims (H=4, c=32), isolated
attention core, 20 chained iterations/dispatch:

    N=256 bf16: XLA 1.56 ms vs Pallas 2.62 ms  (kernel 1.68x slower)
    N=256 fp32: XLA 1.61 ms vs Pallas 3.03 ms  (1.88x)
    N=512 bf16: XLA 6.26 ms vs Pallas 9.87 ms  (1.58x)

The hypothesis that chunked attention was HBM-bound on its [chunk,H,N,N]
logits was wrong: XLA's chunked softmax streams at these shapes too, and
its fused schedule beats the hand kernel's (the kernel hits only ~7 TF/s
at N=512 — small 128x128xc=32 dots leave the MXU underfed, and the
per-(head,row-tile) grid re-reads k/v tiles once per query tile).

Kernel design (the classic flash recipe per row of the triangle): for
each (head, row-tile, query-tile), stream key-tiles with a running
max/denominator and accumulate p@v — logits never leave VMEM, HBM
traffic drops from O(H N^3) to O(N^2 H c).

Triangle specifics vs plain flash attention (reference counterpart:
triangular_attention.py:30-144 + primitives.py:163-281, which materialize
the full [*, I, H, J, J] tensor):
  * rows are an extra batch axis: q/k/v are [I, J, H, c] and every row i
    attends only within itself — the kernel batches the dots over a
    row-tile (Mosaic: batch dims lead BOTH operands, per ops/ipa_fused.py
    lessons);
  * the triangle bias b[h, q, k] (a linear image of the pair rep) is
    row-invariant — one [H, Tq, Tk] tile serves every row block;
  * the mask bias depends on (row, key) only: mask[i, k], broadcast over
    queries and heads.

Forward-only by design (sampling is the long-context headline workload;
training keeps the XLA chunked path, whose remat already bounds memory).
Gating and the output projection stay in XLA. A jnp reference
implementation lives alongside for numerics tests.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

_NEG_INF = -1e30

try:  # pallas imports fail gracefully off-TPU/old jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False


def reference_tri_attention(q, k, v, tb, mask, inf=1e9):
    """Pure-jnp transcription of the attention core of
    nn/primitives.Attention as TriangleAttention drives it (no batch axis).

    Shapes: q, k, v [I, J, H, c]; tb (triangle bias) [H, J, J];
    mask [I, J] (1 = valid key). Returns o [I, J, H, c]."""
    c = q.shape[-1]
    a = jnp.einsum("iqhc,ikhc->ihqk", q, k) / math.sqrt(c)
    a = a + tb[None]
    a = a + inf * (mask.astype(a.dtype)[:, None, None, :] - 1.0)
    a = jax.nn.softmax(a, axis=-1)
    return jnp.einsum("ihqk,ikhc->iqhc", a, v)


def _flash_kernel(
    q_ref, k_ref, v_ref, tb_ref, mask_ref,
    o_ref,
    acc, m_acc, l_acc,
    *, n_k, scale, inf,
):
    """Grid (H, n_rows, n_q, n_k), k innermost; one head per program (a
    Python head loop unrolls in Mosaic and keeps every head's fp32
    logits/p temporaries live on the kernel stack at once — 40 MB vs the
    16 MB scoped-VMEM limit at 128x128 tiles). Head-major refs with a
    leading singleton head dim: q [1, R, Tq, c], k/v [1, R, Tk, c],
    tb [1, Tq, Tk], mask [R, Tk]. Scratch: acc [R, Tq, c] f32,
    m/l [R, Tq] f32."""
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        m_acc[:] = jnp.full_like(m_acc, _NEG_INF)
        l_acc[:] = jnp.zeros_like(l_acc)

    f32 = jnp.float32
    q3 = q_ref[0].astype(f32)   # [R, Tq, c]
    k3 = k_ref[0].astype(f32)   # [R, Tk, c]
    v3 = v_ref[0].astype(f32)   # [R, Tk, c]
    tb = tb_ref[0].astype(f32)  # [Tq, Tk]
    # [R, 1, Tk]: key-side mask for each row in the tile.
    maskb = inf * (mask_ref[:].astype(f32) - 1.0)[:, None, :]

    logits = jax.lax.dot_general(
        q3, k3, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=f32,
    ) * scale                      # [R, Tq, Tk]
    logits = logits + tb[None] + maskb

    m_new = jnp.maximum(m_acc[:], jnp.max(logits, axis=-1))  # [R, Tq]
    alpha = jnp.exp(m_acc[:] - m_new)
    p = jnp.exp(logits - m_new[:, :, None])                   # [R, Tq, Tk]
    l_acc[:] = l_acc[:] * alpha + jnp.sum(p, axis=-1)
    m_acc[:] = m_new
    acc[:] = acc[:] * alpha[:, :, None] + jax.lax.dot_general(
        p, v3, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=f32,
    )

    @pl.when(ki == n_k - 1)
    def _():
        norm = 1.0 / jnp.maximum(l_acc[:], 1e-20)  # [R, Tq]
        o_ref[0] = (acc[:] * norm[..., None]).astype(o_ref.dtype)


def flash_tri_attention(
    q, k, v, tb, mask,
    tile_rows: int | None = None, tile_q: int = 128, tile_k: int = 128,
    inf: float = 1e9, interpret: bool = False,
):
    """Flash triangle attention for ONE sample.

    q, k, v: [I, J, H, c]; tb: [H, J, J]; mask: [I, J] (1 = valid key).
    Returns o [I, J, H, c] in q's dtype. I must divide by tile_rows and J
    by tile_q/tile_k (the caller guards and falls back to the XLA path).
    Batch via jax.vmap. Default tile_rows is dtype-aware: 32 for 2-byte
    inputs, 16 for fp32 (32-row fp32 tiles overflow the 16 MB scoped-VMEM
    budget — measured 18.19M at 32x128x128)."""
    if not _PALLAS_OK:
        raise RuntimeError(
            "flash_tri_attention requires jax.experimental.pallas (TPU); "
            "the import failed on this installation — use the XLA "
            "row-chunked path (triangleAttentionChunk)."
        )
    n_i, n_j, h, c = q.shape
    if tile_rows is None:
        tile_rows = 32 if jnp.dtype(q.dtype).itemsize <= 2 else 16
    tile_rows = min(tile_rows, n_i)
    tile_q = min(tile_q, n_j)
    tile_k = min(tile_k, n_j)
    assert n_i % tile_rows == 0 and n_j % tile_q == 0 and n_j % tile_k == 0
    grid = (h, n_i // tile_rows, n_j // tile_q, n_j // tile_k)

    dtype = q.dtype
    hm = lambda x: jnp.transpose(x, (2, 0, 1, 3))  # [H, I, J, c]

    kernel = functools.partial(
        _flash_kernel, n_k=grid[3],
        scale=1.0 / math.sqrt(c), inf=inf,
    )
    vm = pltpu.VMEM
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_rows, tile_q, c), lambda hh, bi, qi, ki: (hh, bi, qi, 0), memory_space=vm),
            pl.BlockSpec((1, tile_rows, tile_k, c), lambda hh, bi, qi, ki: (hh, bi, ki, 0), memory_space=vm),
            pl.BlockSpec((1, tile_rows, tile_k, c), lambda hh, bi, qi, ki: (hh, bi, ki, 0), memory_space=vm),
            pl.BlockSpec((1, tile_q, tile_k), lambda hh, bi, qi, ki: (hh, qi, ki), memory_space=vm),
            pl.BlockSpec((tile_rows, tile_k), lambda hh, bi, qi, ki: (bi, ki), memory_space=vm),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_rows, tile_q, c), lambda hh, bi, qi, ki: (hh, bi, qi, 0), memory_space=vm
        ),
        out_shape=jax.ShapeDtypeStruct((h, n_i, n_j, c), dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_rows, tile_q, c), jnp.float32),
            pltpu.VMEM((tile_rows, tile_q), jnp.float32),
            pltpu.VMEM((tile_rows, tile_q), jnp.float32),
        ],
        interpret=interpret,
    )(hm(q), hm(k), hm(v), tb, mask.astype(jnp.float32))
    return jnp.transpose(out, (1, 2, 0, 3))  # back to [I, J, H, c]
