"""Linear layers with the reference's initializer table, plus gated MHA.

Behavioral counterpart of /root/reference/genie/model/modules/primitives.py:
31-281. Weight-layout note: torch stores Linear weights as [out, in]; flax
kernels are [in, out]. The reference's `_calculate_fan` (primitives.py:31-47)
is idiosyncratic — for a [out, in] weight it computes
fan_in = out^2 * in and fan_out = out * in^2 — and the shipped checkpoints
were trained with it, so we reproduce that formula exactly rather than the
textbook fan.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# std of the standard normal truncated to [-2, 2]
_TRUNCNORM_STD = 0.8796256610342398

SOFTPLUS_INVERSE_1 = 0.541324854612918  # softplus^-1(1), primitives.py:90-93


def _reference_fan(out_dim: int, in_dim: int, fan: str) -> float:
    """The reference's fan computation on a torch [out, in] weight."""
    prod = out_dim * in_dim
    if fan == "fan_in":
        return prod * out_dim
    if fan == "fan_out":
        return prod * in_dim
    if fan == "fan_avg":
        return prod * (out_dim + in_dim) / 2
    raise ValueError(fan)


def trunc_normal_initializer(scale: float = 1.0, fan: str = "fan_in"):
    """Truncated-normal init matching primitives.py:50-61 (reference fan)."""

    def init(key, shape, dtype=jnp.float32):
        in_dim, out_dim = shape
        f = max(1.0, _reference_fan(out_dim, in_dim, fan))
        std = math.sqrt(scale / f) / _TRUNCNORM_STD
        return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)

    return init


def normal_initializer():
    """torch kaiming_normal_(nonlinearity="linear"): N(0, 1/sqrt(fan_in))
    with the true fan_in (primitives.py:86-87)."""

    def init(key, shape, dtype=jnp.float32):
        in_dim, _ = shape
        return jax.random.normal(key, shape, dtype) / math.sqrt(in_dim)

    return init


def make_kernel_init(init: str):
    if init == "default":
        return trunc_normal_initializer(scale=1.0)
    if init == "relu":
        return trunc_normal_initializer(scale=2.0)
    if init == "glorot":
        return jax.nn.initializers.glorot_uniform()
    if init in ("gating", "final"):
        return jax.nn.initializers.zeros
    if init == "normal":
        return normal_initializer()
    raise ValueError(f"Invalid init string: {init}")


class Linear(nn.Module):
    """nn.Dense with the reference init table (primitives.py:96-160)."""

    features: int
    use_bias: bool = True
    init: str = "default"

    @nn.compact
    def __call__(self, x):
        bias_init = (
            jax.nn.initializers.ones if self.init == "gating" else jax.nn.initializers.zeros
        )
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=make_kernel_init(self.init),
            bias_init=bias_init,
        )(x)


class Attention(nn.Module):
    """Gated multi-head attention (primitives.py:163-281). `c_hidden` is the
    per-head dimension; biases are added to the [*, H, Q, K] logits.

    `row_chunk` bounds logit memory when the attention is batched over a
    large leading "row" axis (triangle attention: q/k/v are [B, I, J, h, c]
    and the [B, I, H, J, J] logits are O(N^3 H)). When set, the row axis
    (dim -4 of q) is processed in lax.scan chunks of that size: q/k/v and
    any bias whose -4 dim matches I are sliced per chunk; biases with a
    broadcast (size-1) -4 dim — e.g. the row-invariant triangle bias — stay
    scan-invariant. Numerics are identical to the unchunked path (the
    softmax key axis is never split). When I is not divisible the chunk
    rounds down to the largest divisor of I (never a silent full-logits
    fallback); I <= row_chunk runs unchunked (already within budget)."""

    c_q: int
    c_k: int
    c_v: int
    c_hidden: int
    no_heads: int
    gating: bool = True
    row_chunk: int = 0

    @nn.compact
    def __call__(self, q_x, k_x, v_x, biases: Optional[Sequence[jnp.ndarray]] = None):
        h, c = self.no_heads, self.c_hidden
        q = Linear(h * c, use_bias=False, init="glorot", name="linear_q")(q_x)
        k = Linear(h * c, use_bias=False, init="glorot", name="linear_k")(k_x)
        v = Linear(h * c, use_bias=False, init="glorot", name="linear_v")(v_x)

        q = q.reshape(*q.shape[:-1], h, c)
        k = k.reshape(*k.shape[:-1], h, c)
        v = v.reshape(*v.shape[:-1], h, c)

        n_row = q.shape[-4] if q.ndim >= 4 else 0
        if self.row_chunk and q.ndim >= 4 and n_row > self.row_chunk:
            # Non-divisible n_row: the scan pads the row axis up to the
            # next chunk multiple and discards the tail, so the requested
            # chunk (and the memory bound — the whole point of the flag)
            # holds for ANY n_row including primes, instead of degrading
            # toward chunk=1 divisors. Applies during init too: the chunk
            # body has no submodules, so params are identical and an eager
            # init stays memory-bounded.
            o = _row_chunked_attention(
                q, k, v, list(biases or []), self.row_chunk, n_row
            )
        else:
            # [*, H, Q, K]
            a = jnp.einsum("...qhc,...khc->...hqk", q, k) / math.sqrt(c)
            if biases is not None:
                for b in biases:
                    a = a + b
            a = jax.nn.softmax(a, axis=-1)

            # [*, Q, H, C]
            o = jnp.einsum("...hqk,...khc->...qhc", a, v)
        if self.gating:
            g = jax.nn.sigmoid(Linear(h * c, init="gating", name="linear_g")(q_x))
            o = o * g.reshape(*g.shape[:-1], h, c)
        o = o.reshape(*o.shape[:-2], h * c)
        return Linear(self.c_q, init="final", name="linear_o")(o)


def _row_chunked_attention(q, k, v, biases, chunk, n_row):
    """Memory-bounded attention core: lax.scan over row-axis (dim -4)
    chunks. Peak logit memory is O(chunk * H * Q * K) instead of
    O(n_row * H * Q * K); the softmax key axis is never split, so the
    result is the unchunked computation reassembled (no online-softmax
    rescaling, hence no numerics drift beyond reduction order).

    A bias is sliced per-chunk iff it has q's rank and its -4 dim equals
    n_row (the per-row mask bias); same-rank biases with a broadcast -4
    dim (the row-invariant triangle bias) and lower-rank biases are passed
    whole into every chunk.

    Non-divisible n_row: the row axis is zero-padded up to the next chunk
    multiple and the padded rows are sliced off after the scan. Rows are
    independent (the softmax key axis is within-row), so the pad rows
    compute garbage that is simply discarded — real-row numerics are
    untouched."""
    scale = 1.0 / math.sqrt(q.shape[-1])
    per_row = [b.ndim == q.ndim and b.shape[-4] == n_row for b in biases]

    pad = (-n_row) % chunk
    if pad:
        def pad_rows(x):
            widths = [(0, 0)] * x.ndim
            widths[x.ndim - 4] = (0, pad)
            return jnp.pad(x, widths)

        q, k, v = pad_rows(q), pad_rows(k), pad_rows(v)
        biases = [pad_rows(b) if sl else b for b, sl in zip(biases, per_row)]
    n_padded = n_row + pad

    def body(_, i0):
        q_blk = jax.lax.dynamic_slice_in_dim(q, i0, chunk, axis=-4)
        k_blk = jax.lax.dynamic_slice_in_dim(k, i0, chunk, axis=-4)
        v_blk = jax.lax.dynamic_slice_in_dim(v, i0, chunk, axis=-4)
        a = jnp.einsum("...qhc,...khc->...hqk", q_blk, k_blk) * scale
        for b, sl in zip(biases, per_row):
            a = a + (
                jax.lax.dynamic_slice_in_dim(b, i0, chunk, axis=-4) if sl else b
            )
        a = jax.nn.softmax(a, axis=-1)
        return None, jnp.einsum("...hqk,...khc->...qhc", a, v_blk)

    _, ys = jax.lax.scan(body, None, jnp.arange(0, n_padded, chunk))
    # ys: [n_chunks, *batch, chunk, J, h, c] -> [*batch, n_padded, J, h, c]
    ys = jnp.moveaxis(ys, 0, -5)
    ys = ys.reshape(*ys.shape[:-5], n_padded, *ys.shape[-3:])
    if pad:
        ys = jax.lax.slice_in_dim(ys, 0, n_row, axis=ys.ndim - 4)
    return ys
