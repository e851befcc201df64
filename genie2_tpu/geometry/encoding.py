"""Sinusoidal encodings (residue index, chain index, diffusion timestep).

Behavioral counterpart of /root/reference/genie/utils/encoding.py:5-25:
interleaved cos (even channels) / sin (odd channels) with base N and a
1-indexed frequency ladder.
"""

from __future__ import annotations

import jax.numpy as jnp


def sinusoidal_encoding(v: jnp.ndarray, n: int, d: int) -> jnp.ndarray:
    """v: [*] scalar values -> [*, d] encoding.

    Even channels i hold cos(v * pi / n^(2*i/d)); odd channels i hold
    sin(v * pi / n^(2*(i+1)/d)) — exactly the reference's 1-indexed ladder.
    """
    k = jnp.arange(1, d + 1, dtype=jnp.float32)
    v = v.astype(jnp.float32)[..., None]
    sin_enc = jnp.sin(v * jnp.pi / (n ** (2 * k / d)))
    cos_enc = jnp.cos(v * jnp.pi / (n ** (2 * (k - 1) / d)))
    idx = jnp.arange(d)
    return jnp.where(idx % 2 == 0, cos_enc, sin_enc)
