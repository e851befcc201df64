"""Fused IPA Pallas kernel numerics (ops/ipa_fused.py).

The kernel fuses the attention middle of InvariantPointAttention
(nn/structure.py / reference invariant_point_attention.py:100-261):
logits (scalar qk + fused pair bias z@W_b + point distances) + mask +
online softmax + three value contractions. These tests pin it against a
jnp transcription and against the flax module end-to-end, in interpreter
mode (CPU); the speed verdict lives in tools/bench_ipa.py + BENCH_NOTES.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genie2_tpu.ops.ipa_fused import _reference_attention, fused_ipa_attention

H, C, PQ, PV, CZ = 4, 8, 4, 8, 16
N = 64


def make_inputs(n=N, seed=0, masked_tail=0):
    rng = np.random.default_rng(seed)
    f = lambda *s: rng.normal(size=s).astype(np.float32)
    q, k, v = f(n, H, C), f(n, H, C), f(n, H, C)
    q_pts, k_pts = f(n, H, PQ, 3) * 3, f(n, H, PQ, 3) * 3
    v_pts = f(n, H, PV, 3) * 3
    z = f(n, n, CZ)
    wb, bb = f(CZ, H) * 0.3, f(H) * 0.1
    hw = np.abs(f(H)) + 0.5
    mask = np.ones(n, np.float32)
    if masked_tail:
        mask[-masked_tail:] = 0.0
    return tuple(jnp.asarray(x) for x in (q, k, v, q_pts, k_pts, v_pts, z, wb, bb, hw, mask))


class TestFusedIPA:
    @pytest.mark.parametrize("tile", [32, 64])
    def test_matches_reference(self, tile):
        args = make_inputs()
        want = _reference_attention(*args)
        got = fused_ipa_attention(*args, tile_i=tile, tile_j=tile, interpret=True)
        for w, g, name in zip(want, got, ("o", "o_pt", "o_pair")):
            np.testing.assert_allclose(
                np.asarray(w), np.asarray(g), atol=2e-5, rtol=2e-5, err_msg=name
            )

    def test_masked_tail_real_rows_match(self):
        """Padded j-columns are excluded identically; real rows match the
        reference exactly (padded rows are dead downstream — the module's
        own mask-invariance tests cover that)."""
        args = make_inputs(masked_tail=16)
        want = _reference_attention(*args)
        got = fused_ipa_attention(*args, tile_i=32, tile_j=32, interpret=True)
        real = slice(0, N - 16)
        for w, g in zip(want, got):
            np.testing.assert_allclose(
                np.asarray(w)[real], np.asarray(g)[real], atol=2e-5, rtol=2e-5
            )

    def test_reference_matches_flax_module(self):
        """The jnp transcription reproduces the flax IPA end-to-end: wrap
        the kernel path (projections -> attention middle -> inverse frame
        map / norms / concat / linear_out) and compare to the module."""
        from genie2_tpu.geometry import Rigid
        from genie2_tpu.nn.structure import InvariantPointAttention

        n = 24
        rng = np.random.default_rng(3)
        s = jnp.asarray(rng.normal(size=(1, n, 16)).astype(np.float32))
        z = jnp.asarray(rng.normal(size=(1, n, n, CZ)).astype(np.float32))
        trans = jnp.asarray(rng.normal(size=(1, n, 3)).astype(np.float32) * 5)
        # Random rotations via QR.
        a = rng.normal(size=(1, n, 3, 3))
        qm, _ = np.linalg.qr(a)
        t = Rigid(jnp.asarray(qm.astype(np.float32)), trans)
        mask = jnp.ones((1, n), jnp.int32)

        ipa = InvariantPointAttention(
            c_s=16, c_z=CZ, c_hidden=C, no_heads=H,
            no_qk_points=PQ, no_v_points=PV,
        )
        params = ipa.init(jax.random.PRNGKey(0), s, z, t, mask)
        want = ipa.apply(params, s, z, t, mask)

        # Kernel-path wrapper using the module's own parameters.
        p = params["params"]
        dense = lambda name: (
            jnp.asarray(p[name]["Dense_0"]["kernel"]),
            jnp.asarray(p[name]["Dense_0"].get("bias", np.zeros(1))),
        )
        wq, bq = dense("linear_q")
        wkv, bkv = dense("linear_kv")
        wqp, bqp = dense("linear_q_points")
        wkvp, bkvp = dense("linear_kv_points")
        wb_, bb_ = dense("linear_b")
        wo, bo = dense("linear_out")
        hw = jax.nn.softplus(jnp.asarray(p["head_weights"]))

        s0, z0 = s[0], z[0]
        t0 = Rigid(t.rots[0], t.trans[0])
        q = (s0 @ wq + bq).reshape(n, H, C)
        kv = (s0 @ wkv + bkv).reshape(n, H, 2 * C)
        k, v = kv[..., :C], kv[..., C:]

        def to_pts(x, npts):
            x = jnp.stack(jnp.split(x, 3, axis=-1), axis=-1)  # [n, H*P, 3]
            x = t0.unsqueeze(-1).apply(x)
            return x.reshape(n, H, npts, 3)

        q_pts = to_pts(s0 @ wqp + bqp, PQ)
        kv_pts = to_pts(s0 @ wkvp + bkvp, PQ + PV)
        k_pts, v_pts = kv_pts[:, :, :PQ], kv_pts[:, :, PQ:]

        o, o_pt, o_pair = _reference_attention(
            q, k, v, q_pts, k_pts, v_pts, z0, wb_, bb_, hw,
            jnp.ones(n, jnp.float32),
        )
        o_pt_local = t0.unsqueeze(-1).unsqueeze(-1).invert_apply(o_pt)
        o_pt_norm = jnp.sqrt(jnp.sum(o_pt_local**2, axis=-1) + 1e-8)
        cat = jnp.concatenate(
            [
                o.reshape(n, H * C),
                o_pt_local.reshape(n, H * PV, 3)[..., 0],
                o_pt_local.reshape(n, H * PV, 3)[..., 1],
                o_pt_local.reshape(n, H * PV, 3)[..., 2],
                o_pt_norm.reshape(n, H * PV),
                o_pair.reshape(n, H * CZ),
            ],
            axis=-1,
        )
        got = cat @ wo + bo
        np.testing.assert_allclose(
            np.asarray(want)[0], np.asarray(got), atol=3e-5, rtol=3e-5
        )
