"""Per-subsystem timing breakdown on the current jax backend.

Times repeated jitted invocations of (a) the full denoiser, (b) the pair
feature net, (c) the pair transform stack, (d) the structure net, and
(e) a raw triangle einsum, each as a scan so the host round-trip is
amortized and the tunneled backend's lazy sync can't lie. Run exclusively
(the tunneled chip crashes under concurrent clients).

Usage: python tools/perf_breakdown.py [L] [B] [ITERS]
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from genie2_tpu.config import Config
from genie2_tpu.features import batchify, create_empty_features, to_device
from genie2_tpu.geometry import Rigid, frenet_frames
from genie2_tpu.nn import Denoiser
from genie2_tpu.nn.policy import make_apply_fn

if os.environ.get("JAX_CACHE", "0") == "1":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

L = int(sys.argv[1]) if len(sys.argv) > 1 else 256
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 20
DTYPE = os.environ.get("BENCH_DTYPE", "fp32")
# Comma-separated probe selection: full,frames,pfn,ptn,sn,tri,tri2 (default all)
PROBES = set(os.environ.get("PROBES", "full,frames,pfn,ptn,sn,tri,tri2").split(","))


def timed_scan(name, step_fn, init):
    """scan step_fn ITERS times; report per-iter ms (scalar-fetch sync)."""

    @jax.jit
    def run(x):
        def body(carry, _):
            return step_fn(carry), None

        out, _ = jax.lax.scan(body, x, None, length=ITERS)
        return jax.tree_util.tree_map(
            lambda v: jnp.sum(v)
            if jnp.issubdtype(v.dtype, jnp.floating)
            else jnp.array(0.0),
            out,
        )

    s = run(init)  # compile+warmup
    float(sum(jax.device_get(jax.tree_util.tree_leaves(s))))
    t0 = time.perf_counter()
    s = run(init)
    float(sum(jax.device_get(jax.tree_util.tree_leaves(s))))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:34s} {dt:8.2f} ms/iter", flush=True)
    return dt


def main():
    overrides = {"maximumNumResidues": L}
    if os.environ.get("USE_PALLAS") == "1":
        overrides["usePallas"] = "True"
    config = Config(overrides=overrides)
    model = Denoiser.from_config(config)
    feats = to_device(batchify([create_empty_features([L]) for _ in range(B)]))
    t_vec = jnp.full((B,), 500, jnp.int32)

    @jax.jit
    def setup(key):
        trans = jax.random.normal(key, (B, L, 3), jnp.float32)
        rots = frenet_frames(trans, feats["chain_index"], feats["residue_mask"])
        params = model.init(jax.random.PRNGKey(1), Rigid(rots, trans), t_vec, feats)
        return trans, rots, params

    trans, rots, params = setup(jax.random.PRNGKey(0))
    apply_fn = make_apply_fn(model, DTYPE)

    print(f"L={L} B={B} iters={ITERS} dtype={DTYPE} device={jax.devices()[0]}")

    # Full denoiser (frames recomputed each iter like the sampler).
    def full_step(x):
        r = frenet_frames(x, feats["chain_index"], feats["residue_mask"])
        z = apply_fn(params, Rigid(r, x), t_vec, feats)["z"]
        return x - 0.001 * z

    if "full" in PROBES:
        timed_scan("full denoiser fwd + frames", full_step, trans)

    # Frenet frames alone.
    def frames_step(x):
        r = frenet_frames(x, feats["chain_index"], feats["residue_mask"])
        return x + 1e-6 * r[..., 0]

    if "frames" in PROBES:
        timed_scan("frenet frames", frames_step, trans)

    # Submodule timings via closures over params sub-trees.
    p0 = params["params"]
    c_p = config.model["c_p"]
    c_s = config.model["c_s"]

    from genie2_tpu.nn.feature_nets import PairFeatureNet, SingleFeatureNet
    from genie2_tpu.nn.pair_stack import PairTransformNet
    from genie2_tpu.nn.structure import StructureNet

    cast = jnp.bfloat16 if DTYPE in ("bf16", "bfloat16") else jnp.float32
    sfn = SingleFeatureNet(
        c_s=c_s,
        n_timestep=config.diffusion["n_timestep"],
        c_pos_emb=config.model["c_pos_emb"],
        c_chain_emb=config.model["c_chain_emb"],
        c_timestep_emb=config.model["c_timestep_emb"],
        max_n_res=config.io["max_n_res"],
        max_n_chain=config.io["max_n_chain"],
    )
    sfn_params = {"params": p0["single_feature_net"]}
    s_act = jax.jit(
        lambda: sfn.apply(sfn_params, Rigid(rots, trans), t_vec, feats).astype(cast)
    )()

    pfn = PairFeatureNet(
        c_s=c_s,
        c_p=c_p,
        n_timestep=config.diffusion["n_timestep"],
        relpos_k=config.model["relpos_k"],
        template_dist_min=config.model["template_dist_min"],
        template_dist_step=config.model["template_dist_step"],
        template_dist_n_bin=config.model["template_dist_n_bin"],
    )
    pfn_params = jax.tree_util.tree_map(
        lambda x: x.astype(cast), {"params": p0["pair_feature_net"]}
    )

    def pfn_step(s):
        p = pfn.apply(pfn_params, s, Rigid(rots.astype(cast), trans.astype(cast)), t_vec, feats)
        return s + 1e-6 * p.mean(axis=(2, 3))[..., None]

    if "pfn" in PROBES:
        timed_scan("pair feature net", pfn_step, s_act)

    ptn = PairTransformNet(
        c_p=c_p,
        n_pair_transform_layer=config.model["n_pair_transform_layer"],
        include_mul_update=config.model["include_mul_update"],
        include_tri_att=config.model["include_tri_att"],
        c_hidden_mul=config.model["c_hidden_mul"],
        c_hidden_tri_att=config.model["c_hidden_tri_att"],
        n_head_tri=config.model["n_head_tri"],
        tri_dropout=config.model["tri_dropout"],
        pair_transition_n=config.model["pair_transition_n"],
        use_pallas=config.tpu.get("use_pallas", False),
    )
    ptn_params = jax.tree_util.tree_map(
        lambda x: x.astype(cast), {"params": p0["pair_transform_net"]}
    )
    p_act = jnp.zeros((B, L, L, c_p), cast)

    def ptn_step(p):
        return ptn.apply(ptn_params, p, feats) * 0.5

    if "ptn" in PROBES:
        timed_scan("pair transform stack (5 layers)", ptn_step, p_act)

    sn = StructureNet(
        c_s=c_s,
        c_p=c_p,
        n_structure_layer=config.model["n_structure_layer"],
        n_structure_block=config.model["n_structure_block"],
        c_hidden_ipa=config.model["c_hidden_ipa"],
        n_head_ipa=config.model["n_head_ipa"],
        n_qk_point=config.model["n_qk_point"],
        n_v_point=config.model["n_v_point"],
        ipa_dropout=config.model["ipa_dropout"],
        n_structure_transition_layer=config.model["n_structure_transition_layer"],
        structure_transition_dropout=config.model["structure_transition_dropout"],
    )
    sn_params = jax.tree_util.tree_map(
        lambda x: x.astype(cast), {"params": p0["structure_net"]}
    )

    def sn_step(s):
        states, ts2 = sn.apply(
            sn_params, s, p_act, Rigid(rots.astype(cast), trans.astype(cast)), feats
        )
        return s + 1e-6 * states[-1]

    if "sn" in PROBES:
        timed_scan("structure net (8 IPA layers)", sn_step, s_act)

    # Raw triangle einsum, both layouts.
    a = jnp.ones((B, L, L, 128), cast)

    def tri_step(a):
        x = jnp.einsum("...ikc,...jkc->...ijc", a, a)
        return a + 1e-9 * x

    if "tri" in PROBES:
        timed_scan("raw tri einsum [B,N,N,C]", tri_step, a)

    a2 = jnp.ones((B, 128, L, L), cast)

    def tri_step2(a):
        x = jnp.einsum("...cik,...cjk->...cij", a, a)
        return a + 1e-9 * x

    if "tri2" in PROBES:
        timed_scan("raw tri einsum [B,C,N,N]", tri_step2, a2)


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
