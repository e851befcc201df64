"""Tensor (model) parallelism via GSPMD weight sharding.

The reference has no model parallelism at all — its only distribution is
Lightning DDP gradient all-reduce (train.py:54-65) and process-per-GPU
sampling fan-out (multiprocessor.py:59-100). This module adds the
TPU-native third axis: weights sharded over a 'model' mesh axis, with
XLA's GSPMD propagating the activation shardings and inserting the
collectives (psum over ICI). No module code changes — the plan is a
path-pattern -> PartitionSpec table applied to the parameter pytree, the
same annotate-and-let-XLA-partition recipe the scaling book prescribes.

Sharding plan (Megatron-style pairs; a dim is sharded only when it is
divisible by the 'model' axis size, otherwise that weight stays
replicated, so any axis size is always *correct*):

  * pair transition (pair_stack.py PairTransition): linear_1 out-dim +
    bias sharded, linear_2 in-dim sharded -> the [.., 4*c_p] hidden lives
    sharded; one psum after the down-projection.
  * triangle multiplicative update: the a/b projections and their gates
    out-dim sharded -> the O(N^3) channel einsum 'bikc,bjkc->bijc' is
    elementwise in the sharded channel (zero comm); linear_z in-dim
    sharded (psum); the output gate linear_g stays replicated (it gates
    the already-reduced output); layer_norm_out's moments over the
    sharded channel are GSPMD-reduced.
  * triangle attention mha: q/k/v/g projections out-dim sharded — the
    reshape [..., H*c] -> [..., H, c] is head-major (primitives.py:124),
    so each shard holds whole heads when axis_size | H; linear_o in-dim
    sharded (psum); the triangle-bias head projection out-dim sharded.
  * IPA (structure.py): q/kv/point/bias-head projections out-dim sharded
    (head-major, H=12), linear_out in-dim sharded. Caveat: linear_out's
    input is a concat of per-head blocks from four components
    (structure.py:106), so the flat in-dim shard is not block-aligned
    with the activation layout — GSPMD inserts the reshard; numerics are
    exact, the comm is the documented cost of not rewriting the module.
  * structure transition: linear_1 out / linear_2 in, linear_3
    replicated (three chained linears only pair up once).
  * everything else (LayerNorms, down-proj biases, bb_update, feature
    nets, head_weights) replicated — they are O(c) or feed replicated
    activations.

At the flagship width this shards ~85% of parameter bytes at axis size 2
or 4. Training composes: gradients adopt the weight shardings (the
optimizer update is elementwise), so each model shard's Adam state also
shrinks by the axis size.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, which dim of the weight to shard). Paths are '/'-joined
# flax param paths, e.g. "params/pair_transform_net/layer_0/
# pair_transition/linear_1/Dense_0/kernel". Kernels are [in, out];
# "out" = shard dim -1, "in" = shard dim 0, "vec" = shard the only dim
# (biases of out-sharded projections).
_RULES = (
    # --- pair transition (up/down pair) ---
    (r"pair_transition/linear_1/Dense_0/kernel$", "out"),
    (r"pair_transition/linear_1/Dense_0/bias$", "vec"),
    (r"pair_transition/linear_2/Dense_0/kernel$", "in"),
    # --- triangle multiplicative update: hidden channel ---
    (r"tri_mul_(in|out)/linear_[ab]_[pg]/Dense_0/kernel$", "out"),
    (r"tri_mul_(in|out)/linear_[ab]_[pg]/Dense_0/bias$", "vec"),
    (r"tri_mul_(in|out)/linear_z/Dense_0/kernel$", "in"),
    # --- triangle attention: heads ---
    (r"tri_att_(start|end)/mha/linear_[qkvg]/Dense_0/kernel$", "out"),
    (r"tri_att_(start|end)/mha/linear_g/Dense_0/bias$", "vec"),
    (r"tri_att_(start|end)/mha/linear_o/Dense_0/kernel$", "in"),
    (r"tri_att_(start|end)/linear/Dense_0/kernel$", "out"),  # bias heads
    # --- IPA: heads ---
    (r"ipa/linear_(q|kv|q_points|kv_points|b)/Dense_0/kernel$", "out"),
    (r"ipa/linear_(q|kv|q_points|kv_points|b)/Dense_0/bias$", "vec"),
    (r"ipa/linear_out/Dense_0/kernel$", "in"),
    # --- structure transition (first up/down pair of the 3-chain) ---
    (r"transition/layer_0_linear_1/Dense_0/kernel$", "out"),
    (r"transition/layer_0_linear_1/Dense_0/bias$", "vec"),
    (r"transition/layer_0_linear_2/Dense_0/kernel$", "in"),
)
_COMPILED = tuple((re.compile(pat), mode) for pat, mode in _RULES)

AXIS = "model"


def tp_spec(path: str, shape: Sequence[int], axis_size: int) -> P:
    """PartitionSpec for one weight. Replicated unless a rule matches AND
    the target dim is divisible by the axis size."""
    for pat, mode in _COMPILED:
        if pat.search(path):
            dim = {"out": len(shape) - 1, "in": 0, "vec": 0}[mode]
            if shape[dim] % axis_size == 0:
                spec = [None] * len(shape)
                spec[dim] = AXIS
                return P(*spec)
            return P()
    return P()


def _paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    names = [
        "/".join(
            str(p.key) if hasattr(p, "key") else str(getattr(p, "idx", p))
            for p in path
        )
        for path, _ in flat
    ]
    return flat, treedef, names


def tp_shardings(params, mesh: Mesh):
    """NamedSharding pytree for a param tree (structure-matched)."""
    axis_size = dict(mesh.shape)[AXIS]
    flat, treedef, names = _paths(params)
    shardings = [
        NamedSharding(mesh, tp_spec(name, leaf.shape, axis_size))
        for name, (_, leaf) in zip(names, flat)
    ]
    return jax.tree_util.tree_unflatten(treedef, shardings)


def place_params(params, mesh: Mesh):
    """device_put the param tree with the TP plan."""
    return jax.tree_util.tree_map(
        jax.device_put, params, tp_shardings(params, mesh)
    )


def place_train_state(state, mesh: Mesh):
    """Place a train.TrainState: params, EMA and the optax Adam moments
    with the TP plan (moment trees mirror the param tree structure
    exactly, so each model shard's optimizer state shrinks too), scalars
    replicated."""
    params_sh = tp_shardings(state.params, mesh)
    repl = NamedSharding(mesh, P())

    def like_params(tree):
        return jax.tree_util.tree_map(jax.device_put, tree, params_sh)

    def one_opt(entry):
        # optax.ScaleByAdamState(count, mu, nu); other entries replicated.
        if hasattr(entry, "mu") and hasattr(entry, "nu"):
            return entry._replace(
                mu=like_params(entry.mu),
                nu=like_params(entry.nu),
                count=jax.device_put(entry.count, repl),
            )
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), entry)

    opt_state = state.opt_state
    if isinstance(opt_state, tuple) and not hasattr(opt_state, "_fields"):
        opt_state = tuple(one_opt(e) for e in opt_state)
    else:
        opt_state = one_opt(opt_state)
    return state._replace(
        params=like_params(state.params),
        opt_state=opt_state,
        step=jax.device_put(state.step, repl),
        ema=like_params(state.ema) if state.ema is not None else None,
    )


def tp_stats(params, mesh: Mesh) -> Dict[str, Any]:
    """How much of the model the plan actually shards (for logs/tests)."""
    axis_size = dict(mesh.shape)[AXIS]
    flat, _, names = _paths(params)
    total = sharded = 0
    for name, (_, leaf) in zip(names, flat):
        nbytes = int(np.prod(leaf.shape)) * leaf.dtype.itemsize
        total += nbytes
        if tp_spec(name, leaf.shape, axis_size) != P():
            sharded += nbytes
    return {
        "axis_size": axis_size,
        "total_mb": round(total / 2**20, 2),
        "sharded_frac": round(sharded / max(total, 1), 4),
    }


def create_tp_mesh(
    n_data: int = 1, n_model: int = 2, devices: Optional[Sequence] = None
) -> Mesh:
    """('data', 'model') mesh; 'model' innermost so its psums ride the
    fastest ICI links (delegates to create_mesh — one device-layout
    policy for all inner axes; pass n_seq there too for the 3-D
    ('data','seq','model') composition)."""
    from genie2_tpu.parallel.mesh import create_mesh

    return create_mesh(n_data, devices, n_model=n_model)
