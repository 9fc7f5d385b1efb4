"""Sharding rules: map the detector pytree onto the ("data", "model") mesh.

Tensor-parallel layout for the ViT encoder (Megatron-style, GSPMD-inserted
collectives):

  * q/k/v kernels [L, D, D]     -> shard output dim (heads) on "model"
  * attn out kernel [L, D, D]   -> shard input dim on "model" (row-parallel;
                                   XLA all-reduces the partial sums)
  * mlp fc1 kernel [L, D, F]    -> shard F on "model" (column-parallel)
  * mlp fc2 kernel [L, F, D]    -> shard F on "model" (row-parallel)
  * biases of column-parallel layers shard with their outputs
  * everything else (embeddings, LNs, heads, queries) replicated

Batches shard their leading axis on "data". Gradient all-reduce over "data"
is inserted by the partitioner — there is no hand-written communication.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_REPL = P()


def _spec_for(path: str) -> P:
    if "/attn/q/kernel" in path or "/attn/k/kernel" in path or "/attn/v/kernel" in path:
        return P(None, None, "model")
    if "/attn/q/bias" in path or "/attn/k/bias" in path or "/attn/v/bias" in path:
        return P(None, "model")
    if "/attn/out/kernel" in path:
        return P(None, "model", None)
    if "/mlp/fc1/kernel" in path:
        return P(None, None, "model")
    if "/mlp/fc1/bias" in path:
        return P(None, "model")
    if "/mlp/fc2/kernel" in path:
        return P(None, "model", None)
    return _REPL


def _keypath_str(kp) -> str:
    parts = []
    for k in kp:
        name = getattr(k, "key", None)
        parts.append(str(name if name is not None else k))
    return "/" + "/".join(parts)


def param_specs(params) -> dict:
    """PartitionSpec pytree for a (full or partitioned) param tree."""
    return jax.tree_util.tree_map_with_path(
        lambda kp, x: _spec_for(_keypath_str(kp)), params
    )


def batch_spec() -> P:
    return P("data")


def shard_params(params, mesh: Mesh):
    specs = param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def shard_batch(batch, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))), batch
    )


def _kp_keys(kp) -> tuple:
    out = []
    for k in kp:
        name = getattr(k, "key", None)
        if name is None:
            name = getattr(k, "name", None)  # NamedTuple fields
        if name is None:
            name = getattr(k, "idx", None)
        out.append(str(name if name is not None else k))
    return tuple(out)


def opt_state_specs(opt_state, params):
    """PartitionSpec pytree for an optax state, derived STRUCTURALLY.

    Optax states embed param-shaped pytrees (e.g. ScaleByAdamState.mu mirrors
    the params), so a state leaf's keypath ends with the keypath of the param
    it shadows. Any leaf whose keypath suffix + shape match a param gets that
    param's spec; everything else (step counters, factored moments, schedule
    state) is replicated. Works for any optax chain — no duck typing.
    """
    p_entries = []
    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = _kp_keys(kp)
        p_entries.append((keys, _spec_for("/" + "/".join(keys)), leaf.shape))
    # longest param path first, so the most specific suffix wins
    p_entries.sort(key=lambda e: -len(e[0]))

    def spec_for_leaf(kp, leaf):
        keys = _kp_keys(kp)
        shape = getattr(leaf, "shape", ())
        for pkeys, spec, pshape in p_entries:
            if (
                len(keys) >= len(pkeys)
                and keys[-len(pkeys) :] == pkeys
                and shape == pshape
            ):
                return spec
        return _REPL

    return jax.tree_util.tree_map_with_path(spec_for_leaf, opt_state)


def shard_state(state, mesh: Mesh):
    """Shard a TrainState: params + structurally matched opt_state,
    replicated step."""
    from owlvit_tpu.train.state import TrainState

    o_specs = opt_state_specs(state.opt_state, state.trainable)
    put = lambda x, s: jax.device_put(x, NamedSharding(mesh, s))  # noqa: E731
    return TrainState(
        trainable=shard_params(state.trainable, mesh),
        frozen=shard_params(state.frozen, mesh),
        opt_state=jax.tree.map(put, state.opt_state, o_specs),
        step=put(state.step, _REPL),
    )
