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


def shard_state(state, mesh: Mesh):
    """Shard a TrainState: params + matching opt_state, replicated step."""
    from owlvit_tpu.train.state import TrainState

    trainable = shard_params(state.trainable, mesh)
    frozen = shard_params(state.frozen, mesh)

    t_specs = param_specs(state.trainable)

    # Shard optimizer moments with the same specs as their params.
    def shard_opt(opt_state):
        def try_shard(node):
            try:
                return jax.tree.map(
                    lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
                    node,
                    t_specs,
                )
            except (ValueError, TypeError):
                return jax.tree.map(
                    lambda x: jax.device_put(x, NamedSharding(mesh, _REPL)), node
                )

        out = []
        for part in opt_state:
            if hasattr(part, "_replace"):  # NamedTuple (ScaleByAdamState etc.)
                fields = {}
                for name in part._fields:
                    val = getattr(part, name)
                    if isinstance(val, dict):
                        fields[name] = try_shard(val)
                    else:
                        fields[name] = jax.device_put(
                            val, NamedSharding(mesh, _REPL)
                        )
                out.append(part._replace(**fields))
            else:
                out.append(part)
        return tuple(out)

    return TrainState(
        trainable=trainable,
        frozen=frozen,
        opt_state=shard_opt(state.opt_state),
        step=jax.device_put(state.step, NamedSharding(mesh, _REPL)),
    )
