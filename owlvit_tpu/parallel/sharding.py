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
    """ONE rendering of tree keypaths (delegates to _kp_keys): param_specs
    and opt_state_specs must agree on the path format, or a rule touching
    an indexed/named segment would match in one and not the other."""
    return "/" + "/".join(_kp_keys(kp))


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


# --------------------------------------------------------------------------
# Sharded activation pool (multi-chip training.cache_backbone).
#
# On one chip the cached frozen-backbone activations live in a single HBM
# array (trainer device store). Replicating that pool across a data-parallel
# mesh would multiply its footprint by dp; instead the pool rows shard over
# the "data" axis and each rank gathers ONLY its own rows via shard_map —
# zero collectives, provided the sampler aligns batches to the row sharding
# (shard_aligned_order below: global batch = dp sub-batches, sub-batch r
# drawn from shard r's contiguous row range).
# --------------------------------------------------------------------------


def shard_act_pool(acts_all, mesh: Mesh):
    """Place a [N, S, D] activation pool with rows sharded on "data"."""
    return jax.device_put(
        acts_all, NamedSharding(mesh, P("data", None, None))
    )


def local_gather(acts_all, idxs, mesh: Mesh, axis: str = "data"):
    """Gather pool rows with per-rank-local indexing (no collectives).

    acts_all: [N, ...] (any trailing rank — [N, S, D] activations or
              [N, S] per-token quant scales), rows sharded over `axis`
              (N % dp == 0).
    idxs:     [B] GLOBAL row indices, sharded over `axis` (B % dp == 0),
              where idxs shard r only addresses rows of acts shard r —
              what shard_aligned_order produces. Returns [B, ...] sharded
              over `axis`.
    """
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    N = acts_all.shape[0]
    dp = mesh.shape[axis]
    assert N % dp == 0 and idxs.shape[0] % dp == 0
    row = P(axis, *([None] * (acts_all.ndim - 1)))

    def body(a_loc, i_loc):
        base = jax.lax.axis_index(axis) * (N // dp)
        return a_loc[i_loc - base]

    return shard_map(
        body,
        mesh=mesh,
        in_specs=(row, P(axis)),
        out_specs=row,
    )(acts_all, idxs)


def shard_aligned_order(n: int, dp: int, *, seed: int = 0):
    """Per-epoch per-shard sample orders compatible with local_gather.

    Rows [0, n) are owned contiguously: shard r owns [r*n//dp, (r+1)*n//dp).
    Returns [dp, n//dp]: row r is a shuffle of shard r's row range.
    shard_aligned_batches slices these into aligned global batches.
    """
    import numpy as np

    per = n // dp
    rng = np.random.default_rng(seed)
    shard_orders = []
    for r in range(dp):
        rows = np.arange(r * per, (r + 1) * per)
        rng.shuffle(rows)
        shard_orders.append(rows)
    # interleave: [per, dp] -> batches slice contiguous runs of each shard
    return np.stack(shard_orders, axis=0)  # [dp, per]; see batch assembly


def shard_aligned_batches(n: int, batch_size: int, dp: int, *, seed: int = 0):
    """Yield global index batches ([batch_size], B % dp == 0) aligned with
    the pool sharding: positions [r*B/dp, (r+1)*B/dp) address shard r."""
    import numpy as np

    assert batch_size % dp == 0
    sub = batch_size // dp
    orders = shard_aligned_order(n, dp, seed=seed)  # [dp, per]
    per = orders.shape[1]
    for start in range(0, per - per % sub, sub):
        yield np.concatenate([orders[r, start : start + sub] for r in range(dp)])


def local_scatter(acts_all, idxs, acts, mesh: Mesh, axis: str = "data"):
    """Write batch rows into the sharded pool with rank-local indexing.

    Inverse of local_gather: acts_all [N, ...] rows sharded over `axis`,
    idxs [B] global indices aligned to the sharding (shard_aligned_batches),
    acts [B, ...] sharded over `axis`. Returns the updated pool, still
    sharded — donate it at the jit boundary for an in-place update.
    """
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    N = acts_all.shape[0]
    dp = mesh.shape[axis]
    assert N % dp == 0 and idxs.shape[0] % dp == 0
    row = P(axis, *([None] * (acts_all.ndim - 1)))

    def body(a_loc, i_loc, v_loc):
        base = jax.lax.axis_index(axis) * (N // dp)
        return a_loc.at[i_loc - base].set(v_loc)

    return shard_map(
        body,
        mesh=mesh,
        in_specs=(row, P(axis), row),
        out_specs=row,
    )(acts_all, idxs, acts)
