"""Orbax checkpointing: params + optimizer state + step, with resume.

The reference never saves anything — the fine-tuned model is lost when the
process exits (SURVEY §5.4). Here every N epochs the full TrainState is
written via Orbax and training resumes from the latest checkpoint.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from .state import TrainState


def _ckpt_path(directory: str, step: int) -> str:
    return os.path.join(os.path.abspath(directory), f"step_{step:08d}")


def _prune_empty(tree):
    """Orbax refuses zero-size arrays (e.g. an empty frozen-layers slice when
    every encoder layer is trainable). Replace them with None placeholders;
    restore keeps the template's (empty) values for those leaves."""
    return jax.tree.map(
        lambda x: None if getattr(x, "size", 1) == 0 else x, tree
    )


def _abstract_leaf(x):
    """ShapeDtypeStruct carrying the template leaf's sharding when it has
    one: a mesh-sharded trainer restores each shard directly to its device
    instead of materializing host-replicated arrays and re-sharding."""
    if not hasattr(x, "dtype"):
        return x
    sh = getattr(x, "sharding", None)
    if isinstance(sh, jax.sharding.Sharding):
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sh)
    return jax.ShapeDtypeStruct(getattr(x, "shape", ()), x.dtype)


def save(directory: str, state: TrainState) -> str:
    step = int(state.step)
    path = _ckpt_path(directory, step)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _prune_empty(dict(state._asdict())), force=True)
    ckptr.wait_until_finished()
    return path


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = [
        int(d.split("_")[1])
        for d in os.listdir(directory)
        if d.startswith("step_") and d.split("_")[1].isdigit()
    ]
    return max(steps) if steps else None


def save_tree(directory: str, step: int, tree) -> str:
    """Save a bare pytree (e.g. the EMA of the trainable params) next to the
    TrainState checkpoints, keyed by the same step."""
    path = os.path.join(os.path.abspath(directory), f"tree_{step:08d}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _prune_empty(tree), force=True)
    ckptr.wait_until_finished()
    return path


def restore_tree(directory: str, step: int, template) -> Optional[object]:
    """Restore a pytree saved by save_tree at `step` (None if absent)."""
    path = os.path.join(os.path.abspath(directory), f"tree_{step:08d}")
    if not os.path.isdir(path):
        return None
    ckptr = ocp.StandardCheckpointer()
    abstract = _prune_empty(jax.tree.map(_abstract_leaf, template))
    restored = ckptr.restore(path, abstract)
    return jax.tree.map(
        lambda t, r: t if r is None else r, template, restored,
        is_leaf=lambda x: x is None,
    )


def prune_steps(directory: str, keep_step: int) -> None:
    """Delete step_*/tree_* checkpoints other than keep_step (used by the
    best-checkpoint dir, which should hold exactly one step)."""
    import shutil

    if not os.path.isdir(directory):
        return
    for d in os.listdir(directory):
        for prefix in ("step_", "tree_"):
            if d.startswith(prefix) and d[len(prefix):].isdigit():
                if int(d[len(prefix):]) != keep_step:
                    shutil.rmtree(os.path.join(directory, d),
                                  ignore_errors=True)


def restore(directory: str, template: TrainState) -> Optional[TrainState]:
    """Restore the latest checkpoint into the template's structure."""
    step = latest_step(directory)
    if step is None:
        return None
    ckptr = ocp.StandardCheckpointer()
    tmpl = dict(template._asdict())
    abstract = _prune_empty(jax.tree.map(_abstract_leaf, tmpl))
    restored = ckptr.restore(_ckpt_path(directory, step), abstract)
    # re-insert the template's zero-size leaves where we saved None
    merged = jax.tree.map(
        lambda t, r: t if r is None else r, tmpl, restored,
        is_leaf=lambda x: x is None,
    )
    return TrainState(**merged)
