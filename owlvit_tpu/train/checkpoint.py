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


def save(directory: str, state: TrainState) -> str:
    step = int(state.step)
    path = _ckpt_path(directory, step)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, dict(state._asdict()), force=True)
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


def restore(directory: str, template: TrainState) -> Optional[TrainState]:
    """Restore the latest checkpoint into the template's structure."""
    step = latest_step(directory)
    if step is None:
        return None
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(getattr(x, "shape", ()), x.dtype)
        if hasattr(x, "dtype")
        else x,
        dict(template._asdict()),
    )
    restored = ckptr.restore(_ckpt_path(directory, step), abstract)
    return TrainState(**restored)
