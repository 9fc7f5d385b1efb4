"""Device mesh construction.

The reference has no parallelism at all (SURVEY §2.3: no DP/TP/PP, no
collectives, batch=1 on one GPU). Here scaling is GSPMD-native: a
`jax.sharding.Mesh` with axes

  "data"  — batch (data parallelism; gradient all-reduce rides ICI)
  "model" — tensor parallelism over attention heads / MLP hidden dim
            (unused = size 1 for B/32-B/16; sized up for L/14+)

and NamedSharding annotations; XLA inserts all collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def create_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ("data", "model") mesh. Defaults: all devices on "data"."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))
