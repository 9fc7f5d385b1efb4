"""Probe host->device transfer sizes on the TPU relay (one process).

The r2 cached-backbone measurement died with UNAVAILABLE on a per-step
119.5 MB device_put; batch-48/64 train steps also fault. This bisects the
transfer size that the relay tolerates, and measures H2D bandwidth at each
surviving size — the number that decides whether a cached epoch streams
activations whole, chunked, or keeps them device-resident.

Usage: python tools/tpu_h2d_probe.py [sizes_mb...]  (default 8 16 32 64 96 128)
Appends one JSON line per size to /tmp/tpu_runs.jsonl.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sizes = [float(s) for s in sys.argv[1:]] or [8, 16, 32, 64, 96, 128]

(jnp.ones((256, 256)) @ jnp.ones((256, 256))).block_until_ready()

for mb in sizes:
    n = int(mb * 1e6 / 2)  # bf16 elements
    host = np.zeros((n,), np.uint16).view(jnp.bfloat16.dtype)
    rec = {"name": "h2d_probe", "mb": mb}
    try:
        t0 = time.perf_counter()
        a = jax.device_put(host)
        a.block_until_ready()
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            a = jax.device_put(host)
            a.block_until_ready()
        warm = (time.perf_counter() - t0) / reps
        rec.update(ok=True, cold_s=round(cold, 3), warm_s=round(warm, 3),
                   gbps=round(mb / 1e3 / warm, 2))
    except Exception as e:  # noqa: BLE001
        rec.update(ok=False, err=repr(e)[:200])
    print(rec, flush=True)
    with open("/tmp/tpu_runs.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")
    if not rec["ok"]:
        break  # failures cascade within a process — stop at first fault
