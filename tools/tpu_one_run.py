"""Single-purpose TPU measurement: ONE config per process (the relay
cascades failures within a process, so every experiment gets its own).

Usage: python tools/tpu_one_run.py NAME [batch=32] [packed=0] [bwd=both]
       [fused=0] [model=b16] [k=1] [dtype=bfloat16] [steps=20] [remat=0]
Appends one JSON line to /tmp/tpu_runs.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

args = dict(a.split("=", 1) for a in sys.argv[2:])
name = sys.argv[1]
batch = int(args.get("batch", 32))
steps = int(args.get("steps", 20))
model = args.get("model", "b16")
dtype = args.get("dtype", "bfloat16")
k = args.get("k", "1")
k = None if k in ("none", "null") else int(k)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ["OWLVIT_PACKED_FLASH"] = args.get("packed", "1")  # match production default
os.environ["OWLVIT_PACKED_BWD"] = args.get("bwd", "both")
os.environ["OWLVIT_FUSED_LN"] = args.get("fused", "0")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

rec = {"name": name, **{k2: v for k2, v in args.items()}}
t0 = time.time()
try:
    (jnp.ones((256, 256)) @ jnp.ones((256, 256))).block_until_ready()
    rec["probe_s"] = round(time.time() - t0, 1)
    import bench

    if args.get("remat") == "1":
        import owlvit_tpu.models.configs as _cfgs
        _orig = _cfgs.get_config
        def _patched(name, **kw):
            kw["remat"] = True
            return _orig(name, **kw)
        _cfgs.get_config = _patched
        import owlvit_tpu.models as _m
        _m.get_config = _patched
        import bench as _b
        _b.get_config = _patched  # in case of direct import

    t = time.time()
    step, state, data = bench._build(model, batch, dtype, trainable_last_k=k)
    sps, loss = bench._measure(step, state, data, steps)
    rec.update(
        imgs_per_sec=round(sps * batch, 2),
        loss=float(loss),
        compile_secs=round(time.time() - t, 1),
        ok=True,
    )
except Exception as e:  # noqa: BLE001
    rec.update(ok=False, err=repr(e)[:400])
print(rec, flush=True)
with open("/tmp/tpu_runs.jsonl", "a") as f:
    f.write(json.dumps(rec) + "\n")
sys.exit(0 if rec.get("ok") else 1)
