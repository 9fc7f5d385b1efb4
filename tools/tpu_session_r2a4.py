"""Round-2 TPU session A4: packed-bwd fault isolation + batch scaling.

No profiler in-process (jax.profiler.start/stop poisons the chip on this
relay unless it's the process's only job — learned in A3).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = "/tmp/tpu_r2a4_results.jsonl"
T0 = time.time()


def log(name, **kw):
    rec = {"t": round(time.time() - T0, 1), "name": name, **kw}
    print(f"[{rec['t']:8.1f}s] {name}: {kw}", flush=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")


os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

(jnp.ones((256, 256)) @ jnp.ones((256, 256))).block_until_ready()
log("probe", backend=jax.default_backend())

import bench  # noqa: E402


def run(name, batch=32, packed=False, bwd_mode="both", steps=20):
    os.environ["OWLVIT_PACKED_FLASH"] = "1" if packed else "0"
    os.environ["OWLVIT_FUSED_LN"] = "0"
    os.environ["OWLVIT_PACKED_BWD"] = bwd_mode
    try:
        t = time.time()
        step, state, data = bench._build("b16", batch, "bfloat16",
                                         trainable_last_k=1)
        sps, loss = bench._measure(step, state, data, steps)
        log(name, imgs_per_sec=round(sps * batch, 2), loss=float(loss),
            compile_secs=round(time.time() - t, 1))
        del step, state, data
        return True
    except Exception as e:  # noqa: BLE001
        log(name + "_FAILED", err=repr(e)[:400])
        return False


# batch scaling first (safe), then the fault-isolation runs last.
run("hybrid_b48", batch=48)
run("hybrid_b64", batch=64)
ok_dq = run("packed_dq_b32", packed=True, bwd_mode="dq")
ok_dkv = run("packed_dkv_b32", packed=True, bwd_mode="dkv")
if ok_dq and ok_dkv:
    run("packed_both_b32", packed=True, bwd_mode="both")
log("done")
