"""Round-2 TPU session A2: train-step A/B with the fixed fused-LN kernel.

Known so far (r2a): packed bwd kernels valid on chip and 29% faster than
hybrid standalone; corrected fp32 baseline 59.55 img/s; r1 reference point
(hybrid, no fused LN) 111.7 img/s. Here: hybrid+fused, packed+fused, and a
trace of the winner. Safest first.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = "/tmp/tpu_r2a2_results.jsonl"
T0 = time.time()


def log(name, **kw):
    rec = {"t": round(time.time() - T0, 1), "name": name, **kw}
    print(f"[{rec['t']:8.1f}s] {name}: {kw}", flush=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")


os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

x = jnp.ones((256, 256))
(x @ x).block_until_ready()
log("probe", backend=jax.default_backend())

import bench  # noqa: E402


def run(name, packed, fused, trace_dir=None):
    os.environ["OWLVIT_PACKED_FLASH"] = "1" if packed else "0"
    os.environ["OWLVIT_FUSED_LN"] = "1" if fused else "0"
    try:
        t = time.time()
        step, state, data = bench._build("b16", 32, "bfloat16",
                                         trainable_last_k=1)
        sps, loss = bench._measure(step, state, data, 20)
        log(name, imgs_per_sec=round(sps * 32, 2), loss=float(loss),
            compile_secs=round(time.time() - t, 1))
        if trace_dir:
            os.makedirs(trace_dir, exist_ok=True)
            with jax.profiler.trace(trace_dir):
                for _ in range(5):
                    state, l2 = step(state, data)
                jax.block_until_ready(l2)
            log(name + "_trace", dir=trace_dir)
        del step, state, data
        return True
    except Exception as e:  # noqa: BLE001
        log(name + "_FAILED", err=repr(e)[:500])
        return False


ok_h = run("hybrid_fused_b32", packed=False, fused=True)
ok_p = run("packed_fused_b32", packed=True, fused=True,
           trace_dir="/tmp/trace_packed_fused")
if not ok_p:
    run("packed_nofused_b32", packed=True, fused=False)
if not ok_h and ok_p:
    pass
log("done")
