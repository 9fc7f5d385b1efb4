"""Round-2 TPU session A3: bf16-matmul kernels — timings + fault isolation.

Kernels now keep matmul operands in bf16 (fp32 accumulate). Measures:
standalone kernel speed, hybrid step ± fused-LN (vs r1's 111.7), trace,
then packed-bwd fault isolation via OWLVIT_PACKED_BWD=dq|dkv|both.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = "/tmp/tpu_r2a3_results.jsonl"
T0 = time.time()


def log(name, **kw):
    rec = {"t": round(time.time() - T0, 1), "name": name, **kw}
    print(f"[{rec['t']:8.1f}s] {name}: {kw}", flush=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")


os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

(jnp.ones((256, 256)) @ jnp.ones((256, 256))).block_until_ready()
log("probe", backend=jax.default_backend())

# ---- standalone kernels, bf16 matmuls
from owlvit_tpu.ops import flash_attention as FA  # noqa: E402

B, S, H, hd = 32, 2305, 12, 64
D = H * hd
scale = hd**-0.5
rng = np.random.default_rng(0)
mk = lambda s: jnp.asarray(  # noqa: E731
    rng.normal(size=(B, S, D)).astype(np.float32), jnp.bfloat16
)
q2, k2, v2, co = mk(1), mk(2), mk(3), mk(4)

os.environ["OWLVIT_PACKED_FLASH"] = "1"
os.environ["OWLVIT_PACKED_BWD"] = "both"


def f_packed(q, k, v):
    o = FA.flash_attention_packed(q, k, v, scale=scale, num_heads=H, valid_len=S)
    return jnp.sum((o * co).astype(jnp.float32))


def f_hybrid(q, k, v):
    o = FA.flash_attention_hybrid(q, k, v, scale=scale, num_heads=H, valid_len=S)
    return jnp.sum((o * co).astype(jnp.float32))


def timeit(fn, *args, n=10):
    r = fn(*args)
    jax.block_until_ready(r)
    t = time.time()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.time() - t) / n * 1000


try:
    fwd = jax.jit(
        lambda q, k, v: FA.flash_attention_packed(
            q, k, v, scale=scale, num_heads=H, valid_len=S
        )
    )
    log("packed_fwd_ms", ms=round(timeit(fwd, q2, k2, v2), 2))
    gp = jax.jit(jax.grad(f_packed, argnums=(0, 1, 2)))
    log("packed_grad_ms", ms=round(timeit(gp, q2, k2, v2), 2))
    gh = jax.jit(jax.grad(f_hybrid, argnums=(0, 1, 2)))
    log("hybrid_grad_ms", ms=round(timeit(gh, q2, k2, v2), 2))
    g_pk = gp(q2, k2, v2)
    g_hy = gh(q2, k2, v2)
    errs = {
        n: float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        for n, a, b in zip("qkv", g_pk, g_hy)
    }
    log("packed_vs_hybrid_grad_maxdiff", **errs)
    del fwd, gp, gh, g_pk, g_hy
except Exception as e:  # noqa: BLE001
    log("standalone_FAILED", err=repr(e)[:400])

import bench  # noqa: E402


def run(name, packed, fused, bwd_mode="both", trace_dir=None):
    os.environ["OWLVIT_PACKED_FLASH"] = "1" if packed else "0"
    os.environ["OWLVIT_FUSED_LN"] = "1" if fused else "0"
    os.environ["OWLVIT_PACKED_BWD"] = bwd_mode
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
        log(name + "_FAILED", err=repr(e)[:400])
        return False


run("hybrid_b32", packed=False, fused=False,
    trace_dir="/tmp/trace_hybrid_bf16")
run("hybrid_fused_b32", packed=False, fused=True)
ok_dq = run("packed_dq_b32", packed=True, fused=False, bwd_mode="dq")
ok_dkv = run("packed_dkv_b32", packed=True, fused=False, bwd_mode="dkv")
run("packed_both_b32", packed=True, fused=False, bwd_mode="both")
log("done")
