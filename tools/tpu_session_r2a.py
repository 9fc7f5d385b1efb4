"""Round-2 TPU session A: validate new kernels + A/B step timings.

ONE process, shapes batched per CLAUDE.md compile rules. Order is
safest-first so a late device fault doesn't lose earlier measurements:

  1. probe matmul (chip claim sanity)
  2. standalone packed flash fwd+bwd at full B/16 b32 shape vs the
     transposed kernels (on-chip differential + timing)
  3. fp32 batch-1 k=1 reference baseline step (corrected ADVICE config)
  4. hybrid + fused-LN train step (safe config, expected winner floor)
  5. trace of (4)
  6. packed + fused-LN train step (round-1 fault territory — LAST)

Writes incremental JSON lines to /tmp/tpu_r2a_results.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = "/tmp/tpu_r2a_results.jsonl"


def log(name, **kw):
    rec = {"t": round(time.time() - T0, 1), "name": name, **kw}
    print(f"[{rec['t']:8.1f}s] {name}: {kw}", flush=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")


T0 = time.time()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

# ---- 1. probe
x = jnp.ones((256, 256))
y = (x @ x).block_until_ready()
log("probe", backend=jax.default_backend(), dev=str(jax.devices()[0]))

# ---- 2. standalone kernels at full B/16 shape
from owlvit_tpu.ops import flash_attention as FA  # noqa: E402

B, S, H, hd = 32, 2305, 12, 64
D = H * hd
S_pad = ((S + FA.BLOCK_Q - 1) // FA.BLOCK_Q) * FA.BLOCK_Q
scale = hd**-0.5
rng = np.random.default_rng(0)
q2 = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32), jnp.bfloat16)
k2 = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32), jnp.bfloat16)
v2 = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32), jnp.bfloat16)
co = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32), jnp.bfloat16)

os.environ["OWLVIT_PACKED_FLASH"] = "1"


def f_packed(q, k, v):
    o = FA.flash_attention_packed(q, k, v, scale=scale, num_heads=H, valid_len=S)
    return jnp.sum((o * co).astype(jnp.float32))


def f_hybrid(q, k, v):
    o = FA.flash_attention_hybrid(q, k, v, scale=scale, num_heads=H, valid_len=S)
    return jnp.sum((o * co).astype(jnp.float32))


try:
    gp = jax.jit(jax.grad(f_packed, argnums=(0, 1, 2)))
    t = time.time()
    g_pk = gp(q2, k2, v2)
    jax.block_until_ready(g_pk)
    log("packed_bwd_compile_run", secs=round(time.time() - t, 1))
    gh = jax.jit(jax.grad(f_hybrid, argnums=(0, 1, 2)))
    g_hy = gh(q2, k2, v2)
    jax.block_until_ready(g_hy)
    errs = {}
    for n, a, b in zip("qkv", g_pk, g_hy):
        d = jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
        errs[n] = float(d)
    log("packed_vs_hybrid_grad_maxdiff", **errs)

    # timing: packed grad vs hybrid grad
    for name, fn in [("packed_grad", gp), ("hybrid_grad", gh)]:
        r = fn(q2, k2, v2)
        jax.block_until_ready(r)
        t = time.time()
        for _ in range(10):
            r = fn(q2, k2, v2)
        jax.block_until_ready(r)
        log(name, ms=round((time.time() - t) / 10 * 1000, 2))
    PACKED_KERNELS_OK = True
except Exception as e:  # noqa: BLE001
    log("packed_standalone_FAILED", err=repr(e)[:500])
    PACKED_KERNELS_OK = False

# ---- 3. corrected fp32 baseline (batch 1, k=1)
import bench  # noqa: E402

os.environ["OWLVIT_PACKED_FLASH"] = "0"
os.environ["OWLVIT_FUSED_LN"] = "0"
try:
    t = time.time()
    step_r, state_r, data_r = bench._build("b16", 1, "float32", trainable_last_k=1)
    sps_r, loss_r = bench._measure(step_r, state_r, data_r, 10)
    log("baseline_fp32_b1_k1", imgs_per_sec=round(sps_r, 3),
        loss=float(loss_r), compile_secs=round(time.time() - t, 1))
    del step_r, state_r, data_r
except Exception as e:  # noqa: BLE001
    log("baseline_FAILED", err=repr(e)[:500])

# ---- 4. hybrid + fused LN train step
os.environ["OWLVIT_FUSED_LN"] = "1"
try:
    t = time.time()
    step_h, state_h, data_h = bench._build("b16", 32, "bfloat16", trainable_last_k=1)
    sps, loss = bench._measure(step_h, state_h, data_h, 20)
    log("hybrid_fused_b32", imgs_per_sec=round(sps * 32, 2), loss=float(loss),
        compile_secs=round(time.time() - t, 1))
    # ---- 5. trace it
    os.makedirs("/tmp/trace_hybrid_fused", exist_ok=True)
    with jax.profiler.trace("/tmp/trace_hybrid_fused"):
        for _ in range(5):
            state_h, loss = step_h(state_h, data_h)
        jax.block_until_ready(loss)
    log("trace_hybrid_fused", dir="/tmp/trace_hybrid_fused")
    del step_h, state_h, data_h
except Exception as e:  # noqa: BLE001
    log("hybrid_fused_FAILED", err=repr(e)[:500])

# ---- 6. packed + fused LN train step (round-1 fault territory)
if PACKED_KERNELS_OK:
    os.environ["OWLVIT_PACKED_FLASH"] = "1"
    try:
        t = time.time()
        step_p, state_p, data_p = bench._build(
            "b16", 32, "bfloat16", trainable_last_k=1
        )
        sps, loss = bench._measure(step_p, state_p, data_p, 20)
        log("packed_fused_b32", imgs_per_sec=round(sps * 32, 2),
            loss=float(loss), compile_secs=round(time.time() - t, 1))
        os.makedirs("/tmp/trace_packed_fused", exist_ok=True)
        with jax.profiler.trace("/tmp/trace_packed_fused"):
            for _ in range(5):
                state_p, loss = step_p(state_p, data_p)
            jax.block_until_ready(loss)
        log("trace_packed_fused", dir="/tmp/trace_packed_fused")
    except Exception as e:  # noqa: BLE001
        log("packed_fused_FAILED", err=repr(e)[:500])

log("done")
