"""One-command on-chip flash-kernel parity check (VERDICT r2 weak #4).

Runs, in ONE process on the current backend (TPU on hardware, interpret on
CPU), the three attention implementations over the same random batch at the
B/16 train shape (S=2305 real tokens padded to 2432, bf16):

  * xla      — jnp reference (materialized scores, fp32 softmax)
  * hybrid   — packed pallas fwd + transposed pallas bwd
  * packed   — packed pallas fwd + packed pallas bwd (the shipped default)

and prints per-tensor max-ulp distances (bf16 integer-representation
distance) of outputs and input grads, pairwise. Paste the JSON line into
BENCH.md each round instead of session anecdotes.

Usage: python tools/tpu_kernel_parity.py [batch=4] [model=b16]
Appends one JSON line to /tmp/tpu_runs.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

args = dict(a.split("=", 1) for a in sys.argv[1:])
batch = int(args.get("batch", 4))
model = args.get("model", "b16")

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

if args.get("cpu") == "1":
    jax.config.update("jax_platforms", "cpu")

from owlvit_tpu.models import get_config  # noqa: E402
from owlvit_tpu.ops import flash_attention as fa  # noqa: E402


def bf16_ulp_dist(a, b):
    """Max distance in bf16 representation steps (monotonic int mapping)."""
    import ml_dtypes

    av = np.asarray(a, dtype=ml_dtypes.bfloat16).view(np.uint16).astype(np.int64)
    bv = np.asarray(b, dtype=ml_dtypes.bfloat16).view(np.uint16).astype(np.int64)
    # sign-magnitude -> offset binary so integer distance == representable steps
    av = np.where(av >= 0x8000, 0x8000 - av, av + 0x8000)
    bv = np.where(bv >= 0x8000, 0x8000 - bv, bv + 0x8000)
    return int(np.abs(av - bv).max())


def run_impl(make_loss, q, k, v, w):
    f = jax.jit(jax.value_and_grad(make_loss, argnums=(0, 1, 2)))
    out = f(q, k, v)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(q, k, v)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    (loss, grads) = out
    return float(loss), [np.asarray(g) for g in grads], dt


cfg = get_config(model).vision
H, hd, D = cfg.num_heads, cfg.head_dim, cfg.hidden_size
S_real = cfg.num_patches + 1
scale = hd ** -0.5

rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(batch, S_real, D)), jnp.bfloat16)
k = jnp.asarray(rng.normal(size=(batch, S_real, D)), jnp.bfloat16)
v = jnp.asarray(rng.normal(size=(batch, S_real, D)), jnp.bfloat16)
w = jnp.asarray(rng.normal(size=(batch, S_real, D)), jnp.bfloat16)


def xla_attn(q2, k2, v2):
    B, S, _ = q2.shape
    to4 = lambda x: x.reshape(B, S, H, hd)
    s = jnp.einsum(
        "bqhd,bkhd->bhqk", to4(q2), to4(k2),
        preferred_element_type=jnp.float32,
    ) * scale
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum(
        "bhqk,bkhd->bqhd", p.astype(v2.dtype), to4(v2),
        preferred_element_type=jnp.float32,
    )
    return o.reshape(B, S, D).astype(q2.dtype)


def loss_of(attn_fn):
    if args.get("scan") == "1":
        # Reproduce the TRAIN-STEP structure: the trainable tail runs the
        # kernel inside lax.scan (even at k=1), so its backward executes
        # inside a scanned loop — where the r3 fused kernel faulted while
        # running clean standalone. Inputs become scan xs (leading dim 1),
        # exactly like stacked layer params.
        def loss(q2, k2, v2):
            xs = (q2[None], k2[None], v2[None])

            def body(carry, x):
                qq, kk, vv = x
                return carry + attn_fn(qq, kk, vv).astype(jnp.float32), None

            o, _ = jax.lax.scan(body, jnp.zeros(q2.shape, jnp.float32), xs)
            return jnp.sum(o * w.astype(jnp.float32))

        return loss

    def loss(q2, k2, v2):
        o = attn_fn(q2, k2, v2)
        return jnp.sum(o.astype(jnp.float32) * w.astype(jnp.float32))

    return loss


# static=1: run the pallas variants with the fixed-shift softmax (the
# OWLVIT_STATIC_MAX constant, default 0.0) — kernels are gated to
# stop-gradient calls in the model, so the flag must be explicit here.
_static = args.get("static") == "1"


def packed(q2, k2, v2):
    return fa.flash_attention_packed(
        q2, k2, v2, scale=scale, num_heads=H, valid_len=None,
        static_softmax=_static,
    )


def hybrid(q2, k2, v2):
    return fa.flash_attention_hybrid(
        q2, k2, v2, scale=scale, num_heads=H, valid_len=None,
        static_softmax=_static,
    )


rec = {"name": "kernel_parity", "model": model, "batch": batch,
       "backend": jax.default_backend(), "S": S_real, "D": D}
t_start = time.time()
try:
    results = {}
    variants = [
        ("hybrid", hybrid, None),
        ("packed", packed, "both"),    # split dq + dkv kernels
        ("fused", packed, "fused"),    # r3 single dq+dk+dv kernel
        ("xla", xla_attn, None),       # last: heaviest compile (full scores)
    ]
    if "only" in args:  # e.g. only=fused,packed
        keep = set(args["only"].split(","))
        variants = [v for v in variants if v[0] in keep]
    for name, impl, bwd_mode in variants:
        if bwd_mode is not None:
            os.environ["OWLVIT_PACKED_BWD"] = bwd_mode
            jax.clear_caches()  # bwd mode is read at trace time
        print(f"compiling+running {name} ...", flush=True)
        loss, grads, dt = run_impl(loss_of(impl), q, k, v, w)
        results[name] = (loss, grads)
        rec[f"{name}_ms"] = round(dt * 1e3, 2)
        rec[f"{name}_loss"] = loss
        print(f"{name}: loss={loss:.6g} grad+fwd {dt*1e3:.1f} ms", flush=True)

    pairs = [("packed", "hybrid"), ("fused", "packed"), ("fused", "xla"),
             ("packed", "xla"), ("hybrid", "xla")]
    for a, b in [(a, b) for a, b in pairs if a in results and b in results]:
        ulps = [bf16_ulp_dist(ga, gb)
                for ga, gb in zip(results[a][1], results[b][1])]
        rels = [
            float(
                np.abs(ga.astype(np.float32) - gb.astype(np.float32)).max()
                / max(np.abs(gb.astype(np.float32)).max(), 1e-12)
            )
            for ga, gb in zip(results[a][1], results[b][1])
        ]
        rec[f"ulp_{a}_vs_{b}"] = {"dq": ulps[0], "dk": ulps[1], "dv": ulps[2]}
        rec[f"rel_{a}_vs_{b}"] = {
            "dq": round(rels[0], 8), "dk": round(rels[1], 8),
            "dv": round(rels[2], 8),
        }
        print(
            f"{a} vs {b}: max bf16-ulp dq={ulps[0]} dk={ulps[1]} dv={ulps[2]}"
            f"  max-rel dq={rels[0]:.2e} dk={rels[1]:.2e} dv={rels[2]:.2e}",
            flush=True,
        )
    rec["ok"] = True
    rec["secs"] = round(time.time() - t_start, 1)
except Exception as e:  # noqa: BLE001
    rec.update(ok=False, err=repr(e)[:400])
print(json.dumps(rec), flush=True)
with open("/tmp/tpu_runs.jsonl", "a") as f:
    f.write(json.dumps(rec) + "\n")
sys.exit(0 if rec.get("ok") else 1)
