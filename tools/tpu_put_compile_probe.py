"""Does a big REMOTE COMPILE or a big EXEC flip degraded-put mode?

The r5 put probes established the first-fetch rule (fast puts until the
process's first d2h fetch; BENCH.md r5c) — but those probes only ran tiny
eager ops. r5d_bulk then showed a DetectorServer process with NO prior
fetch putting at ~35 MB/s from its very first batch: the only big events
before it were the serve graph's remote compile (236 s) and its warmup
execs. This probe separates the candidate triggers in ONE process, in
order, with put batteries between each:

  A. 3x56 MB puts                      (baseline — expect fast)
  B. remote-compile the b32 serve-sized forward WITHOUT running it
     (jit(...).lower().compile())      -> puts  (H-compile)
  C. run the compiled exec once, block -> puts  (H-bigexec)
  D. tiny d2h fetch                    -> puts  (known flip, control)

Usage: python tools/tpu_put_compile_probe.py
Appends one JSON line to /tmp/tpu_runs.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

rec = {"name": "put_compile_probe", "backend": jax.default_backend()}
MB56 = np.zeros((32, 768 * 768 * 3), np.uint8)  # the serve b32 batch shape


def put_battery(tag, n=3):
    ms = []
    for _ in range(n):
        t0 = time.perf_counter()
        a = jax.block_until_ready(jax.device_put(MB56))
        ms.append(round((time.perf_counter() - t0) * 1e3, 1))
        del a
    rec[tag] = ms
    print(tag, ms, flush=True)


t_all = time.time()
try:
    put_battery("put_A_baseline")

    # B: remote-compile the real serving graph (forward + NMS at b32),
    # but do NOT execute it. AOT lower+compile goes through the same
    # remote-compile service; nothing runs on the chip.
    from owlvit_tpu.models import get_config, owlvit
    from owlvit_tpu.ops import nms as nms_ops
    from owlvit_tpu.ops.preprocess import normalize_image

    cfg = get_config("b16", dtype="bfloat16").replace(
        trainable_last_k=0, static_softmax=True)
    params = owlvit.init(jax.random.PRNGKey(0), cfg, num_queries=3 * 80)
    jax.block_until_ready(params)

    # A2: model init runs hundreds of tiny eager device programs — if THE
    # FLIP happens here, the compile battery below would be misattributed.
    put_battery("put_A2_after_init")

    def _serve(p, flat):
        img = flat.reshape(32, 768, 768, 3)
        boxes, sims = owlvit.forward_train(p, cfg, normalize_image(img))
        out = nms_ops.postprocess(boxes, sims, confidence_threshold=0.01,
                                  iou_threshold=0.6, top_k=200)
        return jnp.concatenate([
            out["boxes"], out["scores"][..., None],
            out["classes"].astype(jnp.float32)[..., None],
            out["valid"].astype(jnp.float32)[..., None],
        ], axis=-1).reshape(32, -1)

    t0 = time.perf_counter()
    compiled = jax.jit(_serve).lower(params, jnp.asarray(MB56)).compile()
    rec["compile_secs"] = round(time.perf_counter() - t0, 1)
    print("compiled in", rec["compile_secs"], "s", flush=True)

    put_battery("put_B_after_compile")

    # C: execute the compiled graph once (input already device-resident
    # so the exec itself involves no transfer), block on completion.
    dev = jax.block_until_ready(jax.device_put(MB56))
    t0 = time.perf_counter()
    out = jax.block_until_ready(compiled(params, dev))
    rec["exec_secs"] = round(time.perf_counter() - t0, 2)

    put_battery("put_C_after_exec")

    # D: the known flip — one tiny d2h fetch of a ready array.
    t0 = time.perf_counter()
    _ = np.asarray(out[:1, :8])
    rec["first_fetch_ms"] = round((time.perf_counter() - t0) * 1e3, 1)

    put_battery("put_D_after_fetch")
    rec["ok"] = True
except Exception as e:  # noqa: BLE001
    rec.update(ok=False, err=repr(e)[:400])
rec["secs"] = round(time.time() - t_all, 1)
print(json.dumps(rec), flush=True)
with open("/tmp/tpu_runs.jsonl", "a") as f:
    f.write(json.dumps(rec) + "\n")
sys.exit(0 if rec.get("ok") else 1)
