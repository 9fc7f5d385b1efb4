"""Why are H2D puts ~50x slower inside the serving process than in a bare
probe process? (r4c: the strictly-serial serve pipeline still paid 2.17 s
per 56 MB put with an IDLE device, while tpu_transfer_probe measures the
identical put at 39 ms.)

Candidate mechanisms, isolated here in ONE process by interleaving timed
put batteries with state changes:

  put_fresh            bare process, nothing live
  put_tree_small       after device_put of a 256-leaf tree (param-COUNT
                       effect: does every put revalidate live handles?)
  put_one_big          tree deleted, one 170 MB buffer live (BYTES effect)
  put_after_del        everything deleted + gc (backlog drain?)
  put_after_execs      after 20 jitted execs over the tree (exec-history /
                       bookkeeping-backlog effect)
  put_small_tree_live  1.7 MB put with the tree live (fixed per-RPC cost
                       vs bandwidth degradation)
  put_after_serve_init DetectorServer(warmup=True) constructed last — the
                       exact live state of the slow process (params tree +
                       compiled executables + idle worker threads)

Usage: python tools/tpu_put_state_probe.py [reps]   (default 3)
Appends one JSON line to /tmp/tpu_runs.jsonl.
"""

import gc
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
if "cpu" in sys.argv[1:]:
    jax.config.update("jax_platforms", "cpu")

(jnp.ones((256, 256)) @ jnp.ones((256, 256))).block_until_ready()

rec = {"name": "put_state_probe", "backend": jax.default_backend(),
       "reps": reps}
rng = np.random.default_rng(0)
B, S = 32, 768
img = rng.integers(0, 255, (B, S * S * 3), dtype=np.uint8)
small = rng.integers(0, 255, (1, S * S * 3), dtype=np.uint8)


def battery(key, payload=img):
    """reps timed puts; records mean AND each rep (slowness may decay).
    Three wait styles per battery — r4c showed block_until_ready(put) at
    1.5-2.1 s in the serve process while an UNBLOCKED put consumed by an
    exec fit inside a 0.8-0.9 s e2e, so the wait primitive itself is a
    suspect, separate from the transfer:
      <key>_ms         block_until_ready(put)    (the phases-mode pattern)
      <key>_rt_ms      np.asarray(put)           (round trip, no block —
                       an upper bound on the transfer itself)
      <key>_exec_ms    put -> tiny jitted consume -> block on the OUTPUT
                       (serve v3's non-phases pattern)"""
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(jnp.asarray(payload))
        times.append(round((time.perf_counter() - t0) * 1e3, 1))
    rec[key + "_ms"] = round(sum(times) / reps, 1)
    rec[key + "_each"] = times
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jnp.asarray(payload))
        times.append(round((time.perf_counter() - t0) * 1e3, 1))
    rec[key + "_rt_ms"] = round(sum(times) / reps, 1)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(_consume(jnp.asarray(payload)))
        times.append(round((time.perf_counter() - t0) * 1e3, 1))
    rec[key + "_exec_ms"] = round(sum(times) / reps, 1)


@jax.jit
def _consume(x):
    return x[:1, :8].astype(jnp.float32) + 1.0


try:
    # compile _consume for both payload shapes BEFORE any battery (remote
    # compiles must not pollute the timings)
    jax.block_until_ready(_consume(jnp.asarray(img)))
    jax.block_until_ready(_consume(jnp.asarray(small)))
    battery("put_fresh")

    # 256 small leaves ~ a params tree's handle count (B/16 has ~200 leaves)
    tree = {
        f"w{i}": jnp.asarray(rng.normal(size=(128, 128)), jnp.bfloat16)
        for i in range(256)
    }
    jax.block_until_ready(tree)
    battery("put_tree_small")

    del tree
    gc.collect()
    big = jnp.asarray(rng.normal(size=(85, 1024, 1024)), jnp.bfloat16)
    jax.block_until_ready(big)  # ~170 MB, ONE buffer
    battery("put_one_big")

    del big
    gc.collect()
    time.sleep(1)
    battery("put_after_del")

    tree = {
        f"w{i}": jnp.asarray(rng.normal(size=(128, 128)), jnp.bfloat16)
        for i in range(256)
    }

    @jax.jit
    def touch(t):
        return sum(jnp.sum(v) for v in t.values())

    jax.block_until_ready(touch(tree))
    for _ in range(20):
        out = touch(tree)
    jax.block_until_ready(out)
    battery("put_after_execs")
    battery("put_small_tree_live", small)
    del tree, out
    gc.collect()

    # ---- candidate mode-flip triggers, in contamination-aware order (a
    # trigger may degrade puts for the REST of the process — r4c probe:
    # plain put 36 ms at start, 2126 ms re-measured after the overlap
    # cases, idle device, same process). Each battery localizes the
    # earliest trigger; everything after a flip is contaminated.
    x_mm = jnp.ones((8192, 8192), jnp.bfloat16)

    @jax.jit
    def slow(x):
        return jax.lax.fori_loop(0, 10, lambda i, a: a @ x, x)

    jax.block_until_ready(slow(x_mm))  # compile + one big exec (~70 ms)
    for _ in range(3):
        out = slow(x_mm)
        jax.block_until_ready(out)  # big execs, no overlap, no fetch
    battery("put_after_big_execs")

    out = slow(x_mm)
    np.asarray(out)  # EAGER FETCH on an in-flight exec (the r3g serve op)
    battery("put_after_eager_fetch")

    out = slow(x_mm)
    jax.block_until_ready(jnp.asarray(img))  # H2D DURING the exec
    jax.block_until_ready(out)
    battery("put_after_overlap_put")
    del out, x_mm
    gc.collect()

    # the exact slow-process state: a warmed DetectorServer
    from owlvit_tpu.models import get_config, owlvit
    from owlvit_tpu.serve import DetectorServer

    cfg = get_config("b16", dtype="bfloat16")
    params = owlvit.init(jax.random.PRNGKey(0), cfg, num_queries=240)
    srv = DetectorServer(params, cfg, buckets=(32,), warmup=True)
    battery("put_after_serve_init")
    one = srv.submit(np.asarray(img[0].reshape(S, S, 3)))
    one.result(timeout=600)
    battery("put_after_one_request")
    srv.close()
    rec["ok"] = True
except Exception as e:  # noqa: BLE001
    rec.update(ok=False, err=repr(e)[:400])

print(json.dumps(rec), flush=True)
with open("/tmp/tpu_runs.jsonl", "a") as f:
    f.write(json.dumps(rec) + "\n")
sys.exit(0 if rec.get("ok") else 1)
