"""Put-state probe v2: WHAT flips a process into degraded-PUT mode?

The r4d v1 run answered two questions and destroyed the rest of its own
bisect: its first battery included an eager `np.asarray(jnp.asarray(img))`
round trip, which (a) ran at 15.5 s and (b) flipped the process — every
later case measured the degraded mode (3.2-8.2 s per 56 MB put), not its
nominal trigger. Hard facts from v1 (BENCH.md r4d): the flip trigger can be
as small as ONE eager fetch chained on an in-flight put; degraded mode is a
bandwidth collapse to ~9.4 MB/s (1.7 MB put 181 ms and 56 MB ~6 s), and
del+gc does not recover it.

v2 orders cases so each battery only ever follows PASSIVE state changes,
with the two suspected active triggers LAST:

  put_fresh            bare process (blocked-put battery ONLY — v1's rt/exec
                       styles are what contaminated everything)
  serial_loop          10x the serve v4 protocol: put -> block -> exec ->
                       block -> fetch(ready). Per-leg times. THE question:
                       does the strict protocol hold the fast mode?
  put_tree_live        after a settled 256-leaf param-tree put
  put_after_execs      after 20 small jitted execs (each blocked)
  put_after_big_execs  after 4 big matmul execs (each blocked)
  put_after_serve_init after DetectorServer(warmup=True) — now runs the
                       settle-every-put protocol itself
  put_after_request    after one served request
  put_after_unblocked_exec  TRIGGER A: exec dispatched on an in-flight put
                       (what serve/warmup did before r5)
  put_after_rt         TRIGGER B (v1's known flip): eager np.asarray of a
                       just-dispatched put
  small_tail           1.7 MB put at the end: if the process is degraded by
                       now, bandwidth-proportionality check (~180 ms when
                       degraded, ~2 ms fast)

Usage: python tools/tpu_put_state_probe.py [reps]   (default 3)
Appends one JSON line to /tmp/tpu_runs.jsonl.
"""

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

rec = {"name": "put_state_probe_v2", "backend": jax.default_backend(),
       "reps": reps}
rng = np.random.default_rng(0)
B, S = 32, 768
img = rng.integers(0, 255, (B, S * S * 3), dtype=np.uint8)
small = rng.integers(0, 255, (1, S * S * 3), dtype=np.uint8)


def battery(key, payload=img):
    """reps BLOCKED puts only (jax.block_until_ready(jnp.asarray(x))) — the
    one measurement style that is itself trigger-free."""
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(jnp.asarray(payload))
        times.append(round((time.perf_counter() - t0) * 1e3, 1))
    rec[key + "_ms"] = round(sum(times) / reps, 1)
    rec[key + "_each"] = times


@jax.jit
def _consume(x):
    return x[:1, :8].astype(jnp.float32) + 1.0


try:
    # compile for both payload shapes BEFORE any battery
    jax.block_until_ready(_consume(jnp.asarray(img)))
    jax.block_until_ready(_consume(jnp.asarray(small)))
    battery("put_fresh")

    # --- the serve v4 serial protocol, 10 iterations, per-leg timing ------
    legs = {"put": [], "exec": [], "fetch": []}
    for _ in range(10):
        t0 = time.perf_counter()
        dev = jax.block_until_ready(jnp.asarray(img))
        t1 = time.perf_counter()
        out = jax.block_until_ready(_consume(dev))
        t2 = time.perf_counter()
        np.asarray(out)  # fetch of a READY array
        t3 = time.perf_counter()
        legs["put"].append(round((t1 - t0) * 1e3, 1))
        legs["exec"].append(round((t2 - t1) * 1e3, 1))
        legs["fetch"].append(round((t3 - t2) * 1e3, 1))
    rec["serial_loop"] = legs
    battery("put_after_serial_loop")

    # --- passive states ----------------------------------------------------
    tree = {
        f"w{i}": jnp.asarray(rng.normal(size=(128, 128)), jnp.bfloat16)
        for i in range(256)
    }
    jax.block_until_ready(tree)
    battery("put_tree_live")

    @jax.jit
    def touch(t):
        return sum(jnp.sum(v) for v in t.values())

    jax.block_until_ready(touch(tree))
    for _ in range(20):
        jax.block_until_ready(touch(tree))
    battery("put_after_execs")

    x_mm = jax.block_until_ready(jnp.ones((8192, 8192), jnp.bfloat16))

    @jax.jit
    def slow(x):
        return jax.lax.fori_loop(0, 10, lambda i, a: a @ x, x)

    jax.block_until_ready(slow(x_mm))  # compile + one exec
    for _ in range(3):
        jax.block_until_ready(slow(x_mm))
    del x_mm
    battery("put_after_big_execs")

    # --- the exact serve state (with the r5 settle-every-put protocol) ----
    from owlvit_tpu.models import get_config, owlvit
    from owlvit_tpu.serve import DetectorServer

    cfg = get_config("b16", dtype="bfloat16")
    params = owlvit.init(jax.random.PRNGKey(0), cfg, num_queries=240)
    srv = DetectorServer(params, cfg, buckets=(32,), warmup=True)
    battery("put_after_serve_init")
    one = srv.submit(np.asarray(img[0].reshape(S, S, 3)))
    one.result(timeout=600)
    battery("put_after_request")
    srv.close()

    # --- active triggers, LAST (each may poison the rest of the process) --
    # TRIGGER C: eager fetch of an IN-FLIGHT exec's (small) output — the
    # trainer's per-step loss-terms fetch pattern. If this flips the mode,
    # every epoch-1 streamed step degrades its own next put and the trainer
    # must block before fetching terms.
    dev = jax.block_until_ready(jnp.asarray(img))
    np.asarray(_consume(dev))  # no block: fetch chained on the in-flight exec
    battery("put_after_eager_exec_fetch")

    # TRIGGER A: exec dispatched while its input put is in flight (what the
    # pre-r5 serve/_warmup/trainer step did on every batch)
    out = _consume(jnp.asarray(img))
    jax.block_until_ready(out)
    battery("put_after_unblocked_exec")

    # TRIGGER B: v1's known flip — eager fetch chained on an in-flight put
    t0 = time.perf_counter()
    np.asarray(jnp.asarray(img))
    rec["rt_trigger_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
    battery("put_after_rt")

    battery("small_tail", small)
    rec["ok"] = True
except Exception as e:  # noqa: BLE001
    rec.update(ok=False, err=repr(e)[:400])

print(json.dumps(rec), flush=True)
with open("/tmp/tpu_runs.jsonl", "a") as f:
    f.write(json.dumps(rec) + "\n")
sys.exit(0 if rec.get("ok") else 1)
