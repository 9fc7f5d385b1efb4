"""Put-degradation: decisive trigger separation + recovery attempts.

Probe v2 (r5) showed the strict serial protocol does NOT hold fast-put
mode: puts were fast for ~4 x 56 MB, the FIRST d2h fetch stalled 8.6 min,
and every later put ran at ~28 MB/s (permanent). Two confounded hypotheses:
  H-fetch: the first d2h fetch flips the process (v1+v2 both flipped there)
  H-bytes: a cumulative-put threshold (~250-300 MB) flips it; the fetch
           merely marked the moment
Both matter: H-bytes would doom ANY large pre-stage fill (the r5 pixel
pool moves 0.5-4.4 GB); H-fetch means ordering fills before the first
fetch saves them.

Cases, in order (fetches deferred as long as possible):
  bytes_sweep     20 x 56 MB BLOCKED puts, NO fetch anywhere before/during
                  (the claim probe uses block_until_ready only). Per-put
                  times. If a cliff appears at put k: H-bytes confirmed,
                  threshold ~= k*56 MB. If all 20 stay fast through 1.1 GB:
                  H-bytes refuted.
  first_fetch     one tiny exec + np.asarray of its (ready) [1, 8] output,
                  timed; then 3 x 56 MB blocked puts. Degradation here with
                  a fast bytes_sweep = H-fetch confirmed.
  par_puts        in whatever mode the process is now in: 4 threads each
                  blocked-put 14 MB concurrently (no exec in flight —
                  distinct from the r4 overlap-with-EXEC pessimization).
                  Aggregate MB/s vs the serial rate: does the degraded cap
                  apply per-RPC or per-link?
  clear_caches    jax.clear_caches(), then 3 x 56 MB puts
  reconnect       jax.extend.backend.clear_backends() (tears down the
                  client; re-dials on next use), timed re-claim, then
                  3 x 56 MB puts. If puts come back fast, a put-watchdog
                  reconnect is a production mitigation for long-lived
                  serving processes on this relay.

r5b run 1 (BENCH.md r5): the sweep kept NO references (the dead-buffer /
pool-fill pattern) and STILL flipped at put 15 (~790 MB cumulative, no
fetch ever) — so the threshold is CUMULATIVE put bytes per process, not
live buffers, and either bulk bytes or (earlier, ~280 MB) a first fetch
suffices. par4 aggregate 13.5 MB/s (parallel puts DON'T scale);
clear_caches no recovery; the reconnect attempt failed on an import bug
(jax.extend needs an explicit submodule import) — fixed here, plus a
second-reconnect viability check (a serve put-watchdog needs reconnects
to keep working, not just once).

Usage: python tools/tpu_put_recovery_probe.py [n_sweep] [alive|dead]
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

n_sweep = int(sys.argv[1]) if len(sys.argv) > 1 else 20
mode = "alive" if "alive" in sys.argv[1:] else "dead"
if "cpu" in sys.argv[1:]:
    jax.config.update("jax_platforms", "cpu")

# claim probe: block only, never fetch
(jnp.ones((256, 256)) @ jnp.ones((256, 256))).block_until_ready()

rec = {"name": "put_recovery_probe", "backend": jax.default_backend(),
       "n_sweep": n_sweep, "mode": mode}
rng = np.random.default_rng(0)
B, S = 32, 768
img = rng.integers(0, 255, (B, S * S * 3), dtype=np.uint8)  # 56.6 MB
quarter = img[:8]  # 14.2 MB


def timed_put(payload):
    t0 = time.perf_counter()
    jax.block_until_ready(jnp.asarray(payload))
    return round((time.perf_counter() - t0) * 1e3, 1)


@jax.jit
def _consume(x):
    return x[:1, :8].astype(jnp.float32) + 1.0


try:
    # --- bytes sweep: no fetch has EVER happened in this process ----------
    if mode == "alive":
        keep = []
        times = []
        for _ in range(n_sweep):
            t0 = time.perf_counter()
            keep.append(jax.block_until_ready(jnp.asarray(img)))
            times.append(round((time.perf_counter() - t0) * 1e3, 1))
        rec["bytes_sweep_ms"] = times
    else:  # dead: the pool-fill pattern — each staging buffer dies at once
        rec["bytes_sweep_ms"] = [timed_put(img) for _ in range(n_sweep)]

    # --- first fetch -------------------------------------------------------
    out = _consume(jnp.asarray(img))  # compile is fetch-free (AOT cache ok)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    np.asarray(out)  # THE first d2h of the process (tiny, ready)
    rec["first_fetch_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
    rec["puts_after_fetch_ms"] = [timed_put(img) for _ in range(3)]

    # --- parallel puts in the current mode ---------------------------------
    import threading

    def par(n_threads):
        times = [None] * n_threads
        payloads = [
            rng.integers(0, 255, quarter.shape, dtype=np.uint8)
            for _ in range(n_threads)
        ]

        def work(i):
            t0 = time.perf_counter()
            jax.block_until_ready(jnp.asarray(payloads[i]))
            times[i] = time.perf_counter() - t0

        ts = [threading.Thread(target=work, args=(i,)) for i in range(n_threads)]
        t0 = time.perf_counter()
        for th in ts:
            th.start()
        for th in ts:
            th.join()
        wall = time.perf_counter() - t0
        return wall, times

    rec["serial_quarter_ms"] = timed_put(quarter)
    wall, times = par(4)
    rec["par4_quarter_wall_ms"] = round(wall * 1e3, 1)
    rec["par4_quarter_each_ms"] = [round(t * 1e3, 1) for t in times]
    rec["par4_aggregate_mb_s"] = round(4 * quarter.nbytes / 1e6 / wall, 1)

    # --- recovery attempts --------------------------------------------------
    jax.clear_caches()
    rec["puts_after_clear_caches_ms"] = [timed_put(img) for _ in range(3)]

    try:
        from jax.extend.backend import clear_backends

        t0 = time.perf_counter()
        clear_backends()
        # first device use re-dials the relay (and re-claims)
        (jnp.ones((256, 256)) @ jnp.ones((256, 256))).block_until_ready()
        rec["reconnect_s"] = round(time.perf_counter() - t0, 1)
        rec["puts_after_reconnect_ms"] = [timed_put(img) for _ in range(5)]

        # a serve put-watchdog reconnects REPEATEDLY — prove #2 also works
        # (degrade again with bulk puts first, then reconnect again)
        for _ in range(12):
            timed_put(img)
        rec["puts_before_reconnect2_ms"] = [timed_put(img) for _ in range(2)]
        t0 = time.perf_counter()
        clear_backends()
        (jnp.ones((256, 256)) @ jnp.ones((256, 256))).block_until_ready()
        rec["reconnect2_s"] = round(time.perf_counter() - t0, 1)
        rec["puts_after_reconnect2_ms"] = [timed_put(img) for _ in range(5)]
    except Exception as e:  # noqa: BLE001 — clear_backends is experimental
        rec["reconnect_err"] = repr(e)[:200]

    rec["ok"] = True
except Exception as e:  # noqa: BLE001
    rec.update(ok=False, err=repr(e)[:400])

print(json.dumps(rec), flush=True)
with open("/tmp/tpu_runs.jsonl", "a") as f:
    f.write(json.dumps(rec) + "\n")
sys.exit(0 if rec.get("ok") else 1)
