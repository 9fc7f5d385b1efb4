"""Probe transfer LAYOUT/DTYPE costs on the TPU relay (one process).

tpu_h2d_probe.py measured flat bf16 device_put at ~1.6 GB/s, but the
serving path (serve.py) observed ~2 s per batch for a 56.6 MB
[32, 768, 768, 3] uint8 host->device transfer and ~2 s for a ~1 MB
4-array detection fetch — 50-2000x off the probed link rate. Two
candidate mechanisms, distinguished here:

  (a) wire-format padding: the relay ships arrays in device (tiled)
      layout, so a trailing dim of 3/4 lane-pads to 128 (~42x bytes);
  (b) per-RPC overhead: every transfer call pays a fixed relay round
      trip, so a dict fetch (4 arrays) pays 4x.

Cases (all ~56.6 MB logical unless noted):
  h2d_4d_u8      [32, 768, 768, 3] uint8   jnp.asarray   (serve's old wire)
  h2d_flat_u8    [32, 1769472]     uint8   jnp.asarray   (serve's new wire)
  h2d_1d_u8      [56623104]        uint8   device_put
  h2d_4d_f32     [32, 768, 768, 3] f32     jnp.asarray   (226 MB logical)
  h2d_3d_u8      [32, 768, 2304]   uint8   jnp.asarray   (fold the 3 into W)
  d2h_dict       boxes/scores/classes/valid fetch, 4 np.asarray calls
  d2h_packed     one [32, 1400] f32 fetch  (serve's new packed output)
plus r4 CONCURRENCY cases (see inline comment): transfers while a jitted
exec is in flight, with/without a second thread blocked in np.asarray on
that exec — the old two-thread serve.py's exact interleaving.

Usage: python tools/tpu_transfer_probe.py [reps]   (default 5)
Appends one JSON line to /tmp/tpu_runs.jsonl.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

import sys

reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5

(jnp.ones((256, 256)) @ jnp.ones((256, 256))).block_until_ready()

rec = {"name": "transfer_probe", "backend": jax.default_backend(), "reps": reps}
B, S = 32, 768
rng = np.random.default_rng(0)


def timed(fn):
    fn()  # warm (layout compile, first-call setup)
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return round((time.perf_counter() - t0) / reps * 1e3, 1)  # ms


try:
    img4 = rng.integers(0, 255, (B, S, S, 3), dtype=np.uint8)
    imgflat = np.ascontiguousarray(img4.reshape(B, -1))
    img1d = np.ascontiguousarray(img4.reshape(-1))
    img3 = np.ascontiguousarray(img4.reshape(B, S, S * 3))
    img4f = img4.astype(np.float32)

    rec["h2d_4d_u8_ms"] = timed(
        lambda: jnp.asarray(img4).block_until_ready())
    rec["h2d_flat_u8_ms"] = timed(
        lambda: jnp.asarray(imgflat).block_until_ready())

    # serve-composition suspects for the 1.3 s/batch h2d seen through the
    # batched server (vs 62 ms here): (a) a FRESH host buffer per transfer
    # (serve assembles a new np.zeros each batch; this file reuses one),
    # (b) the transfer running on a WORKER THREAD (serve's dispatch thread).
    fresh = [np.ascontiguousarray(x) for x in
             np.array_split(rng.integers(0, 255, ((reps + 1) * B, S * S * 3),
                                         dtype=np.uint8), reps + 1)]
    it = iter(fresh)
    rec["h2d_flat_u8_fresh_ms"] = timed(
        lambda: jnp.asarray(next(it)).block_until_ready())

    import threading

    def from_thread():
        box = {}

        def work():
            box["x"] = jnp.asarray(imgflat).block_until_ready()

        th = threading.Thread(target=work)
        th.start()
        th.join()

    rec["h2d_flat_u8_thread_ms"] = timed(from_thread)
    rec["h2d_1d_u8_ms"] = timed(
        lambda: jax.device_put(img1d).block_until_ready())
    rec["h2d_3d_u8_ms"] = timed(
        lambda: jnp.asarray(img3).block_until_ready())
    rec["h2d_4d_f32_ms"] = timed(
        lambda: jnp.asarray(img4f).block_until_ready())

    # D2H: detection-shaped outputs. np.asarray on the SAME jax array is
    # only a real fetch once (jax caches the host copy in _npy_value), so
    # every rep gets a FRESH device array (produced by a jitted add — the
    # op itself is negligible next to a relay round trip).
    K = 200
    mk = {
        "dict": lambda k: (
            jnp.asarray(rng.random((B, K, 4), np.float32)) + k,
            jnp.asarray(rng.random((B, K), np.float32)) + k,
            jnp.asarray(rng.integers(0, 80, (B, K)), jnp.int32) + k,
            jnp.asarray(rng.random((B, K)) > 0.5),
        ),
        "packed": lambda k: jnp.asarray(rng.random((B, K * 7), np.float32)) + k,
        "boxes_only": lambda k: jnp.asarray(rng.random((B, K, 4), np.float32)) + k,
    }
    for case, make in mk.items():
        fresh = [make(k) for k in range(reps + 1)]
        jax.block_until_ready(fresh)
        it = iter(fresh)
        rec[f"d2h_{case}_ms"] = timed(
            lambda it=it: jax.tree.map(np.asarray, next(it)))

    # CONCURRENCY cases — the r4 serve mechanism suspects. All isolated
    # transfers above are fast, yet the two-thread server (completion
    # thread blocking in np.asarray while the dispatch thread ran H2D)
    # crawled at ~2 s/batch. These cases reproduce that interleaving
    # directly:
    #   h2d_during_exec     transfer while the device executes (no fetch) —
    #                       async pipelining's best case
    #   h2d_vs_blocked_fetch transfer while ANOTHER THREAD blocks in
    #                       np.asarray on an in-flight exec (old serve.py)
    #   d2h_vs_blocked_fetch same, but the main thread fetches a READY array
    x_mm = jnp.ones((8192, 8192), jnp.bfloat16)

    @jax.jit
    def slow(x):
        return jax.lax.fori_loop(0, 60, lambda i, a: a @ x, x)

    jax.block_until_ready(slow(x_mm))
    t0 = time.perf_counter()
    jax.block_until_ready(slow(x_mm))
    rec["slow_exec_ms"] = round((time.perf_counter() - t0) * 1e3, 1)

    import threading as _th

    def with_inflight(fn, block_in_thread):
        """Time fn() while slow() is in flight; optionally with a second
        thread blocked in np.asarray on the in-flight result."""
        def one():
            out = slow(x_mm)
            th = None
            if block_in_thread:
                th = _th.Thread(target=lambda: np.asarray(out))
                th.start()
                time.sleep(0.02)  # let the fetch enter its blocking wait
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            jax.block_until_ready(out)
            if th is not None:
                th.join()
            return dt

        one()  # warm
        return round(sum(one() for _ in range(reps)) / reps * 1e3, 1)

    rec["h2d_during_exec_ms"] = with_inflight(
        lambda: jnp.asarray(imgflat).block_until_ready(), False)
    rec["h2d_vs_blocked_fetch_ms"] = with_inflight(
        lambda: jnp.asarray(imgflat).block_until_ready(), True)
    ready = [mk["packed"](k + 100) for k in range(2 * (reps + 1))]
    jax.block_until_ready(ready)
    it2 = iter(ready)
    rec["d2h_vs_blocked_fetch_ms"] = with_inflight(
        lambda: np.asarray(next(it2)), True)

    # PERSISTENCE: re-run the plain idle-link cases AFTER the overlapped
    # ones. The r4 serve process measured 1.6 s for the same put that
    # probes at 39 ms in a clean process — does overlapped usage degrade
    # the relay session for the rest of the process, or was that state
    # from something else?
    rec["h2d_flat_u8_after_ms"] = timed(
        lambda: jnp.asarray(imgflat).block_until_ready())
    fresh2 = [mk["packed"](k + 500) for k in range(reps + 1)]
    jax.block_until_ready(fresh2)
    it3 = iter(fresh2)
    rec["d2h_packed_after_ms"] = timed(lambda: np.asarray(next(it3)))
    rec["ok"] = True
except Exception as e:  # noqa: BLE001
    rec.update(ok=False, err=repr(e)[:300])

print(json.dumps(rec), flush=True)
with open("/tmp/tpu_runs.jsonl", "a") as f:
    f.write(json.dumps(rec) + "\n")
