"""Measure the DetectorServer (dynamic batching) on the chip.

Open-loop client: a generator thread submits requests at `rate` req/s
(rate=0 floods: closed-loop max throughput). The server pads traffic onto
the compiled bucket ladder; we report throughput, latency percentiles, and
the realized batch histogram — the numbers that matter for production
serving, vs the fixed-batch 153.9 img/s row in BENCH.md.

Usage: python tools/tpu_serve_batched.py NAME [model=b16] [buckets=32]
         [rate=0] [total=640] [delay_ms=5] [cpu=0]
Appends one JSON line to /tmp/tpu_runs.jsonl.
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

args = dict(a.split("=", 1) for a in sys.argv[2:])
name = sys.argv[1]
model = args.get("model", "b16")
buckets = tuple(int(b) for b in args.get("buckets", "32").split(","))
rate = float(args.get("rate", "0"))
total = int(args.get("total", "640"))
delay_ms = float(args.get("delay_ms", "5"))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402
import numpy as np  # noqa: E402

if args.get("cpu") == "1":
    jax.config.update("jax_platforms", "cpu")

rec = {"name": name, "model": model, "buckets": list(buckets), "rate": rate,
       "total": total, "delay_ms": delay_ms,
       "backend": jax.default_backend()}
t0 = time.time()
try:
    from owlvit_tpu.models import get_config, owlvit
    from owlvit_tpu.serve import DetectorServer

    cfg = get_config(model, dtype="bfloat16")
    params = owlvit.init(jax.random.PRNGKey(0), cfg, num_queries=3 * 80)
    S = cfg.vision.image_size
    rng = np.random.default_rng(0)
    # a small pool of distinct model-sized images, reused round-robin
    pool = rng.integers(0, 255, (16, S, S, 3), dtype=np.uint8)

    tw = time.time()
    srv = DetectorServer(params, cfg, buckets=buckets, max_delay_ms=delay_ms,
                         warmup=True)
    rec["warmup_secs"] = round(time.time() - tw, 1)
    print(f"warmed {len(buckets)} bucket(s) in {rec['warmup_secs']} s",
          flush=True)

    futs = []

    def client():
        t_next = time.perf_counter()
        for i in range(total):
            if rate > 0:
                t_next += 1.0 / rate
                dt = t_next - time.perf_counter()
                if dt > 0:
                    time.sleep(dt)
            futs.append(srv.submit(pool[i % len(pool)]))

    tm = time.perf_counter()
    th = threading.Thread(target=client)
    th.start()
    th.join()
    n_det = 0
    for f in futs:
        n_det += len(f.result(timeout=600)["boxes"])
    wall = time.perf_counter() - tm
    st = srv.stats()
    srv.close()
    from owlvit_tpu.utils import flops as flops_mod

    _mfu = flops_mod.mfu(
        total / wall,
        flops_mod.serve_flops_per_image(cfg, num_queries=3 * 80),
        flops_mod.chip_peak_flops(jax.devices()[0].device_kind),
    )
    rec.update(
        imgs_per_sec=round(total / wall, 2),
        mfu=round(_mfu, 4) if _mfu else None,
        wall_secs=round(wall, 2),
        latency_ms=st.get("latency_ms"),
        batches=st["batches"],
        padded_rows=st["padded_rows"],
        bucket_counts={str(k): v for k, v in st["bucket_counts"].items()},
        mean_dets=round(n_det / total, 1),
        phase_secs={k: round(v, 2) for k, v in st["phase_secs"].items()}
        if "phase_secs" in st else None,
        ok=True,
        secs=round(time.time() - t0, 1),
    )
except Exception as e:  # noqa: BLE001
    rec.update(ok=False, err=repr(e)[:400], secs=round(time.time() - t0, 1))
print(json.dumps(rec), flush=True)
with open("/tmp/tpu_runs.jsonl", "a") as f:
    f.write(json.dumps(rec) + "\n")
sys.exit(0 if rec.get("ok") else 1)
