"""Measure the DetectorServer (dynamic batching) on the chip.

Open-loop client: a generator thread submits requests at `rate` req/s
(rate=0 floods: closed-loop max throughput). The server pads traffic onto
the compiled bucket ladder; we report throughput, latency percentiles, and
the realized batch histogram — the numbers that matter for production
serving, vs the fixed-batch 153.9 img/s row in BENCH.md.

Usage: python tools/tpu_serve_batched.py NAME [model=b16] [buckets=32]
         [rate=0] [total=640] [delay_ms=5] [cpu=0] [phases=1] [direct=N]
         [bulk=N] [bulkstage=1] [warm=0]
bulk=N runs serve.bulk_detect over N images AFTER the flood (total=0 for a
bulk-only, fetch-free-until-the-end process — the fast-put headline).
bulkstage=1 stages ALL bulk inputs on device before the first exec
(pair with warm=0 so the puts precede even the first compile).
phases=1 sets OWLVIT_SERVE_PHASES (per-batch assemble/h2d/exec/fetch timing;
disables dispatch pipelining — diagnosis only). direct=N additionally runs N
main-thread synchronous batches through the SAME warmed executable after the
flood, timing put/exec/fetch separately plus a dispatch->immediate-fetch
variant (isolates thread- and pipeline-effects from the graph itself).
total=0 skips the flood (direct-only process).
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
if args.get("phases") == "1":
    os.environ["OWLVIT_SERVE_PHASES"] = "1"
n_direct = int(args.get("direct", "0"))

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
                         warmup=args.get("warm", "1") == "1")
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
    if total:
        th = threading.Thread(target=client)
        th.start()
        th.join()
    n_det = 0
    for f in futs:
        n_det += len(f.result(timeout=600)["boxes"])
    wall = time.perf_counter() - tm
    st = srv.stats()

    if n_direct:
        # Main-thread synchronous batches through the SAME warmed executable:
        # if these run at the direct-path rate while the threaded server
        # crawls, the gap is in the thread/pipeline interplay with the relay,
        # not the serving graph. Two fetch variants isolate WHERE a blocking
        # np.asarray spends its time: after an explicit device sync vs
        # blocking on the in-flight execution itself.
        b = buckets[-1]
        S_ = srv.image_size
        ph = {k: 0.0 for k in
              ("assemble", "put", "exec", "fetch", "e2e_sync", "e2e_eager")}
        # warm both code paths once (first np.asarray may pin host buffers)
        out = srv._serve(srv._params, srv._put(
            np.zeros((b, S_ * S_ * 3), np.uint8)))
        np.asarray(out)
        for i in range(n_direct):
            t0_ = time.perf_counter()
            img = np.zeros((b, S_ * S_ * 3), np.uint8)
            for j in range(b):
                img[j] = pool[(i + j) % len(pool)].reshape(-1)
            t1_ = time.perf_counter()
            dev = jax.block_until_ready(srv._put(img))
            t2_ = time.perf_counter()
            out = jax.block_until_ready(srv._serve(srv._params, dev))
            t3_ = time.perf_counter()
            np.asarray(out)
            t4_ = time.perf_counter()
            ph["assemble"] += t1_ - t0_
            ph["put"] += t2_ - t1_
            ph["exec"] += t3_ - t2_
            ph["fetch"] += t4_ - t3_
        for i in range(n_direct):  # variant: dispatch -> fetch immediately
            img = np.zeros((b, S_ * S_ * 3), np.uint8)
            t0_ = time.perf_counter()
            out = srv._serve(srv._params, srv._put(img))
            jax.block_until_ready(out)
            t1_ = time.perf_counter()
            np.asarray(out)
            t2_ = time.perf_counter()
            ph["e2e_sync"] += t2_ - t0_
            t3_ = time.perf_counter()
            out = srv._serve(srv._params, srv._put(img))
            np.asarray(out)  # blocks on the in-flight exec, then fetches
            t4_ = time.perf_counter()
            ph["e2e_eager"] += t4_ - t3_
        rec["direct_ms"] = {k: round(v / n_direct * 1e3, 1)
                            for k, v in ph.items()}
        rec["direct_imgs_per_sec"] = round(
            n_direct * b / (ph["e2e_eager"] or 1e-9), 2
        )
    n_bulk = int(args.get("bulk", "0"))
    bulk_stage = args.get("bulkstage") == "1"
    if n_bulk:
        # Fetch-deferred bulk inference (serve.bulk_detect): every batch's
        # packed results stay device-resident; ONE fetch pass at the end.
        # With total=0 this process never fetches before the bulk job, so
        # puts stay in fast mode for its whole length (BENCH.md r5c).
        tb = time.perf_counter()
        res = srv.bulk_detect([pool[i % len(pool)] for i in range(n_bulk)],
                              stage_first=bulk_stage)
        bwall = time.perf_counter() - tb
        bst = srv.stats()["bulk"]
        rec["bulk"] = {
            "images": n_bulk,
            "imgs_per_sec": round(n_bulk / bwall, 2),
            "wall_secs": round(bwall, 2),
            "pre_fetch_imgs_per_sec": round(
                n_bulk / (bst["put_secs"] + bst["exec_secs"]), 2),
            # exec[0] of a cold server carries the ~4 min remote compile;
            # the steady rate is the deployable number for a warm process.
            # Built from exec_secs (the FULL total), not the series sum —
            # the series caps at 512 entries, and a >512-batch job summed
            # from it would overstate the rate ~2x.
            "steady_imgs_per_sec": round(n_bulk / (
                bst["put_secs"] + bst["fetch_secs"] + bst["exec_secs"]
                - bst["last_exec_series_ms"][0] / 1e3
                + (min(bst["last_exec_series_ms"][:2])
                   if len(bst["last_exec_series_ms"]) > 1
                   else bst["last_exec_series_ms"][0]) / 1e3), 2)
            if bst.get("last_exec_series_ms") else None,
            "mean_dets": round(
                sum(len(r["boxes"]) for r in res) / n_bulk, 1),
            **bst,
        }
        print(json.dumps({"bulk": rec["bulk"]}), flush=True)
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
        mean_dets=round(n_det / total, 1) if total else None,
        phase_secs={k: round(v, 2) for k, v in st["phase_secs"].items()}
        if "phase_secs" in st else None,
        h2d_series_ms=st.get("h2d_series_ms"),
        ok=True,
        secs=round(time.time() - t0, 1),
    )
except Exception as e:  # noqa: BLE001
    rec.update(ok=False, err=repr(e)[:400], secs=round(time.time() - t0, 1))
print(json.dumps(rec), flush=True)
with open("/tmp/tpu_runs.jsonl", "a") as f:
    f.write(json.dumps(rec) + "\n")
sys.exit(0 if rec.get("ok") else 1)
