"""Serving through a LOADED export artifact on the TPU (VERDICT r2 next #6).

r2 proved export on TPU but never loaded+ran an artifact there: the
weights-baked artifact trips the relay's HTTP-413 on the recompile request.
The weightless artifact (graph only, a few MB) is under the cap — this tool
closes the loop:

  1. export_detector_weightless(random-init params) -> /tmp blob (host-side
     trace/lower only, no device compile)
  2. jax_export.deserialize the blob from disk, bind the params npz-style
  3. wrap the loaded call + NMS postprocess in ONE jit graph
  4. measure served images/sec on the chip

Usage: python tools/tpu_serve_loaded.py NAME [batch=32] [model=b16] [steps=20]
Appends one JSON line to /tmp/tpu_runs.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

args = dict(a.split("=", 1) for a in sys.argv[2:])
name = sys.argv[1]
batch = int(args.get("batch", 32))
model = args.get("model", "b16")
steps = int(args.get("steps", 20))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

if args.get("cpu") == "1":
    jax.config.update("jax_platforms", "cpu")

rec = {"name": name, "model": model, "batch": batch,
       "backend": jax.default_backend()}
t0 = time.time()
try:
    from jax import export as jax_export

    from owlvit_tpu.models import get_config, owlvit
    from owlvit_tpu.ops import nms as nms_ops
    from owlvit_tpu.train.export import export_detector_weightless

    cfg = get_config(model, dtype="bfloat16")
    n_classes = 80
    params = owlvit.init(jax.random.PRNGKey(0), cfg, num_queries=3 * n_classes)

    blob = export_detector_weightless(params, cfg, batch_size=batch)
    path = f"/tmp/owlvit_{model}_b{batch}_weightless.stablehlo"
    with open(path, "wb") as f:
        f.write(blob)
    rec["artifact_mb"] = round(len(blob) / 1e6, 2)
    print(f"exported {path}: {rec['artifact_mb']} MB", flush=True)

    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())

    def serve(params, images):
        boxes, sims = exported.call(params, images)
        return nms_ops.postprocess(
            boxes, sims, confidence_threshold=0.01, iou_threshold=0.6,
            top_k=200,
        )

    sstep = jax.jit(serve)
    S = cfg.vision.image_size
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (batch, S, S, 3), dtype=np.uint8))
    t = time.time()
    out = sstep(params, images)
    jax.block_until_ready(out)
    rec["compile_secs"] = round(time.time() - t, 1)
    t0m = time.perf_counter()
    for _ in range(steps):
        out = sstep(params, images)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0m
    rec.update(
        imgs_per_sec=round(steps * batch / dt, 2),
        n_det_example=int(np.asarray(out["valid"][0]).sum()),
        ok=True,
        secs=round(time.time() - t0, 1),
    )
except Exception as e:  # noqa: BLE001
    rec.update(ok=False, err=repr(e)[:400], secs=round(time.time() - t0, 1))
print(json.dumps(rec), flush=True)
with open("/tmp/tpu_runs.jsonl", "a") as f:
    f.write(json.dumps(rec) + "\n")
sys.exit(0 if rec.get("ok") else 1)
