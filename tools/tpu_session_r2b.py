"""Round-2 TPU session B: L/14 train step, CLI infer/export on TPU, host
loader throughput. One process; CLI driven in-process via cli.main().

Writes incremental JSON lines to /tmp/tpu_r2b_results.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = "/tmp/tpu_r2b_results.jsonl"
T0 = time.time()


def log(name, **kw):
    rec = {"t": round(time.time() - T0, 1), "name": name, **kw}
    print(f"[{rec['t']:8.1f}s] {name}: {kw}", flush=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")


os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

# ---- 0. host loader throughput (pure CPU; measure before heavy TPU state)
import numpy as np  # noqa: E402

from owlvit_tpu.data import DetectionDataset, synthetic  # noqa: E402

root = "/tmp/loader_bench_synth"
files = synthetic.generate(root, n_train=64, n_test=4, n_classes=4, seed=0,
                           image_size=(768, 768))
for native_decode in (False, True):
    ds = DetectionDataset(
        files["train"], files["images_dir"], image_size=768, max_gt=16,
        native_decode=native_decode,
    )
    idxs = list(range(len(ds)))
    t = time.time()
    ds.load_batch(idxs[:8])  # warm page cache
    t = time.time()
    ds.load_batch(idxs)
    dt = time.time() - t
    log("host_loader", native=native_decode,
        imgs_per_sec=round(len(ds) / dt, 1))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

x = jnp.ones((256, 256))
(x @ x).block_until_ready()
log("probe", backend=jax.default_backend())

# ---- 1. L/14 train step (VERDICT r1 weak #6): remat on, bf16
import bench  # noqa: E402

for batch in (16, 8):
    try:
        t = time.time()
        os.environ["BENCH_MODEL"] = "l14"
        step, state, data = bench._build("l14", batch, "bfloat16",
                                         trainable_last_k=1)
        sps, loss = bench._measure(step, state, data, 10)
        log("l14_train", batch=batch, imgs_per_sec=round(sps * batch, 2),
            loss=float(loss), compile_secs=round(time.time() - t, 1))
        del step, state, data
        break
    except Exception as e:  # noqa: BLE001
        log("l14_train_FAILED", batch=batch, err=repr(e)[:400])

# ---- 2. CLI end-to-end on TPU (VERDICT r1 weak #5): train 1 epoch on
# synthetic b32, then infer (bank, zero-shot, one-shot), eval, export.
from owlvit_tpu import cli  # noqa: E402

wd = "/tmp/cli_tpu_run"
os.makedirs(wd, exist_ok=True)
cfg_path = os.path.join(wd, "config.yaml")
with open(cfg_path, "w") as f:
    f.write(f"""
data:
  synthetic_root: {wd}/synth
  num_train_images: 8
  num_test_images: 4
  max_gt: 8
  synthetic_classes: 3
model:
  name: b32
  dtype: bfloat16
  trainable_last_k: 1
training:
  n_epochs: 1
  batch_size: 4
  top_k: 32
  checkpoint_dir: {wd}/ckpt
  log_file: metrics.jsonl
""")

steps = [
    ("cli_train", ["train", "--config", cfg_path, "--workdir", wd]),
    ("cli_eval", ["eval", "--config", cfg_path, "--workdir", wd]),
    ("cli_infer_bank",
     ["infer", "--config", cfg_path, "--workdir", wd,
      "--image", f"{wd}/synth/images/train_00000.png"]),
    ("cli_infer_zeroshot",
     ["infer", "--config", cfg_path, "--workdir", wd,
      "--image", f"{wd}/synth/images/train_00000.png",
      "--queries", "a photo of a red square"]),
    ("cli_infer_oneshot",
     ["infer", "--config", cfg_path, "--workdir", wd,
      "--image", f"{wd}/synth/images/train_00000.png",
      "--query-image", f"{wd}/synth/images/train_00001.png"]),
    ("cli_export",
     ["export", "--config", cfg_path, "--workdir", wd,
      "--out", f"{wd}/det.stablehlo", "--batch-size", "1"]),
]
for name, argv in steps:
    t = time.time()
    try:
        cli.main(argv)
        log(name, ok=True, secs=round(time.time() - t, 1))
    except SystemExit as e:
        log(name, ok=(e.code in (0, None)), secs=round(time.time() - t, 1))
    except Exception as e:  # noqa: BLE001
        log(name + "_FAILED", err=repr(e)[:400], secs=round(time.time() - t, 1))

# ---- 3. load the exported artifact and run it
try:
    from owlvit_tpu.train.export import load_exported

    with open(f"{wd}/det.stablehlo", "rb") as f:
        blob = f.read()
    fn = load_exported(blob)
    img = np.random.default_rng(0).integers(
        0, 255, size=(1, 768, 768, 3), dtype=np.uint8
    )
    boxes, sims = fn(img)
    log("load_exported_run", boxes=str(np.asarray(boxes).shape),
        finite=bool(np.isfinite(np.asarray(boxes)).all()))
except Exception as e:  # noqa: BLE001
    log("load_exported_FAILED", err=repr(e)[:400])

# ---- 4. eval-epoch timing with the fixpoint NMS (b32 synthetic test set)
try:
    from owlvit_tpu.utils.config import load_config
    from owlvit_tpu.train import Trainer

    cfg = load_config(cfg_path)
    tr = Trainer(cfg, workdir=wd)
    t = time.time()
    m = tr.evaluate()
    log("eval_epoch", secs=round(time.time() - t, 2), map=float(m["map"]))
except Exception as e:  # noqa: BLE001
    log("eval_epoch_FAILED", err=repr(e)[:400])

log("done")
