"""Short synthetic fine-tune on the real chip, for A/B-ing a config knob.

Used for the int8 frozen-backbone drift check (BENCH.md): same data, seeds
and schedule; only the flag under test differs between two invocations.
ONE run per process (relay failures cascade; see CLAUDE.md).

Usage: python tools/tpu_train_ab.py NAME [quant=0] [model=b32] [epochs=30]
       [batch=8] [imgs=32] [classes=3] [lr=5e-5] [k=1] [cache=0]
Appends one JSON line (final train losses + val mAPs) to /tmp/tpu_runs.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

args = dict(a.split("=", 1) for a in sys.argv[2:])
name = sys.argv[1]
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

rec = {"name": name, **args}
t0 = time.time()
try:
    from owlvit_tpu.train import Trainer
    from owlvit_tpu.utils.config import (
        Config, DataConfig, ModelConfig, TrainingConfig,
    )

    root = f"/tmp/ab_{name}"
    cfg = Config(
        data=DataConfig(
            synthetic_root=os.path.join(root, "synth"),
            num_train_images=int(args.get("imgs", "32")),
            num_test_images=16,
            max_gt=8,
            synthetic_classes=int(args.get("classes", "3")),
        ),
        training=TrainingConfig(
            n_epochs=int(args.get("epochs", "30")),
            learning_rate=float(args.get("lr", "5e-5")),
            batch_size=int(args.get("batch", "8")),
            log_file=None,
            top_k=64,
            seed=int(args.get("seed", "0")),
            lr_schedule=args.get("lrsched", "constant"),
            warmup_steps=int(args.get("warmup", "0")),
            cache_backbone=args.get("cache", "0") == "1",
        ),
        model=ModelConfig(
            name=args.get("model", "b32"),
            dtype="bfloat16",
            trainable_last_k=int(args.get("k", "1")),
            quant_backbone=args.get("quant", "0") == "1",
        ),
    )
    trainer = Trainer(cfg, workdir=root)
    metrics = trainer.run()
    rec.update(
        ok=True,
        secs=round(time.time() - t0, 1),
        map=float(metrics["map"]),
        map_50=float(metrics["map_50"]),
        steps=int(trainer.state.step),
    )
except Exception as e:  # noqa: BLE001
    rec.update(ok=False, err=repr(e)[:400], secs=round(time.time() - t0, 1))
print(rec, flush=True)
with open("/tmp/tpu_runs.jsonl", "a") as f:
    f.write(json.dumps(rec) + "\n")
sys.exit(0 if rec.get("ok") else 1)
