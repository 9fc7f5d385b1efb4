"""EMA / best-checkpoint / early-stop / TensorBoard trainer additions.

The reference has none of these (it never even saves the final weights —
SURVEY §5.4 — and its SummaryWriter import is dead, quirk #6)."""

import glob
import json
import os

import jax
import numpy as np
import pytest

from owlvit_tpu.data import batch_iterator
from owlvit_tpu.train import Trainer
from owlvit_tpu.utils.config import Config, DataConfig, ModelConfig, TrainingConfig
from owlvit_tpu.utils.tb_writer import TBWriter, read_events


def test_tb_writer_roundtrip(tmp_path):
    w = TBWriter(str(tmp_path))
    w.scalar("train/loss", 1.5, step=0)
    w.scalar("train/loss", 0.75, step=1)
    w.scalars({"map": 0.25, "per_class": np.zeros(3)}, step=1, prefix="val/")
    w.close()
    events = read_events(w.path)
    assert (0, "train/loss", 1.5) in events
    assert (1, "train/loss", 0.75) in events
    assert (1, "val/map", 0.25) in events
    # non-scalar values are skipped, not crashed on
    assert not any(tag == "val/per_class" for _, tag, _ in events)


def test_tb_writer_crc_detects_corruption(tmp_path):
    w = TBWriter(str(tmp_path))
    w.scalar("x", 1.0, step=0)
    w.close()
    raw = bytearray(open(w.path, "rb").read())
    raw[-3] ^= 0xFF  # flip a byte inside the last record's payload/crc
    with open(w.path, "wb") as f:
        f.write(raw)
    with pytest.raises(ValueError):
        read_events(w.path)


def _cfg(root, **training):
    return Config(
        data=DataConfig(
            synthetic_root=os.path.join(root, "synth"),
            num_train_images=8,
            num_test_images=4,
            max_gt=8,
            synthetic_classes=3,
        ),
        training=TrainingConfig(
            **{"learning_rate": 1e-4, "batch_size": 4, "top_k": 16, **training}
        ),
        model=ModelConfig(name="tiny", trainable_last_k=1),
    )


def test_ema_tracks_exact_recursion(tmp_path):
    root = str(tmp_path)
    trainer = Trainer(_cfg(root, n_epochs=1, ema_decay=0.5), workdir=root)
    tr0 = jax.tree.map(np.asarray, trainer.state.trainable)
    batch = next(batch_iterator(trainer.train_ds, 4, shuffle=False))
    for k in ("paths", "image_valid", "width", "height"):
        batch.pop(k, None)
    trainer._train_one_batch(batch)
    tr1 = jax.tree.map(np.asarray, trainer.state.trainable)
    ema = jax.tree.map(np.asarray, trainer.ema)
    expect = jax.tree.map(lambda a, b: 0.5 * a + 0.5 * b, tr0, tr1)
    for e, x in zip(jax.tree.leaves(ema), jax.tree.leaves(expect)):
        np.testing.assert_allclose(e, x, rtol=1e-6, atol=1e-7)
    # the params moved, so EMA must differ from both endpoints somewhere
    moved = any(
        np.abs(a - b).max() > 0 for a, b in
        zip(jax.tree.leaves(tr0), jax.tree.leaves(tr1))
    )
    assert moved


def test_ema_eval_and_checkpoint_roundtrip(tmp_path):
    root = str(tmp_path)
    ckpt_dir = os.path.join(root, "ckpt")
    cfg = _cfg(root, n_epochs=2, ema_decay=0.9, checkpoint_dir=ckpt_dir)
    trainer = Trainer(cfg, workdir=root)
    trainer.run()
    ema0 = jax.tree.map(np.asarray, trainer.ema)
    # the EMA tree was checkpointed and a fresh trainer resumes it
    assert glob.glob(os.path.join(ckpt_dir, "tree_*"))
    trainer2 = Trainer(cfg, workdir=root)
    for a, b in zip(jax.tree.leaves(ema0), jax.tree.leaves(trainer2.ema)):
        np.testing.assert_array_equal(a, np.asarray(b))
    # ema_eval=True evaluates with the EMA weights: swapping in garbage EMA
    # must change the eval result path (smoke: evaluate() runs with EMA on)
    m = trainer2.evaluate()
    assert "map" in m


def test_keep_best_and_early_stop(tmp_path):
    root = str(tmp_path)
    ckpt_dir = os.path.join(root, "ckpt")
    cfg = _cfg(
        root, n_epochs=6, learning_rate=0.0,  # nothing improves after eval 1
        checkpoint_dir=ckpt_dir, keep_best=True, early_stop_patience=2,
        log_file="metrics.jsonl",
    )
    trainer = Trainer(cfg, workdir=root)
    trainer.run()
    # early stop: eval 0 sets best; evals 1-2 don't improve -> stop at epoch 2
    lines = open(os.path.join(root, "metrics.jsonl")).read().splitlines()
    assert len(lines) == 3, f"expected early stop after 3 epochs, got {len(lines)}"
    # best checkpoint exists and holds exactly one step
    best_steps = [
        d for d in os.listdir(os.path.join(ckpt_dir, "best"))
        if d.startswith("step_")
    ]
    assert len(best_steps) == 1
    rec = json.loads(lines[0])
    assert "val_map" in rec


def test_eval_save_detections(tmp_path):
    root = str(tmp_path)
    trainer = Trainer(_cfg(root, n_epochs=1), workdir=root)
    out = os.path.join(root, "dets.json")
    trainer.evaluate(save_detections=out)
    dets = json.load(open(out))
    assert isinstance(dets, list) and len(dets) > 0
    d = dets[0]
    assert set(d) == {"image_id", "image_path", "category_id",
                      "category_name", "bbox", "score"}
    x, y, w, h = d["bbox"]
    assert w >= 0 and h >= 0
    assert 0 <= d["category_id"] < 3
    assert {dd["image_id"] for dd in dets} <= set(range(4))


def test_keep_best_requires_checkpoint_dir(tmp_path):
    root = str(tmp_path)
    trainer = Trainer(_cfg(root, n_epochs=1, keep_best=True), workdir=root)
    with pytest.raises(ValueError, match="keep_best"):
        trainer.run()
