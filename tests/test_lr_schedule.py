"""LR schedules (warmup/cosine) — beyond-reference trainer capability.

The reference uses a fixed AdamW lr (main.py:56-60); these pin the config
plumbing: schedule shape, warmup ramp, and an e2e run training under cosine.
"""

import os

import numpy as np
import pytest

from owlvit_tpu.train import Trainer
from owlvit_tpu.utils.config import Config, DataConfig, ModelConfig, TrainingConfig


def _cfg(root, **training_kw):
    return Config(
        data=DataConfig(
            synthetic_root=os.path.join(root, "synth"),
            num_train_images=8,
            num_test_images=2,
            max_gt=8,
            synthetic_classes=3,
        ),
        training=TrainingConfig(
            **{"n_epochs": 1, "batch_size": 4, "log_file": None, "top_k": 16,
               **training_kw}
        ),
        model=ModelConfig(name="tiny", trainable_last_k=1),
    )


def test_constant_no_warmup_is_plain_float(tmp_path):
    t = Trainer(_cfg(str(tmp_path), learning_rate=1e-4), workdir=str(tmp_path))
    assert t._lr_schedule() == pytest.approx(1e-4)


def test_warmup_ramps_then_holds(tmp_path):
    t = Trainer(
        _cfg(str(tmp_path), learning_rate=1e-3, warmup_steps=10),
        workdir=str(tmp_path),
    )
    sched = t._lr_schedule()
    assert float(sched(0)) == 0.0
    assert float(sched(5)) == pytest.approx(5e-4)
    assert float(sched(10)) == pytest.approx(1e-3)
    assert float(sched(100)) == pytest.approx(1e-3)


def test_cosine_decays_to_final(tmp_path):
    t = Trainer(
        _cfg(
            str(tmp_path), learning_rate=1e-3, lr_schedule="cosine",
            warmup_steps=2, n_epochs=50, lr_final=1e-5,
        ),
        workdir=str(tmp_path),
    )
    sched = t._lr_schedule()
    total = 50 * 2  # 8 imgs / b4
    assert float(sched(2)) == pytest.approx(1e-3)
    mid, end = float(sched(total // 2)), float(sched(total))
    assert 1e-5 < mid < 1e-3
    assert end == pytest.approx(1e-5, rel=1e-2)


def test_bad_schedule_name_rejected(tmp_path):
    with pytest.raises(ValueError, match="lr_schedule"):
        Trainer(_cfg(str(tmp_path), lr_schedule="linear"), workdir=str(tmp_path))


def test_train_runs_under_cosine(tmp_path):
    cfg = _cfg(
        str(tmp_path), learning_rate=1e-4, lr_schedule="cosine",
        warmup_steps=1, n_epochs=2,
    )
    t = Trainer(cfg, workdir=str(tmp_path))
    metrics = t.run()
    assert np.isfinite(metrics["map"])
    assert int(t.state.step) == 4
