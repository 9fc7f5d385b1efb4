"""Pixel pre-stage (training.stage_pixels): staged == streamed, exactly.

The staged path moves all image bytes into a device-resident uint8 pool at
run start and assembles every batch on device with a gather; the streamed
path (the reference's model, src/dataset.py:101-106) transfers pixels per
step. Same pixels, same batch order, same GT -> the loss trajectories and
eval mAP must be bit-identical. These tests pin that equivalence on CPU for
the uncached, cached-device-store, and hflip configurations.
"""

import json
import os

import numpy as np
import pytest

from owlvit_tpu.train import Trainer
from owlvit_tpu.utils.config import Config, DataConfig, ModelConfig, TrainingConfig


def _cfg(root, stage, **training_overrides):
    tr = dict(
        n_epochs=2,
        learning_rate=1e-4,
        batch_size=4,
        log_file="metrics.jsonl",
        top_k=16,
        stage_pixels=stage,
        seed=3,
    )
    tr.update(training_overrides)
    return Config(
        data=DataConfig(
            synthetic_root=os.path.join(root, "synth"),
            num_train_images=8,
            num_test_images=4,
            max_gt=8,
            synthetic_classes=3,
        ),
        training=TrainingConfig(**tr),
        model=ModelConfig(name="tiny", trainable_last_k=1),
    )


def _run(tmp_path, name, stage, **overrides):
    root = str(tmp_path / name)
    trainer = Trainer(_cfg(root, stage, **overrides), workdir=root)
    metrics = trainer.run()
    with open(os.path.join(root, "metrics.jsonl")) as f:
        log = [json.loads(line) for line in f.read().strip().split("\n")]
    return trainer, metrics, log


def _assert_identical(log_a, log_b, metrics_a, metrics_b):
    assert len(log_a) == len(log_b)
    for ra, rb in zip(log_a, log_b):
        for k in ra:
            if k.startswith("train_"):
                # the staged path accumulates terms in an f32 device vector
                # (one fetch/epoch) where the streamed path sums f64 host
                # floats — training math is identical (the params assert
                # below is exact), only the LOGGED means differ in f32 eps
                np.testing.assert_allclose(
                    ra[k], rb[k], rtol=2e-6, err_msg=k
                )
    assert float(metrics_a["map"]) == float(metrics_b["map"])


@pytest.mark.parametrize(
    "overrides",
    [
        {},  # uncached streamed vs staged
        {"cache_backbone": True},  # epoch-1 prefix fed from the pixel pool
        {"augment_hflip": True, "cache_backbone": True},  # two-row act pool
    ],
    ids=["uncached", "cached", "cached_hflip"],
)
def test_staged_matches_streamed(tmp_path, overrides):
    t_off, m_off, log_off = _run(tmp_path, "off", "off", **overrides)
    t_on, m_on, log_on = _run(tmp_path, "on", "on", **overrides)
    assert t_off._stage_on is False and t_on._stage_on is True
    assert t_on._pix_test is not None  # eval ran through the staged pool
    _assert_identical(log_off, log_on, m_off, m_on)
    # the TRAINING MATH is bit-identical: same final params either way
    np.testing.assert_array_equal(
        np.asarray(t_off.state.trainable["queries"]),
        np.asarray(t_on.state.trainable["queries"]),
    )


def test_cached_frees_pixel_pool_after_fill(tmp_path):
    t, _, _ = _run(tmp_path, "freed", "on", cache_backbone=True)
    # every act row filled during epoch 1 -> the image pool was released
    # (GT pools stay: the device-epoch cached steps gather them)
    assert t._acts_filled.all()
    assert "image" not in t._pix_train
    assert {"labels", "boxes", "gt_mask"} <= set(t._pix_train)


def test_auto_stays_off_on_cpu(tmp_path):
    t, _, _ = _run(tmp_path, "auto", "auto")
    assert t._stage_on is False  # auto stages only on tpu backends


def test_yaml_bool_coerces_to_on_off(tmp_path):
    from owlvit_tpu.utils.config import load_config

    p = tmp_path / "cfg.yaml"
    p.write_text("training:\n  stage_pixels: true\n")
    assert load_config(str(p)).training.stage_pixels == "on"
    p.write_text("training:\n  stage_pixels: false\n")
    assert load_config(str(p)).training.stage_pixels == "off"


def test_bad_stage_value_raises(tmp_path):
    with pytest.raises(ValueError, match="stage_pixels"):
        _run(tmp_path, "bad", "sometimes")


def test_split_gather_routing_and_equivalence(tmp_path, monkeypatch):
    """Split-gather auto routing (r5): fused for <=12-layer models (split
    vs fused measured as noise at B/16), split for deep models where the
    monolithic pool-carrying step faults the r5-era relay (BENCH.md). The
    two structures compute identical math; forcing split must reproduce
    the fused run's params exactly, and the composed device-epoch cached
    step (which is monolithic by construction) must stand down."""
    t_fused, m_fused, log_fused = _run(
        tmp_path, "fused", "on", cache_backbone=True)
    assert t_fused._split_gather is False  # tiny = 2 layers -> auto fused
    monkeypatch.setenv("OWLVIT_SPLIT_GATHER", "1")
    t_split, m_split, log_split = _run(
        tmp_path, "split", "on", cache_backbone=True)
    assert t_split._split_gather is True
    assert t_split._epoch_device_ready() is False  # no monolithic epoch step
    _assert_identical(log_fused, log_split, m_fused, m_split)
    np.testing.assert_array_equal(
        np.asarray(t_fused.state.trainable["queries"]),
        np.asarray(t_split.state.trainable["queries"]),
    )
