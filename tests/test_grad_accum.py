"""Gradient accumulation (training.grad_accum via optax.MultiSteps):
update cadence, grad averaging, LR-schedule step counting, e2e smoke."""

import os

import jax
import numpy as np
import pytest

from owlvit_tpu.train import Trainer
from owlvit_tpu.utils.config import Config, DataConfig, ModelConfig, TrainingConfig


def _cfg(root, **training):
    return Config(
        data=DataConfig(
            synthetic_root=os.path.join(root, "synth"),
            num_train_images=8,
            num_test_images=2,
            max_gt=8,
            synthetic_classes=3,
        ),
        training=TrainingConfig(
            n_epochs=training.pop("n_epochs", 1),
            learning_rate=1e-4,
            batch_size=4,
            checkpoint_dir=None,
            log_file=None,
            top_k=8,
            **training,
        ),
        model=ModelConfig(name="tiny", trainable_last_k=1),
    )


def _batch(rng, image_size, b=4, g=4, n_classes=3):
    return {
        "image": rng.integers(0, 255, (b, image_size, image_size, 3),
                              dtype=np.uint8),
        "labels": rng.integers(0, n_classes, (b, g)).astype(np.int32),
        "boxes": np.sort(rng.uniform(0.1, 0.9, (b, g, 2, 2)), axis=2)
        .reshape(b, g, 4).astype(np.float32),
        "gt_mask": np.ones((b, g), bool),
    }


def _leaves(tree):
    return [np.asarray(x) for x in jax.tree.leaves(tree)]


def test_accum_cadence_and_identical_batch_equivalence(tmp_path, rng):
    """With grad_accum=2: micro-step 1 leaves params untouched; after
    micro-step 2 the params equal a plain (grad_accum=1) step on the same
    batch — two identical micro-grads average to that grad exactly."""
    root = str(tmp_path)
    tr_acc = Trainer(_cfg(root, grad_accum=2, seed=0), workdir=root)
    tr_one = Trainer(_cfg(root, grad_accum=1, seed=0), workdir=root)
    img_s = tr_acc.model_cfg.vision.image_size
    batch = _batch(rng, img_s)

    p0 = _leaves(tr_acc.state.trainable)
    for a, b in zip(p0, _leaves(tr_one.state.trainable)):
        np.testing.assert_array_equal(a, b)  # same seed -> same init

    s_acc, _ = tr_acc.train_step(tr_acc.state, batch)
    mid = _leaves(s_acc.trainable)
    for a, b in zip(mid, p0):
        np.testing.assert_array_equal(a, b)  # accumulating: no update yet
    assert int(s_acc.step) == 1  # micro-step counter still advances

    s_acc, _ = tr_acc.train_step(s_acc, batch)
    s_one, _ = tr_one.train_step(tr_one.state, batch)
    changed = False
    for a, b, p in zip(_leaves(s_acc.trainable), _leaves(s_one.trainable), p0):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)
        changed = changed or not np.array_equal(a, p)
    assert changed  # the completed accumulation really updated something


def test_lr_schedule_counts_optimizer_updates(tmp_path):
    """Cosine decay must land on lr_final at the number of UPDATES
    (micro-steps / grad_accum), not micro-steps."""
    root = str(tmp_path)
    t = dict(lr_schedule="cosine", lr_final=1e-6, warmup_steps=0, n_epochs=4)
    tr = Trainer(_cfg(root, grad_accum=2, **t), workdir=root)
    # 8 imgs / b4 = 2 micro-steps/epoch -> 1 update/epoch -> 4 total updates
    sched = tr._lr_schedule()
    assert float(sched(4)) == pytest.approx(1e-6, rel=1e-3)
    assert float(sched(2)) > 1e-5  # halfway through, nowhere near final


def test_grad_accum_validation(tmp_path):
    with pytest.raises(ValueError, match="grad_accum"):
        Trainer(_cfg(str(tmp_path), grad_accum=0), workdir=str(tmp_path))


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs the virtual CPU mesh")
def test_grad_accum_on_mesh_matches_single_device(tmp_path):
    """dp4 + grad_accum=2 == single-device + grad_accum=2: the MultiSteps
    opt state (which embeds a params-shaped grad accumulator) must shard
    structurally and leave numerics untouched."""
    root = str(tmp_path)
    t1 = Trainer(
        _cfg(root, grad_accum=2, n_epochs=2, seed=0),
        workdir=os.path.join(root, "single"),
    )
    t1.run()
    t4 = Trainer(
        _cfg(root, grad_accum=2, n_epochs=2, seed=0, mesh_data=4),
        workdir=os.path.join(root, "dp4"),
    )
    t4.run()
    assert int(t1.state.step) == int(t4.state.step) == 4
    q1 = np.asarray(jax.device_get(t1.state.trainable["queries"]), np.float32)
    q4 = np.asarray(jax.device_get(t4.state.trainable["queries"]), np.float32)
    np.testing.assert_allclose(q1, q4, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("cache", [False, True])
def test_grad_accum_e2e(tmp_path, cache):
    """Full run with grad_accum=2 (plain and composed with the activation
    cache — they share grad_update, so MultiSteps must ride both paths)."""
    root = str(tmp_path)
    tr = Trainer(
        _cfg(root, grad_accum=2, n_epochs=2, cache_backbone=cache),
        workdir=root,
    )
    m = tr.run()
    assert int(tr.state.step) == 4  # 2 micro-steps x 2 epochs
    assert np.isfinite(float(m["map"]))
