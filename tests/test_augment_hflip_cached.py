"""training.augment_hflip — flip augmentation that composes with the
activation cache.

The r3 design refused `training.augment` with `training.cache_backbone`
(correct: the cache memoizes constant pixels), which left augmentation
unusable in the shipped default config. hflip is deterministic with two
outcomes per image, so the device pool stores BOTH prefixes (rows 2i/2i+1)
and each step gathers the sampled row while mirroring GT boxes in-graph.

These tests pin: (a) cached-hflip == uncached-hflip training exactly (same
host-sampled flip bits, prefix/tail split is bit-identical), (b) the flips
actually vary and are deterministic, (c) the two-row pool fills and pixels
are skipped once it does, (d) config guard rails.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from owlvit_tpu.ops.augment import apply_hflip, mirror_boxes
from owlvit_tpu.utils.config import Config, DataConfig, ModelConfig, TrainingConfig


def _cfg(root: str, cache_backbone: bool, n_epochs: int = 2, **tkw) -> Config:
    return Config(
        data=DataConfig(
            synthetic_root=os.path.join(root, "synth"),
            num_train_images=8,
            num_test_images=4,
            max_gt=8,
            synthetic_classes=3,
        ),
        training=TrainingConfig(
            n_epochs=n_epochs,
            learning_rate=1e-4,
            batch_size=4,
            log_file=None,
            top_k=16,
            cache_backbone=cache_backbone,
            augment_hflip=True,
            **tkw,
        ),
        model=ModelConfig(name="tiny", trainable_last_k=1),
    )


def _run(root: str, cache_backbone: bool, n_epochs: int = 2, **tkw):
    from owlvit_tpu.train import Trainer

    trainer = Trainer(_cfg(root, cache_backbone, n_epochs, **tkw), workdir=root)
    metrics = trainer.run()
    return trainer, metrics


def test_apply_hflip_mirrors_selected_rows():
    img = jnp.arange(2 * 2 * 4 * 3, dtype=jnp.uint8).reshape(2, 2, 4, 3)
    boxes = jnp.asarray(
        [[[0.1, 0.2, 0.3, 0.4]], [[0.1, 0.2, 0.3, 0.4]]], jnp.float32
    )
    flip = jnp.asarray([False, True])
    out_img, out_boxes = apply_hflip(img, boxes, flip)
    np.testing.assert_array_equal(np.asarray(out_img[0]), np.asarray(img[0]))
    np.testing.assert_array_equal(
        np.asarray(out_img[1]), np.asarray(img[1, :, ::-1, :])
    )
    np.testing.assert_allclose(
        np.asarray(out_boxes[1, 0]), [0.7, 0.2, 0.9, 0.4], rtol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(out_boxes[0]), np.asarray(boxes[0])
    )
    # mirror is an involution
    back = mirror_boxes(out_boxes, flip)
    np.testing.assert_allclose(np.asarray(back), np.asarray(boxes), rtol=1e-6)


def test_hflip_cached_matches_uncached(tmp_path):
    """The whole point: flip-augmented training runs under the cache with
    the SAME losses/params as the uncached flip-augmented run (both sample
    identical flip bits; prefix-of-flipped == stored flipped row exactly)."""
    t_plain, m_plain = _run(str(tmp_path / "plain"), cache_backbone=False)
    t_cached, m_cached = _run(
        str(tmp_path / "cached"), cache_backbone=True,
        cache_backbone_store="device",
    )
    assert int(t_plain.state.step) == int(t_cached.state.step) == 4
    qa = np.asarray(t_plain.state.trainable["queries"], np.float32)
    qb = np.asarray(t_cached.state.trainable["queries"], np.float32)
    np.testing.assert_allclose(qa, qb, rtol=2e-5, atol=2e-6)
    assert np.isclose(m_plain["map"], m_cached["map"], atol=1e-6)
    # two pool rows per image, all filled after epoch 1
    assert t_cached._pool_rows == 16
    assert t_cached._acts_filled.shape == (16,)
    assert t_cached._acts_filled.all()
    assert t_cached._acts_dev.shape[0] == 16


def test_hflip_flips_vary_and_are_deterministic(tmp_path):
    from owlvit_tpu.train import Trainer

    t = Trainer(_cfg(str(tmp_path), cache_backbone=False), workdir=str(tmp_path))
    t._batches_done = 0
    f0 = t._sample_flips(64)
    t._batches_done = 1
    f1 = t._sample_flips(64)
    t._batches_done = 0
    again = t._sample_flips(64)
    np.testing.assert_array_equal(f0, again)  # keyed by (seed, step)
    assert f0.any() and not f0.all()  # both outcomes occur
    assert (f0 != f1).any()  # different step -> different bits


def test_hflip_skips_pixels_once_pool_full(tmp_path):
    t, _ = _run(
        str(tmp_path), cache_backbone=True, cache_backbone_store="device",
        n_epochs=1,
    )
    want = t._want_image()
    assert want is not None
    assert not want(np.arange(8))  # both rows filled -> no pixels needed
    t._acts_filled[2 * 3 + 1] = False  # lose one flipped row
    assert want(np.asarray([3]))


def test_hflip_refuses_disk_store(tmp_path):
    from owlvit_tpu.train import Trainer

    with pytest.raises(ValueError, match="device store"):
        Trainer(
            _cfg(str(tmp_path), cache_backbone=True,
                 cache_backbone_store="disk"),
            workdir=str(tmp_path),
        )


def test_hflip_and_augment_are_exclusive(tmp_path):
    from owlvit_tpu.train import Trainer

    with pytest.raises(ValueError, match="augment_hflip"):
        Trainer(
            _cfg(str(tmp_path), cache_backbone=False, augment=True),
            workdir=str(tmp_path),
        )
