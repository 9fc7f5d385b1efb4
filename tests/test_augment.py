"""On-device augmentation: flip/color/scale math, determinism, trainer wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from owlvit_tpu.ops import augment


def _images(rng, b=2, s=32):
    return rng.integers(0, 255, (b, s, s, 3), dtype=np.uint8).astype(np.float32)


def _boxes():
    # [B=2, G=3, 4] normalized xyxy (slot 2 padded)
    b = np.zeros((2, 3, 4), np.float32)
    b[0, 0] = [0.10, 0.20, 0.50, 0.60]
    b[0, 1] = [0.60, 0.10, 0.90, 0.40]
    b[1, 0] = [0.25, 0.25, 0.75, 0.75]
    m = np.zeros((2, 3), bool)
    m[0, :2] = True
    m[1, 0] = True
    return jnp.asarray(b), jnp.asarray(m)


def test_hflip_prob1_mirrors_images_and_boxes(rng):
    imgs = jnp.asarray(_images(rng))
    boxes, _ = _boxes()
    out, ob = augment.hflip(jax.random.PRNGKey(0), imgs, boxes, prob=1.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(imgs)[:, :, ::-1])
    np.testing.assert_allclose(
        np.asarray(ob[0, 0]), [0.5, 0.2, 0.9, 0.6], atol=1e-7)
    # involution: flipping twice is the identity
    out2, ob2 = augment.hflip(jax.random.PRNGKey(1), out, ob, prob=1.0)
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(imgs))
    np.testing.assert_allclose(np.asarray(ob2), np.asarray(boxes), atol=1e-7)


def test_hflip_prob0_is_identity(rng):
    imgs = jnp.asarray(_images(rng))
    boxes, _ = _boxes()
    out, ob = augment.hflip(jax.random.PRNGKey(0), imgs, boxes, prob=0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(imgs))
    np.testing.assert_array_equal(np.asarray(ob), np.asarray(boxes))


def test_color_jitter_zero_strength_identity_and_range(rng):
    imgs = jnp.asarray(_images(rng))
    assert augment.color_jitter(jax.random.PRNGKey(0), imgs, 0.0) is imgs
    out = augment.color_jitter(jax.random.PRNGKey(0), imgs, 0.5)
    a = np.asarray(out)
    assert a.shape == imgs.shape
    assert a.min() >= 0.0 and a.max() <= 255.0
    assert not np.allclose(a, np.asarray(imgs))  # it did something
    # same key -> bit-identical
    out2 = augment.color_jitter(jax.random.PRNGKey(0), imgs, 0.5)
    np.testing.assert_array_equal(a, np.asarray(out2))


def test_scale_window_identity():
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(_images(rng))
    boxes, mask = _boxes()
    z = jnp.zeros((2,), jnp.float32)
    out, ob, om = augment.apply_scale_window(
        imgs, boxes, mask, z, z, jnp.ones((2,), jnp.float32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(imgs), atol=1e-3)
    np.testing.assert_allclose(np.asarray(ob), np.asarray(boxes), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(om), np.asarray(mask))


def test_scale_window_crop_moves_content_and_boxes():
    """Crop the top-left quarter (s=0.5): a marker pixel at input (8, 8) of a
    32x32 image must land near output (16, 16); boxes map (b - o)/s."""
    S = 32
    imgs = np.zeros((1, S, S, 3), np.float32)
    imgs[0, 8, 8] = 255.0
    boxes = jnp.asarray([[[0.125, 0.125, 0.375, 0.375]]])  # px 4..12
    mask = jnp.ones((1, 1), bool)
    half = jnp.full((1,), 0.5, jnp.float32)
    zero = jnp.zeros((1,), jnp.float32)
    out, ob, om = augment.apply_scale_window(
        jnp.asarray(imgs), boxes, mask, zero, zero, half)
    y, x = np.unravel_index(np.asarray(out)[0, :, :, 0].argmax(), (S, S))
    assert abs(y - 16) <= 1 and abs(x - 16) <= 1
    np.testing.assert_allclose(np.asarray(ob[0, 0]), [0.25, 0.25, 0.75, 0.75],
                               atol=1e-6)
    assert bool(om[0, 0])


def test_scale_window_drops_boxes_outside_crop():
    """Cropping the right half (x0=0.5, s=0.5) pushes a left-side box out."""
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(_images(rng, b=1))
    boxes = jnp.asarray([[[0.05, 0.40, 0.30, 0.60],     # fully left of crop
                          [0.60, 0.40, 0.90, 0.60]]])   # inside crop
    mask = jnp.ones((1, 2), bool)
    out, ob, om = augment.apply_scale_window(
        imgs, boxes, mask, jnp.full((1,), 0.5), jnp.zeros((1,)),
        jnp.full((1,), 0.5))
    assert not bool(om[0, 0])
    assert bool(om[0, 1])
    np.testing.assert_allclose(np.asarray(ob[0, 1]),
                               [0.2, 0.8, 0.8, 1.0], atol=1e-5)


def test_zoom_out_keeps_all_boxes():
    """s > 1 shrinks content — every box stays visible (and valid)."""
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(_images(rng))
    boxes, mask = _boxes()
    out, ob, om = augment.scale_jitter(
        jax.random.PRNGKey(7), imgs, boxes, mask, 1.3, 1.6)
    np.testing.assert_array_equal(np.asarray(om), np.asarray(mask))
    a = np.asarray(ob[np.asarray(mask)])
    assert (a >= 0).all() and (a <= 1).all()


def test_augment_batch_all_off_identity(rng):
    imgs = _images(rng)
    boxes, mask = _boxes()
    out, ob, om = augment.augment_batch(
        jax.random.PRNGKey(0), jnp.asarray(imgs.astype(np.uint8)), boxes,
        mask, hflip_prob=0.0, color_strength=0.0)
    assert out.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(out), imgs)
    np.testing.assert_array_equal(np.asarray(ob), np.asarray(boxes))
    np.testing.assert_array_equal(np.asarray(om), np.asarray(mask))


def test_augment_batch_jits_and_is_deterministic(rng):
    imgs = jnp.asarray(_images(rng, b=2, s=64).astype(np.uint8))
    boxes, mask = _boxes()
    f = jax.jit(lambda k: augment.augment_batch(
        k, imgs, boxes, mask, hflip_prob=0.5, color_strength=0.3,
        scale_min=0.7, scale_max=1.3))
    a = jax.tree.map(np.asarray, f(jax.random.PRNGKey(5)))
    b = jax.tree.map(np.asarray, f(jax.random.PRNGKey(5)))
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(x, y)
    c = jax.tree.map(np.asarray, f(jax.random.PRNGKey(6)))
    assert not np.allclose(a[0], c[0])


# ---------------------------------------------------------------- trainer


def _write_cfg(tmp_path, extra):
    root = str(tmp_path)
    cfg = f"""
data:
  synthetic_root: {root}/synth
  num_train_images: 8
  num_test_images: 2
  max_gt: 8
  synthetic_classes: 3
training:
  n_epochs: 1
  learning_rate: 1.0e-4
  batch_size: 4
  checkpoint_dir: null
  top_k: 8
{extra}
model:
  name: tiny
  trainable_last_k: 1
"""
    p = f"{root}/config.yaml"
    with open(p, "w") as f:
        f.write(cfg)
    return p


def test_trainer_augment_refuses_cache(tmp_path):
    from owlvit_tpu.train import Trainer
    from owlvit_tpu.utils.config import load_config

    p = _write_cfg(tmp_path, "  augment: true\n  cache_backbone: true\n")
    with pytest.raises(ValueError, match="mutually exclusive"):
        Trainer(load_config(p), workdir=str(tmp_path))


def test_trainer_augment_trains_and_reproduces(tmp_path):
    """Augmented training runs, losses are finite, and a re-run with the
    same seed reproduces the loss exactly (fold_in(step) determinism)."""
    from owlvit_tpu.train import Trainer
    from owlvit_tpu.utils.config import load_config

    p = _write_cfg(
        tmp_path,
        "  augment: true\n  aug_color: 0.3\n"
        "  aug_scale_min: 0.8\n  aug_scale_max: 1.2\n  seed: 3\n",
    )

    def run():
        tr = Trainer(load_config(p), workdir=str(tmp_path))
        m = tr.run()
        return {k: float(v) for k, v in m.items()
                if k.startswith("loss") and np.isscalar(v) or
                isinstance(v, (int, float, np.floating))}

    m1, m2 = run(), run()
    for k, v in m1.items():
        assert np.isfinite(v), (k, v)
    assert m1 == m2


def test_color_compose_semantics():
    """Contrast and saturation must COMPOSE (torchvision: each op blends on
    the current image): full desaturation (fs=0) yields the POST-contrast
    luma, not the pre-contrast one (the r5 fix — a stale gray partially
    undid contrast in the luma channel)."""
    from owlvit_tpu.ops.augment import _LUMA, apply_color

    rng = np.random.default_rng(7)
    img = rng.uniform(0, 255, (1, 8, 8, 3)).astype(np.float32)
    fc = 0.5
    out = np.asarray(apply_color(jnp.asarray(img), 1.0, fc, 0.0))
    # expected: luma of the contrast-adjusted image, replicated per channel
    gray = np.tensordot(img, np.asarray(_LUMA), axes=[[-1], [0]])
    mean = gray.mean()
    contrasted = mean + fc * (img - mean)
    want = np.tensordot(contrasted, np.asarray(_LUMA), axes=[[-1], [0]])
    np.testing.assert_allclose(
        out, np.clip(want[..., None], 0, 255).repeat(3, -1),
        rtol=1e-5, atol=1e-3,
    )
    # identity factors = identity transform
    ident = np.asarray(apply_color(jnp.asarray(img), 1.0, 1.0, 1.0))
    np.testing.assert_allclose(ident, img, rtol=1e-5, atol=1e-3)
