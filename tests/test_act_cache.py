"""Frozen-backbone activation cache: storage, model-split parity, trainer e2e.

The cache exploits that the reference's frozen prefix (models.py:173-184
freeze set) is a pure per-image function — these tests pin (a) the memmap
store roundtrip, (b) forward_train == forward_train_from_prefix(embed_prefix)
exactly, and (c) a cached training run matching an uncached one.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from owlvit_tpu.data.act_cache import ActivationCache, fingerprint
from owlvit_tpu.models import get_config, owlvit
from owlvit_tpu.utils.config import Config, DataConfig, ModelConfig, TrainingConfig


def test_store_roundtrip_bf16(tmp_path):
    import ml_dtypes

    base = str(tmp_path / "c")
    cache = ActivationCache(base, n_items=6, fp="fp0")
    acts = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4)
    acts_bf = acts.astype(ml_dtypes.bfloat16)
    assert not cache.has([0, 1])
    cache.write([4, 1], acts_bf)
    assert cache.has([1, 4]) and not cache.has([0]) and not cache.complete
    got = cache.read([4, 1])
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(acts_bf, np.float32)
    )
    # row-indexed: reversed order reads reversed rows
    got_rev = cache.read([1, 4])
    np.testing.assert_array_equal(np.asarray(got_rev), np.asarray(got)[::-1])
    with pytest.raises(KeyError):
        cache.read([0])


def test_store_reopen_and_stale_fingerprint(tmp_path):
    base = str(tmp_path / "c")
    cache = ActivationCache(base, n_items=3, fp="fpA")
    cache.write([0, 1, 2], np.ones((3, 2, 2), np.float32))
    cache.flush()
    # same fingerprint: reopen sees the rows
    again = ActivationCache(base, n_items=3, fp="fpA")
    assert again.complete
    # different fingerprint (e.g. new checkpoint): rows are invisible
    stale = ActivationCache(base, n_items=3, fp="fpB")
    assert not stale.has([0])
    # and a write rebuilds cleanly under the new fingerprint
    stale.write([1], np.zeros((1, 2, 2), np.float32))
    assert stale.has([1]) and not stale.has([0])


def test_fingerprint_stability():
    a = fingerprint({"m": "b16", "k": 1, "ds": ["x", "y"]})
    b = fingerprint({"ds": ["x", "y"], "k": 1, "m": "b16"})
    c = fingerprint({"ds": ["x", "z"], "k": 1, "m": "b16"})
    assert a == b != c


@pytest.mark.parametrize("k", [0, 1])
def test_prefix_tail_matches_fused_forward(k):
    cfg = get_config("tiny").replace(trainable_last_k=k)
    params = owlvit.init(jax.random.PRNGKey(0), cfg, num_queries=6)
    img = jax.random.uniform(
        jax.random.PRNGKey(1), (2, cfg.vision.image_size, cfg.vision.image_size, 3)
    )
    boxes_a, sims_a = owlvit.forward_train(params, cfg, img)
    acts = owlvit.embed_prefix(params, cfg, img)
    boxes_b, sims_b = owlvit.forward_train_from_prefix(params, cfg, acts)
    np.testing.assert_array_equal(np.asarray(boxes_a), np.asarray(boxes_b))
    np.testing.assert_array_equal(np.asarray(sims_a), np.asarray(sims_b))


def test_embed_prefix_rejects_full_finetune():
    cfg = get_config("tiny").replace(trainable_last_k=None)
    params = owlvit.init(jax.random.PRNGKey(0), cfg, num_queries=6)
    img = jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3))
    with pytest.raises(ValueError):
        owlvit.embed_prefix(params, cfg, img)


def _run(root: str, cache_backbone: bool, store: str = "auto",
         store_dtype=None, n_epochs: int = 2) -> tuple:
    from owlvit_tpu.train import Trainer

    cfg = Config(
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
            cache_backbone_store=store,
            cache_store_dtype=store_dtype,
        ),
        model=ModelConfig(name="tiny", trainable_last_k=1),
    )
    trainer = Trainer(cfg, workdir=root)
    metrics = trainer.run()
    return trainer, metrics


@pytest.mark.parametrize("store", ["disk", "device"])
def test_trainer_cached_run_matches_uncached(tmp_path, store):
    t_plain, m_plain = _run(str(tmp_path / "plain"), cache_backbone=False)
    t_cached, m_cached = _run(
        str(tmp_path / "cached"), cache_backbone=True, store=store
    )
    if store == "disk":
        assert t_cached.act_cache is not None and t_cached.act_cache.complete
    else:
        assert t_cached.act_cache is None
        assert t_cached._acts_filled.all() and t_cached._acts_dev is not None
    # same data (same seeds), same step count, near-identical learned params
    assert int(t_plain.state.step) == int(t_cached.state.step) == 4
    qa = np.asarray(t_plain.state.trainable["queries"], np.float32)
    qb = np.asarray(t_cached.state.trainable["queries"], np.float32)
    np.testing.assert_allclose(qa, qb, rtol=2e-5, atol=2e-6)
    assert np.isclose(m_plain["map"], m_cached["map"], atol=1e-6)

    if store == "disk":
        # epoch 3 from a fresh Trainer object reuses the on-disk cache rows
        t2, _ = _run(str(tmp_path / "cached"), cache_backbone=True, store=store)
        assert t2.act_cache.complete


def test_quantize_rows_roundtrip():
    from owlvit_tpu.ops.quant import dequantize_rows, quantize_rows

    # rows with wildly different dynamic ranges (the per-token-scale case)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 6, 32))
    x = x * (10.0 ** jnp.arange(-2, 2))[:, None, None]
    q, s = quantize_rows(x)
    assert q.dtype == jnp.int8 and q.shape == x.shape
    assert s.shape == (4, 6) and s.dtype == jnp.float32
    deq = dequantize_rows(q, s, jnp.float32)
    # symmetric rounding: worst-case error is half a quantization step
    err = np.abs(np.asarray(deq) - np.asarray(x, np.float32))
    bound = np.asarray(s)[..., None] * 0.5 * (1 + 1e-5)
    assert (err <= bound).all()
    # zero rows survive (scale floor, no NaN/inf)
    q0, s0 = quantize_rows(jnp.zeros((2, 3, 8)))
    assert np.isfinite(np.asarray(s0)).all()
    assert (np.asarray(dequantize_rows(q0, s0, jnp.float32)) == 0).all()


def test_trainer_int8_store_epoch1_is_exact(tmp_path):
    # Epoch 1 never READS the quantized pool (tail trains on the exact
    # prefix output; quantization only affects rows re-read from epoch 2),
    # so a 1-epoch int8-store run must equal the bf16-store run bit-for-bit.
    t_a, _ = _run(str(tmp_path / "a"), cache_backbone=True, store="device",
                  n_epochs=1)
    t_b, _ = _run(str(tmp_path / "b"), cache_backbone=True, store="device",
                  store_dtype="int8", n_epochs=1)
    assert isinstance(t_b._acts_dev, dict)
    assert t_b._acts_dev["q"].dtype == jnp.int8
    assert t_b._acts_dev["s"].dtype == jnp.float32
    np.testing.assert_array_equal(
        np.asarray(t_a.state.trainable["queries"], np.float32),
        np.asarray(t_b.state.trainable["queries"], np.float32),
    )


def test_trainer_int8_store_trains_close_to_exact(tmp_path):
    t_a, m_a = _run(str(tmp_path / "a"), cache_backbone=True, store="device")
    t_b, m_b = _run(str(tmp_path / "b"), cache_backbone=True, store="device",
                    store_dtype="int8")
    assert t_b._acts_filled.all()
    assert int(t_a.state.step) == int(t_b.state.step)
    qa = np.asarray(t_a.state.trainable["queries"], np.float32)
    qb = np.asarray(t_b.state.trainable["queries"], np.float32)
    assert np.isfinite(qb).all()
    # epoch 2 reads int8 rows (worst-case elementwise error rowmax/254):
    # close, not identical — a loose bound that still catches a broken
    # dequant (which would diverge by O(1), not O(lr))
    np.testing.assert_allclose(qa, qb, atol=5e-3)


def test_cache_store_dtype_validation(tmp_path):
    with pytest.raises(ValueError, match="cache_store_dtype"):
        _run(str(tmp_path / "x"), cache_backbone=True, store="device",
             store_dtype="int4")
    with pytest.raises(ValueError, match="device pool"):
        _run(str(tmp_path / "y"), cache_backbone=True, store="disk",
             store_dtype="int8")


def test_auto_store_picks_device_for_small_sets(tmp_path):
    t, _ = _run(str(tmp_path / "auto"), cache_backbone=True, store="auto")
    assert t.act_store == "device"  # tiny model, 8 images: far under 10 GB


def test_trainer_cache_requires_frozen_prefix(tmp_path):
    from owlvit_tpu.train import Trainer

    cfg = Config(
        data=DataConfig(
            synthetic_root=os.path.join(str(tmp_path), "synth"),
            num_train_images=4,
            num_test_images=2,
            max_gt=8,
            synthetic_classes=3,
        ),
        training=TrainingConfig(
            n_epochs=1, batch_size=2, log_file=None, cache_backbone=True
        ),
        model=ModelConfig(name="tiny", trainable_last_k=None),
    )
    with pytest.raises(ValueError, match="cache_backbone"):
        Trainer(cfg, workdir=str(tmp_path))
