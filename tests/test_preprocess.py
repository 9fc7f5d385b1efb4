"""Preprocessing parity vs the HF OwlViT image processor (test-only torch)."""

import jax.numpy as jnp
import numpy as np
import pytest

from owlvit_tpu.ops import preprocess as P


def test_normalize_exact(rng):
    img = rng.integers(0, 256, size=(4, 8, 8, 3), dtype=np.uint8)
    out = np.asarray(P.normalize_image(jnp.asarray(img)))
    ref = (img.astype(np.float32) / 255.0 - P.CLIP_MEAN) / P.CLIP_STD
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_resize_identity(rng):
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    out = np.asarray(P.resize_image(jnp.asarray(img), size=16))
    np.testing.assert_allclose(out, img.astype(np.float32), atol=1e-3)


def test_full_pipeline_vs_hf(rng):
    transformers = pytest.importorskip("transformers")
    from transformers.models.owlvit.image_processing_owlvit import (
        OwlViTImageProcessor,
    )

    proc = OwlViTImageProcessor()  # defaults: 768x768 bicubic + CLIP normalize
    img = rng.integers(0, 256, size=(480, 640, 3), dtype=np.uint8)

    ref = proc(images=[img], return_tensors="np")["pixel_values"][0]  # [3,768,768]
    ref = np.transpose(ref, (1, 2, 0))

    ours = np.asarray(P.preprocess_image(jnp.asarray(img), size=768))
    assert ours.shape == (768, 768, 3)

    # PIL's bicubic vs jax.image cubic differ slightly at edges; training and
    # detection statistics are insensitive at this tolerance.
    diff = np.abs(ours - ref)
    assert np.mean(diff) < 0.03, f"mean abs diff {np.mean(diff)}"
    assert np.quantile(diff, 0.99) < 0.25, f"p99 {np.quantile(diff, 0.99)}"
