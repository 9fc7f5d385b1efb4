"""Image preprocessing: CLIP resize + rescale + normalize, fused on device.

Replaces the reference's host-side HF `OwlViTProcessor` pipeline
(/root/reference/src/dataset.py:69-71; HF image_processing_owlvit.py:166-182):
768x768 bicubic resize (no aspect preservation, no crop), rescale by 1/255,
normalize with the OpenAI CLIP mean/std.

Two entry points:
  * `normalize_image` — rescale+normalize only (host already resized).
    This is the hot-path op used by the training loader where decode+resize
    happen in prefetch threads and the cheap elementwise math is fused
    on-device into the first conv/matmul by XLA.
  * `preprocess_image` — full on-device resize+normalize for a fixed source
    shape (e.g. synthetic data, video streams, benchmark pipelines).

Both are jit-safe, batched (leading dims), NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# OpenAI CLIP normalization constants (HF transformers utils/constants.py:5-6).
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], dtype=np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], dtype=np.float32)

DEFAULT_SIZE = 768


def normalize_image(image: jnp.ndarray) -> jnp.ndarray:
    """uint8/float [..., H, W, 3] in [0,255] -> CLIP-normalized float32."""
    x = image.astype(jnp.float32) * (1.0 / 255.0)
    return (x - CLIP_MEAN) / CLIP_STD


def resize_image(
    image: jnp.ndarray, size: int = DEFAULT_SIZE, antialias: bool = True
) -> jnp.ndarray:
    """Bicubic resize [..., H, W, 3] -> [..., size, size, 3] (float32).

    jax.image.resize's cubic kernel with antialiasing approximates PIL's
    bicubic filter (what the HF processor uses); parity is validated to a
    loose tolerance in tests — training recomputes statistics either way.
    """
    x = image.astype(jnp.float32)
    out_shape = x.shape[:-3] + (size, size, x.shape[-1])
    return jax.image.resize(x, out_shape, method="cubic", antialias=antialias)


def preprocess_image(image: jnp.ndarray, size: int = DEFAULT_SIZE) -> jnp.ndarray:
    """Fused resize + rescale + normalize. [..., H, W, 3] uint8 -> float32."""
    x = resize_image(image, size=size)
    x = x * (1.0 / 255.0)
    return (x - CLIP_MEAN) / CLIP_STD
