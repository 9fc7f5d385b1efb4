"""On-device data augmentation: jit-compiled, batched, box-aware.

The reference trains with NO augmentation — its dataset __getitem__ is
resize+normalize only (/root/reference/src/dataset.py:60-73). This module
adds the standard detection-augmentation set as pure JAX ops that fuse into
the train step (beyond-reference capability):

  * random horizontal flip (per image, with box x-mirror)
  * color jitter (brightness / contrast / saturation, per-image factors)
  * scale jitter (zoom in = random crop, zoom out = shrink onto a zero
    canvas) via a fixed-output-shape affine resample — no dynamic shapes,
    so one compiled executable covers every sampled window (XLA-friendly;
    `jax.image.scale_and_translate` lowers to two 1-D resample matmuls).

Randomness: everything is sampled from a PRNG key the trainer folds with
the step counter INSIDE the jitted step — bit-reproducible for a given
training.seed, with no host RNG state to thread.

Coordinates: boxes are normalized xyxy (the framework's canonical layout,
data/dataset.py:223). Boxes pushed outside a crop are clipped; a box whose
visible area falls below `min_visibility` of its transformed area has its
gt_mask slot cleared (fixed shapes: slots are never compacted).

Interaction with the activation cache: augmented pixels change every step,
so `training.cache_backbone` + augmentation is refused at trainer setup —
the cache exists precisely because the reference recomputes a frozen
backbone over CONSTANT pixels every epoch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# ITU-R BT.601 luma weights (torchvision's rgb_to_grayscale convention).
# Plain numpy, NOT jnp: if this module is first imported inside a jit trace,
# a jnp constant would be created as a tracer and leak into module state
# (stale-tracer error on the next retrace).
_LUMA = np.asarray([0.299, 0.587, 0.114], np.float32)


def mirror_boxes(boxes: jnp.ndarray, flip: jnp.ndarray) -> jnp.ndarray:
    """x-mirror normalized-xyxy boxes [B,G,4] where flip [B] is True."""
    x1, y1, x2, y2 = (boxes[..., i] for i in range(4))
    mirrored = jnp.stack([1.0 - x2, y1, 1.0 - x1, y2], axis=-1)
    return jnp.where(flip[:, None, None], mirrored, boxes)


def apply_hflip(images, boxes, flip):
    """Deterministic hflip core: flip [B] bool selects which images/boxes
    mirror. Shared by the keyed `hflip` and the cached-hflip train path
    (training.augment_hflip), whose flip decisions are sampled host-side so
    the activation-pool row choice and the in-graph mirror agree."""
    images = jnp.where(flip[:, None, None, None], images[:, :, ::-1, :], images)
    return images, mirror_boxes(boxes, flip)


def hflip(key, images, boxes, prob: float = 0.5):
    """Per-image random horizontal flip. images [B,H,W,3] float, boxes
    [B,G,4] normalized xyxy -> (images, boxes)."""
    flip = jax.random.bernoulli(key, prob, (images.shape[0],))
    return apply_hflip(images, boxes, flip)


def apply_color(images, fb, fc, fs):
    """Deterministic brightness -> contrast -> saturation composition with
    per-image [B] (or scalar) factors — torchvision semantics: each op
    blends on the CURRENT image (the saturation gray is recomputed after
    contrast; blending toward a stale pre-contrast gray would partially
    undo the contrast step in the luma channel). Exposed for exact unit
    tests; `color_jitter` draws the factors."""
    shape = (-1, 1, 1, 1)
    fb = jnp.reshape(jnp.asarray(fb, jnp.float32), shape)
    fc = jnp.reshape(jnp.asarray(fc, jnp.float32), shape)
    fs = jnp.reshape(jnp.asarray(fs, jnp.float32), shape)
    x = images * fb
    # contrast: pull from the per-image gray mean (torchvision semantics)
    gray = jnp.tensordot(x, _LUMA, axes=[[-1], [0]])  # [B,H,W]
    mean = gray.mean(axis=(1, 2))[:, None, None, None]
    x = mean + fc * (x - mean)
    # saturation: pull toward the CURRENT per-pixel gray
    gray = jnp.tensordot(x, _LUMA, axes=[[-1], [0]])
    x = gray[..., None] + fs * (x - gray[..., None])
    return jnp.clip(x, 0.0, 255.0)


def color_jitter(key, images, strength: float):
    """Brightness/contrast/saturation, each scaled by a per-image factor
    drawn from [1-strength, 1+strength]. images float [B,H,W,3] in [0,255]."""
    if strength <= 0.0:
        return images
    B = images.shape[0]
    kb, kc, ks = jax.random.split(key, 3)
    lo, hi = 1.0 - strength, 1.0 + strength
    f = lambda k: jax.random.uniform(  # noqa: E731
        k, (B,), jnp.float32, lo, hi)
    return apply_color(images, f(kb), f(kc), f(ks))


def apply_scale_window(images, boxes, gt_mask, x0, y0, s,
                       min_visibility: float = 0.1):
    """Resample each image so the window [x0, x0+s] x [y0, y0+s] (normalized
    input coords; may extend past [0,1] when s > 1) fills the fixed output.

    x0, y0, s are per-image [B] arrays. Out-of-image samples are zero-fill.
    Boxes map by (box - origin) / s, then clip; slots with visible area
    below `min_visibility` of the transformed area are masked out.
    Deterministic core of `scale_jitter`, exposed for exact unit tests.
    """
    B, H, W, _ = images.shape

    def one(img, xo, yo, sc):
        # output pixel u samples input at  in = sc * u + origin_px
        #   <=> scale_and_translate scale = 1/sc, translation = -origin/sc
        scale = jnp.stack([1.0 / sc, 1.0 / sc])
        trans = jnp.stack([-(yo * H) / sc, -(xo * W) / sc])
        return jax.image.scale_and_translate(
            img, img.shape, (0, 1), scale, trans, method="linear",
            antialias=True,
        )

    images = jax.vmap(one)(images, x0, y0, s)

    origin = jnp.stack([x0, y0, x0, y0], axis=-1)[:, None, :]  # [B,1,4]
    moved = (boxes - origin) / s[:, None, None]
    clipped = jnp.clip(moved, 0.0, 1.0)
    area = lambda b: jnp.maximum(b[..., 2] - b[..., 0], 0.0) * jnp.maximum(  # noqa: E731
        b[..., 3] - b[..., 1], 0.0)
    vis = area(clipped) / jnp.maximum(area(moved), 1e-12)
    keep = (area(clipped) > 1e-6) & (vis >= min_visibility)
    return images, clipped, gt_mask & keep


def scale_jitter(key, images, boxes, gt_mask, scale_min: float,
                 scale_max: float, min_visibility: float = 0.1):
    """Random zoom: s < 1 crops a random s-window (zoom in), s > 1 shrinks
    the image onto a zero canvas (zoom out)."""
    if scale_min == 1.0 and scale_max == 1.0:
        return images, boxes, gt_mask
    B = images.shape[0]
    ks, kx, ky = jax.random.split(key, 3)
    s = jax.random.uniform(ks, (B,), jnp.float32, scale_min, scale_max)
    # window origin range: [0, 1-s] when cropping, [1-s, 0] when zooming out
    u = lambda k: jax.random.uniform(k, (B,), jnp.float32)  # noqa: E731
    x0 = jnp.minimum(1.0 - s, 0.0) + jnp.abs(1.0 - s) * u(kx)
    y0 = jnp.minimum(1.0 - s, 0.0) + jnp.abs(1.0 - s) * u(ky)
    return apply_scale_window(images, boxes, gt_mask, x0, y0, s,
                              min_visibility)


def augment_batch(
    key,
    images,
    boxes,
    gt_mask,
    *,
    hflip_prob: float = 0.5,
    color_strength: float = 0.0,
    scale_min: float = 1.0,
    scale_max: float = 1.0,
):
    """Full augmentation pipeline. images uint8/float [B,H,W,3] in [0,255]
    -> (float32 images [0,255], boxes, gt_mask). Feed the result straight
    into ops.preprocess.normalize_image."""
    images = images.astype(jnp.float32)
    kf, kc, kz = jax.random.split(key, 3)
    if hflip_prob > 0.0:
        images, boxes = hflip(kf, images, boxes, hflip_prob)
    images = color_jitter(kc, images, color_strength)
    images, boxes, gt_mask = scale_jitter(
        kz, images, boxes, gt_mask, scale_min, scale_max)
    return images, boxes, gt_mask
