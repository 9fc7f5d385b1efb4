"""Box geometry primitives, pure JAX.

Capability parity with the reference's torchvision-backed helpers:
  * /root/reference/src/matcher.py:8-44  (box_iou, generalized_box_iou)
  * /root/reference/src/util.py:81-129   (BoxUtil.box_convert / scale_bounding_box)

All functions are jit/vmap/grad-safe, shape-polymorphic over leading batch
dimensions, and avoid data-dependent control flow. Box layout is always the
last axis of size 4.

Formats:
  xyxy   — (x0, y0, x1, y1) corners
  xywh   — (x0, y0, w, h) top-left + size (COCO annotation format)
  cxcywh — (cx, cy, w, h) center + size (model regression format)
"""

from __future__ import annotations

import jax.numpy as jnp

# --------------------------------------------------------------------------
# Format conversion
# --------------------------------------------------------------------------


def xywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    x0, y0, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([x0, y0, x0 + w, y0 + h], axis=-1)


def xyxy_to_xywh(boxes: jnp.ndarray) -> jnp.ndarray:
    x0, y0, x1, y1 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([x0, y0, x1 - x0, y1 - y0], axis=-1)


def cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    hw, hh = w * 0.5, h * 0.5
    return jnp.concatenate([cx - hw, cy - hh, cx + hw, cy + hh], axis=-1)


def xyxy_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    x0, y0, x1, y1 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) * 0.5, (y0 + y1) * 0.5, x1 - x0, y1 - y0], axis=-1
    )


_CONVERTERS = {
    ("xywh", "xyxy"): xywh_to_xyxy,
    ("xyxy", "xywh"): xyxy_to_xywh,
    ("cxcywh", "xyxy"): cxcywh_to_xyxy,
    ("xyxy", "cxcywh"): xyxy_to_cxcywh,
}


def convert(boxes: jnp.ndarray, in_fmt: str, out_fmt: str) -> jnp.ndarray:
    """Convert between box formats. `in_fmt`/`out_fmt` must be static strings."""
    if in_fmt == out_fmt:
        return boxes
    direct = _CONVERTERS.get((in_fmt, out_fmt))
    if direct is not None:
        return direct(boxes)
    # Route through xyxy.
    return _CONVERTERS[("xyxy", out_fmt)](_CONVERTERS[(in_fmt, "xyxy")](boxes))


def scale(boxes: jnp.ndarray, width, height, mode: str) -> jnp.ndarray:
    """Scale boxes (any x/y-interleaved 4-vector format) by image size.

    mode="down": absolute -> normalized; mode="up": normalized -> absolute.
    Unlike the reference (util.py:82-97) this is out-of-place and batched.
    """
    wh = jnp.stack(
        [jnp.asarray(width, jnp.float32), jnp.asarray(height, jnp.float32)], axis=-1
    )
    factor = jnp.tile(wh, 2).reshape(wh.shape[:-1] + (4,))
    if mode == "down":
        return boxes / factor
    if mode == "up":
        return boxes * factor
    raise ValueError(f"mode must be 'up' or 'down', got {mode!r}")


# --------------------------------------------------------------------------
# Areas / IoU / GIoU
# --------------------------------------------------------------------------


def area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes; [..., 4] -> [...]."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def pairwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Pairwise IoU of xyxy boxes: [..., N, 4] x [..., M, 4] -> ([..., N, M], union).

    Mirrors /root/reference/src/matcher.py:8-21 (returns iou AND union).
    """
    area1 = area(boxes1)
    area2 = area(boxes2)
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[..., :, None] + area2[..., None, :] - inter
    return inter / union, union


def pairwise_iou_above(
    boxes1: jnp.ndarray, boxes2: jnp.ndarray, threshold: float
) -> jnp.ndarray:
    """Pairwise predicate IoU > threshold, computed as inter > t*union.

    Same boolean as `pairwise_iou(...) > t` up to floating-point rounding
    at the threshold boundary (inter > t*union and inter/union > t can
    disagree by one ulp for IoUs exactly at t — don't rely on boundary
    ties for exact parity). The union > 0 guard covers degenerate inputs
    (negative-area xyxy would make inter > t*union spuriously true while
    iou = 0/neg compares false), and skips the [N, M] divide.

    Coordinates are broadcast SEPARATELY into [..., N, M] planes instead
    of stacked [..., N, M, 2] lt/rb tensors: this runs at the quirk-#7
    label-propagation shape ([B, P, P] with P=3600 at L/14), where a
    trailing size-2 dim gets 16x tile padding — the stacked form cost
    11.6 GB of pure padding and OOM'd the L/14 tail step (r3). Per-plane
    math is elementwise-identical."""
    area1 = area(boxes1)
    area2 = area(boxes2)
    iw = jnp.clip(
        jnp.minimum(boxes1[..., :, None, 2], boxes2[..., None, :, 2])
        - jnp.maximum(boxes1[..., :, None, 0], boxes2[..., None, :, 0]),
        0.0,
    )
    ih = jnp.clip(
        jnp.minimum(boxes1[..., :, None, 3], boxes2[..., None, :, 3])
        - jnp.maximum(boxes1[..., :, None, 1], boxes2[..., None, :, 1]),
        0.0,
    )
    inter = iw * ih
    union = area1[..., :, None] + area2[..., None, :] - inter
    return (inter > threshold * union) & (union > 0)


def pairwise_giou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise generalized IoU of xyxy boxes: [..., N, M].

    Same math as /root/reference/src/matcher.py:25-44. Boxes must be
    non-degenerate (x1>=x0, y1>=y0); under jit we cannot assert, so callers
    guarantee this by construction (sigmoid'd cxcywh is always valid).
    """
    iou, union = pairwise_iou(boxes1, boxes2)
    lt = jnp.minimum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.maximum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    hull = wh[..., 0] * wh[..., 1]
    return iou - (hull - union) / hull


def elementwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """IoU of aligned box pairs: [..., 4] x [..., 4] -> [...]."""
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area(boxes1) + area(boxes2) - inter
    return inter / union


def elementwise_giou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """GIoU of aligned box pairs: [..., 4] x [..., 4] -> [...].

    Equivalent to diag(pairwise_giou) (losses.py:66) without the N^2 waste.
    """
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area(boxes1) + area(boxes2) - inter
    iou = inter / union
    lt_h = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb_h = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    wh_h = jnp.clip(rb_h - lt_h, 0.0)
    hull = wh_h[..., 0] * wh_h[..., 1]
    return iou - (hull - union) / hull
