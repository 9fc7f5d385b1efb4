"""PushPull detection loss — batched, jit-compiled, matcher included.

Re-derivation of the reference's loss stack (/root/reference/src/losses.py)
with the batch=1 structural limitation removed: every image in the batch is
matched (vmapped on-device Hungarian) and the four loss terms reduce across
the batch exactly as the reference's semantics generalize:

  loss_ce   — BCE(|sims|, one-hot) on matched patches, per-class weights,
              focal-style modulation (1 - e^-l)^2 * l, summed over classes,
              mean over matched patches          (losses.py:16-40)
  loss_bg   — same vs zeros on background patches
  loss_bbox — L1 over matched pairs / num_boxes  (losses.py:57-63)
  loss_giou — 1 - GIoU over matched pairs / num_boxes (losses.py:66-67)

Quirks replicated on purpose (SURVEY §5.9 — they define the training dynamics
being matched):
  * #2: BCE on |cosine sims| treated as probabilities
  * #7: IoU>0.85 label propagation AFTER matching, as a SEQUENTIAL sweep over
    patches in index order — the reference's python loop reads the tensor it
    mutates, so propagated labels can chain within one sweep; we reproduce
    that exactly with a fori_loop
  * #13: background id = n_classes, no dedicated background logit

Deviation (robustness, documented): |sims| is clamped to [0, 1] before the
BCE logs. The reference's query-norm quirk can push |sims| to 1 + ~2e-5,
where torch's log(1-x) returns NaN and poisons training; the clamp only
engages in that pathological regime.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from . import boxes as box_ops
from . import matcher

_LOG_CLAMP = -100.0  # torch BCELoss clamps log terms at -100


def _bce(x: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    x = jnp.clip(x, 0.0, 1.0)
    log_x = jnp.maximum(jnp.log(x), _LOG_CLAMP)
    log_1mx = jnp.maximum(jnp.log1p(-x), _LOG_CLAMP)
    return -(target * log_x + (1.0 - target) * log_1mx)


def _focal_mod(loss: jnp.ndarray) -> jnp.ndarray:
    """The reference's modulation: (1 - e^{-l})^2 * l (losses.py:37-38)."""
    return jnp.square(1.0 - jnp.exp(-loss)) * loss


def _propagate_labels(
    pred_boxes: jnp.ndarray,
    target_classes: jnp.ndarray,
    n_classes: int,
    iou_threshold: float,
) -> jnp.ndarray:
    """Sequential IoU>thresh label propagation (losses.py:99-106), per image.

    One sweep over patches in index order; a patch relabeled earlier in the
    sweep propagates further (the reference iterates a tensor it mutates).
    """
    # inter > t*union form: same boolean as iou > t, no [P, P] divide
    hot = box_ops.pairwise_iou_above(pred_boxes, pred_boxes, iou_threshold)

    def body(j, tc):
        label = tc[j]
        take = (label != n_classes) & hot[j]
        return jnp.where(take, label, tc)

    # unroll: the body is a handful of VPU ops on [P]; at P=2304 the loop is
    # iteration-overhead-bound (~3.3 ms/step in the cached-tail trace).
    # Unrolling preserves the exact sequential order (quirk #7).
    return jax.lax.fori_loop(
        0, pred_boxes.shape[0], body, target_classes, unroll=8
    )


def push_pull_loss(
    pred_sims: jnp.ndarray,
    pred_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_mask: jnp.ndarray,
    n_classes: int,
    class_weights: Optional[jnp.ndarray] = None,
    *,
    iou_propagation_threshold: float = 0.85,
) -> dict:
    """Batched detection loss.

    Args:
      pred_sims    [B, P, C] raw query-bank similarities
      pred_boxes   [B, P, 4] xyxy in [0, 1]
      gt_labels    [B, G] int32 (padded)
      gt_boxes     [B, G, 4] xyxy normalized (padded)
      gt_mask      [B, G] bool validity of each GT slot
      n_classes    C; background id is C
      class_weights [C] or None — the log-frequency scales
        (reference dataset.py:88-98 / BCELoss(weight=...), losses.py:13)

    Returns dict(loss_ce, loss_bg, loss_bbox, loss_giou) of fp32 scalars.
    """
    B, P, C = pred_sims.shape
    pred_sims = pred_sims.astype(jnp.float32)
    pred_boxes = pred_boxes.astype(jnp.float32)

    # --- Matching (no grad: integer outputs) -------------------------------
    assigned, target_classes = jax.vmap(
        lambda s, b, l, g, m: matcher.match(s, b, l, g, m, n_classes)
    )(pred_sims, pred_boxes, gt_labels, gt_boxes, gt_mask)

    # --- Box losses over matched pairs -------------------------------------
    src_boxes = jnp.take_along_axis(pred_boxes, assigned[..., None], axis=1)  # [B,G,4]
    num_boxes = jnp.maximum(jnp.sum(gt_mask), 1).astype(jnp.float32)
    l1 = jnp.sum(jnp.abs(src_boxes - gt_boxes), axis=-1)  # [B, G]
    loss_bbox = jnp.sum(jnp.where(gt_mask, l1, 0.0)) / num_boxes
    giou = box_ops.elementwise_giou(src_boxes, gt_boxes)  # [B, G]
    loss_giou = jnp.sum(jnp.where(gt_mask, 1.0 - giou, 0.0)) / num_boxes

    # --- IoU label propagation (quirk #7) -----------------------------------
    target_classes = jax.vmap(
        lambda b, t: _propagate_labels(b, t, n_classes, iou_propagation_threshold)
    )(pred_boxes, target_classes)

    # --- Class losses (quirk #2: BCE on |sims|) -----------------------------
    x = jnp.abs(pred_sims)  # [B, P, C]
    fg = target_classes != n_classes  # [B, P]

    # (A shared-chain variant that derived the fg BCE from the bg chain plus
    # label-column gathers was A/B'd on chip in r3 and measured ~1% SLOWER —
    # the chain it removed was already fused into the reduce, and the gather
    # backward added a [B, P, C] scatter. BENCH.md r3; fork deleted in r5.)
    onehot = jax.nn.one_hot(target_classes, n_classes, dtype=jnp.float32)  # bg -> 0s

    bce_fg = _bce(x, onehot)
    bce_bg = _bce(x, jnp.zeros_like(x))
    if class_weights is not None:
        w = class_weights.astype(jnp.float32)
        bce_fg = bce_fg * w
        bce_bg = bce_bg * w

    per_patch_fg = jnp.sum(_focal_mod(bce_fg), axis=-1)  # [B, P]
    per_patch_bg = jnp.sum(_focal_mod(bce_bg), axis=-1)

    n_fg = jnp.maximum(jnp.sum(fg), 1).astype(jnp.float32)
    n_bg = jnp.maximum(jnp.sum(~fg), 1).astype(jnp.float32)
    loss_ce = jnp.sum(jnp.where(fg, per_patch_fg, 0.0)) / n_fg
    loss_bg = jnp.sum(jnp.where(~fg, per_patch_bg, 0.0)) / n_bg

    return {
        "loss_ce": loss_ce,
        "loss_bg": loss_bg,
        "loss_bbox": loss_bbox,
        "loss_giou": loss_giou,
    }


def total_loss(losses: dict) -> jnp.ndarray:
    """Unweighted sum, as the reference's driver does (main.py:84-89)."""
    return losses["loss_ce"] + losses["loss_bg"] + losses["loss_bbox"] + losses["loss_giou"]
