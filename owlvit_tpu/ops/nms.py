"""Fixed-shape, jit-compatible NMS and detection post-processing.

Replaces torchvision's CUDA `batched_nms` in the reference eval path
(/root/reference/src/models.py:122-146) and the top-200 cap
(/root/reference/main.py:115-118) with a greedy suppression loop expressed as
`lax.scan` over a static number of output slots — the TPU-friendly shape: all
tensors fixed-size, validity carried as a mask.

Class-aware NMS uses the coordinate-offset trick (boxes shifted per class so
cross-class pairs never overlap), exactly equivalent to torchvision's
`batched_nms`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import boxes as box_ops

_NEG_INF = jnp.float32(-jnp.inf)


def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_outputs: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS on one image. boxes [N, 4] xyxy, scores [N] (-inf = dead).

    Returns (keep_idx [max_outputs] int32, keep_valid [max_outputs] bool),
    emitted in descending score order (torchvision order). Suppression uses
    IoU strictly greater than the threshold, matching torchvision.

    Implementation: top_k-length sequential argmax+suppress lax.scan. An
    exact parallel fixpoint (nms_fixpoint) was built as the presumed-faster
    replacement and MEASURED SLOWER on TPU v5e (batch-32 postprocess:
    7.6 vs 9.2 ms at 576 boxes, 11.1 vs 23.5 ms at 2304 — the per-iteration
    [N, N] masked reduction outgrows 200 cheap argmax steps), so the scan
    stays the default; see tools/tpu_nms_ab.py.
    """
    # only the boolean predicate is consumed — the per-plane form avoids
    # materializing [..., N, N, 2] lt/rb broadcasts (a trailing size-2 dim
    # gets 16x tile padding on TPU; the r3 L/14 OOM class — CLAUDE.md) and
    # skips the [N, N] divide. Boundary-ulp caveat in its docstring.
    above = box_ops.pairwise_iou_above(boxes, boxes, iou_threshold)  # [N, N]

    def step(live_scores, _):
        j = jnp.argmax(live_scores)
        best = live_scores[j]
        valid = best > _NEG_INF
        suppress = above[j] | (jnp.arange(boxes.shape[0]) == j)
        live_scores = jnp.where(valid & suppress, _NEG_INF, live_scores)
        return live_scores, (jnp.where(valid, j, -1).astype(jnp.int32), valid)

    _, (keep_idx, keep_valid) = jax.lax.scan(
        step, scores.astype(jnp.float32), None, length=max_outputs
    )
    return keep_idx, keep_valid


def nms_fixpoint(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_outputs: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """EXACT greedy NMS via the parallel fixpoint
      keep_i <- valid_i and no higher-scored kept j suppresses i
    iterated to convergence (suppression-chain depth of [N, N] VPU passes).
    Same results as nms() (tested); slower than the scan on TPU v5e at
    detection sizes (see nms() docstring), kept for cores/backends where
    sequential scans dominate.
    """
    N = boxes.shape[0]
    # per-plane predicate (see nms(): avoids the [N, N, 2] broadcast class)
    above = box_ops.pairwise_iou_above(boxes, boxes, iou_threshold)  # [N, N]

    scores = scores.astype(jnp.float32)
    order = jnp.argsort(-scores, stable=True)  # ties -> lower index first
    valid = scores[order] > _NEG_INF
    above_s = above[order][:, order]
    tri = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0) < (
        jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    )  # j (row) strictly before i (col) in score order
    sup = above_s & tri & valid[:, None] & valid[None, :]

    def cond(state):
        _, changed, it = state
        return changed & (it < N)

    def body(state):
        keep, _, it = state
        new = valid & ~jnp.any(sup & keep[:, None], axis=0)
        return new, jnp.any(new != keep), it + 1

    keep, _, _ = jax.lax.while_loop(cond, body, (valid, jnp.bool_(True), 0))

    # Emit kept boxes (already score-descending) into max_outputs slots.
    rank = jnp.cumsum(keep) - 1
    slots = jnp.where(keep, rank, max_outputs)  # dead -> OOB, dropped
    keep_idx = (
        jnp.full((max_outputs,), -1, jnp.int32)
        .at[slots]
        .set(order.astype(jnp.int32), mode="drop")
    )
    return keep_idx, keep_idx >= 0


def batched_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    iou_threshold: float,
    max_outputs: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Class-aware NMS (torchvision batched_nms semantics), one image."""
    # Offset each class into its own disjoint coordinate range.
    span = jnp.max(boxes) - jnp.min(boxes) + 1.0
    offset = classes.astype(jnp.float32) * span
    shifted = boxes + offset[:, None]
    return nms(shifted, scores, iou_threshold, max_outputs)


def postprocess(
    pred_boxes: jnp.ndarray,
    pred_sims: jnp.ndarray,
    *,
    confidence_threshold: float = 0.01,
    iou_threshold: float = 0.6,
    top_k: int = 200,
) -> dict:
    """Batched detection decoding (reference PostProcess + top-200 cap).

    pred_boxes [B, P, 4] xyxy, pred_sims [B, P, C] ->
      dict(boxes [B, K, 4], classes [B, K], scores [B, K], valid [B, K]).

    Per image: per-patch max over classes, confidence filter, class-aware
    NMS — emitted score-descending, so the first K survivors ARE the top-K
    (the reference's separate topk, main.py:116-118).
    """
    scores = jnp.max(pred_sims, axis=-1)  # [B, P]
    classes = jnp.argmax(pred_sims, axis=-1).astype(jnp.int32)
    scores = jnp.where(scores > confidence_threshold, scores, _NEG_INF)

    def per_image(b, s, c):
        keep_idx, keep_valid = batched_nms(b, s, c, iou_threshold, top_k)
        idx = jnp.clip(keep_idx, 0)
        return {
            "boxes": b[idx] * keep_valid[:, None],
            "classes": jnp.where(keep_valid, c[idx], -1),
            "scores": jnp.where(keep_valid, s[idx], 0.0),
            "valid": keep_valid,
        }

    return jax.vmap(per_image)(pred_boxes.astype(jnp.float32), scores, classes)


def pack_detections(out: dict) -> jnp.ndarray:
    """postprocess() output -> ONE [B, K, 7] f32 tensor
    (xyxy boxes, score, class id, 0/1 valid flag).

    THE wire/pack format for detections everywhere a batch crosses
    device->host: serving (`serve._serve`/`_serve_zs`, reshaped flat to
    [B, K*7] — one fetch per batch, one relay RPC), in-training eval and
    the deployment-parity export path (`trainer._postprocess_pack`).
    Class ids (<= C << 2^24) and the valid flag are exact in f32. Keep a
    single implementation: a field added or reordered here is the ONLY
    place the layout can change, and every _unpack site reads K*7."""
    return jnp.concatenate([
        out["boxes"],
        out["scores"][..., None],
        out["classes"].astype(jnp.float32)[..., None],
        out["valid"].astype(jnp.float32)[..., None],
    ], axis=-1)
