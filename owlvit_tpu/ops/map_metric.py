"""Host-side COCO-style mean-average-precision (bbox), numpy.

Replaces the reference's torchmetrics `MeanAveragePrecision(iou_type="bbox",
class_metrics=True)` (/root/reference/main.py:31,144; update at
/root/reference/src/train_util.py:37-64). Protocol follows the COCO standard
that torchmetrics/pycocotools implement:

  * IoU thresholds 0.50:0.05:0.95 (10), AP at 101 recall points
  * area buckets: small < 32^2 <= medium < 96^2 <= large (absolute pixels^2)
  * max detections 1 / 10 / 100
  * greedy per-image-per-class matching in descending score order; each
    detection takes the still-unmatched GT with the highest IoU above the
    threshold; out-of-area GTs are ignore-matched, and unmatched detections
    outside the area range are ignored rather than counted as FP

Metric accumulation runs on host (this is an eval-epoch reduction, not a hot
op); boxes arrive in absolute pixel coordinates xyxy.
"""

from __future__ import annotations

import numpy as np

IOU_THRS = np.round(np.arange(0.5, 1.0, 0.05), 2)  # 10 thresholds
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RANGES = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0**2),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, 1e10),
}
MAX_DETS = (1, 10, 100)


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)))
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None] - inter
    return np.where(union > 0, inter / union, 0.0)


def _box_area(b: np.ndarray) -> np.ndarray:
    return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])


class MeanAveragePrecision:
    """Accumulate (preds, targets) per image; compute() -> metric dict.

    update() args per image:
      pred_boxes [D, 4] xyxy abs px, pred_scores [D], pred_labels [D] int
      gt_boxes [G, 4] xyxy abs px, gt_labels [G] int
    """

    def __init__(self, num_classes: int):
        self.num_classes = num_classes
        self.reset()

    def reset(self):
        self._images = []

    def update(self, pred_boxes, pred_scores, pred_labels, gt_boxes, gt_labels):
        self._images.append(
            (
                np.asarray(pred_boxes, np.float64).reshape(-1, 4),
                np.asarray(pred_scores, np.float64).reshape(-1),
                np.asarray(pred_labels, np.int64).reshape(-1),
                np.asarray(gt_boxes, np.float64).reshape(-1, 4),
                np.asarray(gt_labels, np.int64).reshape(-1),
            )
        )

    # -- core matching ------------------------------------------------------

    def _evaluate_image_class(self, img, cls, area_rng, max_det):
        """Returns (det_scores, det_matched, det_ignored, n_valid_gt) for one
        (image, class, area, maxDet) cell across all IoU thresholds."""
        pb, ps, pl, gb, gl = img
        dm = pl == cls
        gm = gl == cls
        det_boxes, det_scores = pb[dm], ps[dm]
        gt = gb[gm]

        order = np.argsort(-det_scores, kind="stable")[:max_det]
        det_boxes, det_scores = det_boxes[order], det_scores[order]

        g_area = _box_area(gt)
        # pycocotools bounds are inclusive on BOTH ends: ignore iff
        # area < lo or area > hi (an exactly-32^2 box counts in small AND
        # medium). Using >= hi here diverged at exact bucket boundaries.
        g_ignore = (g_area < area_rng[0]) | (g_area > area_rng[1])
        # sort GT: valid first (pycocotools processes ignores last)
        g_order = np.argsort(g_ignore, kind="stable")
        gt, g_ignore = gt[g_order], g_ignore[g_order]

        T = len(IOU_THRS)
        D, G = len(det_boxes), len(gt)
        iou = _iou_matrix(det_boxes, gt)

        if D and G:
            # C++ fast path (owlvit_tpu/native): same greedy matching.
            from owlvit_tpu import native

            nm = native.coco_match(iou, g_ignore, IOU_THRS)
            if nm is not None:
                matched, ignored = nm
                d_area = _box_area(det_boxes)
                d_out = (d_area < area_rng[0]) | (d_area > area_rng[1])
                ignored = ignored | (~matched & d_out[None, :])
                return det_scores, matched, ignored, int((~g_ignore).sum())

        matched = np.zeros((T, D), bool)
        ignored = np.zeros((T, D), bool)
        gt_taken = np.zeros((T, G), bool)

        for ti, thr in enumerate(IOU_THRS):
            for d in range(D):
                best, best_g = min(thr, 1 - 1e-10), -1
                for g in range(G):
                    if gt_taken[ti, g]:
                        continue
                    # once we hit ignored GTs, stop unless still unmatched:
                    if best_g > -1 and not g_ignore[best_g] and g_ignore[g]:
                        break
                    if iou[d, g] < best:
                        continue
                    best, best_g = iou[d, g], g
                if best_g == -1:
                    continue
                gt_taken[ti, best_g] = True
                matched[ti, d] = True
                ignored[ti, d] = g_ignore[best_g]

        # unmatched detections outside the area range are ignored
        d_area = _box_area(det_boxes)
        d_out = (d_area < area_rng[0]) | (d_area > area_rng[1])
        ignored = ignored | (~matched & d_out[None, :])

        n_valid_gt = int((~g_ignore).sum())
        return det_scores, matched, ignored, n_valid_gt

    def _accumulate(self):
        """-> precision [T, R, K, A, M], recall [T, K, A, M] (-1 = no GT)."""
        T, R = len(IOU_THRS), len(REC_THRS)
        K, A, M = self.num_classes, len(AREA_RANGES), len(MAX_DETS)
        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))

        for k in range(K):
            for a, rng in enumerate(AREA_RANGES.values()):
                for m, max_det in enumerate(MAX_DETS):
                    scores, matches, ignores, n_gt = [], [], [], 0
                    for img in self._images:
                        s, mt, ig, ng = self._evaluate_image_class(
                            img, k, rng, max_det
                        )
                        scores.append(s)
                        matches.append(mt)
                        ignores.append(ig)
                        n_gt += ng
                    if n_gt == 0:
                        continue
                    scores = np.concatenate(scores)
                    matches = np.concatenate(matches, axis=1)  # [T, D_total]
                    ignores = np.concatenate(ignores, axis=1)
                    order = np.argsort(-scores, kind="mergesort")
                    matches, ignores = matches[:, order], ignores[:, order]

                    keep = ~ignores
                    for ti in range(T):
                        mt = matches[ti][keep[ti]]
                        tp = np.cumsum(mt)
                        fp = np.cumsum(~mt)
                        rc = tp / n_gt
                        pr = tp / np.maximum(tp + fp, 1e-12)
                        recall[ti, k, a, m] = rc[-1] if len(rc) else 0.0
                        # monotone non-increasing precision envelope
                        for i in range(len(pr) - 1, 0, -1):
                            pr[i - 1] = max(pr[i - 1], pr[i])
                        idx = np.searchsorted(rc, REC_THRS, side="left")
                        q = np.zeros(R)
                        ok = idx < len(pr)
                        q[ok] = pr[idx[ok]]
                        precision[ti, :, k, a, m] = q
        return precision, recall

    def compute(self) -> dict:
        precision, recall = self._accumulate()

        def _mean(x):
            x = x[x > -1]
            return float(x.mean()) if x.size else -1.0

        a_all = list(AREA_RANGES).index("all")
        m100 = MAX_DETS.index(100)
        t50 = int(np.argwhere(IOU_THRS == 0.5)[0, 0])
        t75 = int(np.argwhere(IOU_THRS == 0.75)[0, 0])

        out = {
            "map": _mean(precision[:, :, :, a_all, m100]),
            "map_50": _mean(precision[t50, :, :, a_all, m100]),
            "map_75": _mean(precision[t75, :, :, a_all, m100]),
            "mar_1": _mean(recall[:, :, a_all, 0]),
            "mar_10": _mean(recall[:, :, a_all, 1]),
            "mar_100": _mean(recall[:, :, a_all, m100]),
        }
        for name in ("small", "medium", "large"):
            ai = list(AREA_RANGES).index(name)
            out[f"map_{name}"] = _mean(precision[:, :, :, ai, m100])
            out[f"mar_{name}"] = _mean(recall[:, :, ai, m100])

        out["map_per_class"] = np.array(
            [_mean(precision[:, :, k, a_all, m100]) for k in range(self.num_classes)]
        )
        out["mar_100_per_class"] = np.array(
            [_mean(recall[:, k, a_all, m100]) for k in range(self.num_classes)]
        )
        return out
