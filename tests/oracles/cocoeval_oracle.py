"""Independent mAP oracle: a faithful port of pycocotools COCOeval (bbox).

This is the DIFFERENTIAL ORACLE for owlvit_tpu.ops.map_metric — a second,
deliberately separate implementation of the COCO evaluation protocol, written
in pycocotools' own structure (per-image dict records, evaluateImg, the
[T,R,K,A,M] accumulate) rather than the package's vectorized style. The two
share no code; any protocol divergence shows up as a numeric mismatch in the
randomized differential tests (tests/test_map_oracle.py).

Port of the published algorithm in pycocotools/cocoeval.py (COCOeval with
iouType='bbox', no crowd regions, no explicit ignore flags — matching what
the reference's torchmetrics update ever feeds it, /root/reference/
src/train_util.py:37-64). Semantics preserved exactly:

  * dt sorted by -score (mergesort), truncated to maxDets AFTER sorting
  * gt sorted ignores-last; ignore iff area < aRng[0] or area > aRng[1]
    (inclusive on both ends)
  * greedy match loop: best-so-far >= threshold, ties to the LATER gt,
    break when reaching ignored gts while already matched to a valid one
  * unmatched dts with area outside the range are ignored, not FPs
  * accumulate: global mergesort by -score, tp/(tp+fp+eps) precision,
    right-to-left monotone envelope, searchsorted(left) onto 101 recall
    points; cells with zero valid gt stay -1
"""

from __future__ import annotations

import numpy as np


class Params:
    def __init__(self):
        self.iouThrs = np.linspace(0.5, 0.95, 10)
        self.recThrs = np.linspace(0.0, 1.0, 101)
        self.maxDets = [1, 10, 100]
        self.areaRng = [
            [0.0, 1e5**2],
            [0.0, 32**2],
            [32**2, 96**2],
            [96**2, 1e5**2],
        ]
        self.areaRngLbl = ["all", "small", "medium", "large"]


def _bbox_iou(d, g):
    """IoU between det boxes d [D,4] and gt boxes g [G,4], xyxy, no crowd."""
    ious = np.zeros((len(d), len(g)))
    for di, db in enumerate(d):
        dx1, dy1, dx2, dy2 = db
        darea = (dx2 - dx1) * (dy2 - dy1)
        for gi, gb in enumerate(g):
            gx1, gy1, gx2, gy2 = gb
            garea = (gx2 - gx1) * (gy2 - gy1)
            iw = min(dx2, gx2) - max(dx1, gx1)
            ih = min(dy2, gy2) - max(dy1, gy1)
            if iw <= 0 or ih <= 0:
                continue
            inter = iw * ih
            union = darea + garea - inter
            if union > 0:
                ious[di, gi] = inter / union
    return ious


class COCOevalOracle:
    """evaluate() over per-image dict records, then accumulate() -> stats."""

    def __init__(self, num_classes: int):
        self.params = Params()
        self.catIds = list(range(num_classes))
        self._gts = {}  # (imgId, catId) -> [ {bbox, area}, ... ]
        self._dts = {}
        self.imgIds = []

    def add_image(self, img_id, pred_boxes, pred_scores, pred_labels,
                  gt_boxes, gt_labels):
        self.imgIds.append(img_id)
        pred_boxes = np.asarray(pred_boxes, np.float64).reshape(-1, 4)
        pred_scores = np.asarray(pred_scores, np.float64).reshape(-1)
        pred_labels = np.asarray(pred_labels, np.int64).reshape(-1)
        gt_boxes = np.asarray(gt_boxes, np.float64).reshape(-1, 4)
        gt_labels = np.asarray(gt_labels, np.int64).reshape(-1)
        for cat in self.catIds:
            self._gts[img_id, cat] = [
                {
                    "bbox": b,
                    "area": (b[2] - b[0]) * (b[3] - b[1]),
                }
                for b, l in zip(gt_boxes, gt_labels)
                if l == cat
            ]
            self._dts[img_id, cat] = [
                {
                    "bbox": b,
                    "score": s,
                    "area": (b[2] - b[0]) * (b[3] - b[1]),
                }
                for b, s, l in zip(pred_boxes, pred_scores, pred_labels)
                if l == cat
            ]

    # -- pycocotools.COCOeval.evaluateImg ---------------------------------
    def evaluate_img(self, img_id, cat_id, aRng, maxDet):
        p = self.params
        gt = self._gts[img_id, cat_id]
        dt = self._dts[img_id, cat_id]
        if len(gt) == 0 and len(dt) == 0:
            return None

        for g in gt:
            g["_ignore"] = 1 if (g["area"] < aRng[0] or g["area"] > aRng[1]) else 0

        gtind = np.argsort([g["_ignore"] for g in gt], kind="mergesort")
        gt = [gt[i] for i in gtind]
        dtind = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in dtind[0:maxDet]]

        ious = _bbox_iou(
            np.array([d["bbox"] for d in dt]).reshape(-1, 4),
            np.array([g["bbox"] for g in gt]).reshape(-1, 4),
        )

        T = len(p.iouThrs)
        G = len(gt)
        D = len(dt)
        gtm = np.zeros((T, G))
        dtm = np.zeros((T, D))
        gtIg = np.array([g["_ignore"] for g in gt])
        dtIg = np.zeros((T, D))
        if len(ious):
            for tind, t in enumerate(p.iouThrs):
                for dind, d in enumerate(dt):
                    iou = min([t, 1 - 1e-10])
                    m = -1
                    for gind, g in enumerate(gt):
                        # gt already matched (no crowd here)
                        if gtm[tind, gind] > 0:
                            continue
                        # dt matched to a regular gt, now on ignores: stop
                        if m > -1 and gtIg[m] == 0 and gtIg[gind] == 1:
                            break
                        if ious[dind, gind] < iou:
                            continue
                        iou = ious[dind, gind]
                        m = gind
                    if m == -1:
                        continue
                    dtIg[tind, dind] = gtIg[m]
                    dtm[tind, dind] = 1
                    gtm[tind, m] = 1
        # set unmatched outside-area detections to ignore
        a = np.array(
            [d["area"] < aRng[0] or d["area"] > aRng[1] for d in dt]
        ).reshape((1, len(dt)))
        dtIg = np.logical_or(dtIg, np.logical_and(dtm == 0, np.repeat(a, T, 0)))
        return {
            "dtMatches": dtm,
            "dtScores": [d["score"] for d in dt],
            "gtIgnore": gtIg,
            "dtIgnore": dtIg,
        }

    # -- pycocotools.COCOeval.accumulate ----------------------------------
    def accumulate(self):
        p = self.params
        T = len(p.iouThrs)
        R = len(p.recThrs)
        K = len(self.catIds)
        A = len(p.areaRng)
        M = len(p.maxDets)
        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))

        for k, cat in enumerate(self.catIds):
            for a, aRng in enumerate(p.areaRng):
                for m, maxDet in enumerate(p.maxDets):
                    E = [
                        self.evaluate_img(img_id, cat, aRng, maxDet)
                        for img_id in self.imgIds
                    ]
                    E = [e for e in E if e is not None]
                    if len(E) == 0:
                        continue
                    dtScores = np.concatenate([e["dtScores"] for e in E])
                    inds = np.argsort(-dtScores, kind="mergesort")

                    dtm = np.concatenate(
                        [e["dtMatches"] for e in E], axis=1
                    )[:, inds]
                    dtIg = np.concatenate(
                        [e["dtIgnore"] for e in E], axis=1
                    )[:, inds]
                    gtIg = np.concatenate([e["gtIgnore"] for e in E])
                    npig = np.count_nonzero(gtIg == 0)
                    if npig == 0:
                        continue
                    tps = np.logical_and(dtm, np.logical_not(dtIg))
                    fps = np.logical_and(
                        np.logical_not(dtm), np.logical_not(dtIg)
                    )
                    tp_sum = np.cumsum(tps, axis=1).astype(dtype=np.float64)
                    fp_sum = np.cumsum(fps, axis=1).astype(dtype=np.float64)
                    for t, (tp, fp) in enumerate(zip(tp_sum, fp_sum)):
                        nd = len(tp)
                        rc = tp / npig
                        pr = tp / (fp + tp + np.spacing(1))
                        q = np.zeros((R,))
                        if nd:
                            recall[t, k, a, m] = rc[-1]
                        else:
                            recall[t, k, a, m] = 0
                        pr = pr.tolist()
                        for i in range(nd - 1, 0, -1):
                            if pr[i] > pr[i - 1]:
                                pr[i - 1] = pr[i]
                        inds_r = np.searchsorted(rc, p.recThrs, side="left")
                        try:
                            for ri, pi in enumerate(inds_r):
                                q[ri] = pr[pi]
                        except IndexError:
                            pass
                        precision[t, :, k, a, m] = np.array(q)
        self.eval = {"precision": precision, "recall": recall}
        return self.eval

    # -- pycocotools.COCOeval.summarize (subset used by the reference) ----
    def summarize(self) -> dict:
        p = self.params
        precision = self.eval["precision"]
        recall = self.eval["recall"]

        def _mean(x):
            x = x[x > -1]
            return float(np.mean(x)) if x.size else -1.0

        def ap(iouThr=None, areaRng="all", maxDets=100):
            aind = p.areaRngLbl.index(areaRng)
            mind = p.maxDets.index(maxDets)
            s = precision[:, :, :, aind, mind]
            if iouThr is not None:
                t = np.where(np.isclose(p.iouThrs, iouThr))[0]
                s = s[t]
            return _mean(s)

        def ar(areaRng="all", maxDets=100):
            aind = p.areaRngLbl.index(areaRng)
            mind = p.maxDets.index(maxDets)
            return _mean(recall[:, :, aind, mind])

        aind_all = p.areaRngLbl.index("all")
        mind_100 = p.maxDets.index(100)
        out = {
            "map": ap(),
            "map_50": ap(iouThr=0.5),
            "map_75": ap(iouThr=0.75),
            "map_small": ap(areaRng="small"),
            "map_medium": ap(areaRng="medium"),
            "map_large": ap(areaRng="large"),
            "mar_1": ar(maxDets=1),
            "mar_10": ar(maxDets=10),
            "mar_100": ar(maxDets=100),
            "mar_small": ar(areaRng="small"),
            "mar_medium": ar(areaRng="medium"),
            "mar_large": ar(areaRng="large"),
            "map_per_class": np.array(
                [
                    _mean(precision[:, :, k, aind_all, mind_100])
                    for k in range(len(self.catIds))
                ]
            ),
            "mar_100_per_class": np.array(
                [
                    _mean(recall[:, k, aind_all, mind_100])
                    for k in range(len(self.catIds))
                ]
            ),
        }
        return out


def oracle_map(num_classes, images) -> dict:
    """images: iterable of (pred_boxes, pred_scores, pred_labels, gt_boxes,
    gt_labels) tuples. Returns the summarize() dict."""
    ev = COCOevalOracle(num_classes)
    for i, img in enumerate(images):
        ev.add_image(i, *img)
    ev.accumulate()
    return ev.summarize()
