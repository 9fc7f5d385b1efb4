"""COCO-style mAP on hand-computable cases (no pycocotools/torchmetrics here)."""

import numpy as np

from owlvit_tpu.ops.map_metric import MeanAveragePrecision


def _box(x0, y0, x1, y1):
    return [x0, y0, x1, y1]


def test_perfect_predictions():
    m = MeanAveragePrecision(num_classes=2)
    gt = np.array([_box(0, 0, 50, 50), _box(100, 100, 180, 190)])
    gl = np.array([0, 1])
    m.update(gt, np.array([0.9, 0.8]), gl, gt, gl)
    out = m.compute()
    assert out["map"] == 1.0
    assert out["map_50"] == 1.0
    assert out["mar_100"] == 1.0
    np.testing.assert_array_equal(out["map_per_class"], [1.0, 1.0])


def test_no_predictions():
    m = MeanAveragePrecision(num_classes=1)
    gt = np.array([_box(0, 0, 50, 50)])
    m.update(np.zeros((0, 4)), np.zeros(0), np.zeros(0), gt, np.array([0]))
    out = m.compute()
    assert out["map"] == 0.0
    assert out["mar_100"] == 0.0


def test_no_gt_class_excluded_from_mean():
    m = MeanAveragePrecision(num_classes=2)
    gt = np.array([_box(0, 0, 50, 50)])
    m.update(gt, np.array([0.9]), np.array([0]), gt, np.array([0]))
    out = m.compute()
    # class 1 has no GT anywhere -> -1, excluded; map over class 0 only
    assert out["map"] == 1.0
    assert out["map_per_class"][1] == -1.0


def test_half_iou_counts_only_low_thresholds():
    """Det overlaps GT with IoU ~0.5 -> matches only at the 0.50 threshold."""
    m = MeanAveragePrecision(num_classes=1)
    gt = np.array([_box(0, 0, 100, 100)])
    # shifted box: IoU = (100-33)/ (2*100*100/(100) ...) compute: overlap 67x100,
    # union 2*10000-6700=13300, iou = 6700/13300 = 0.5038
    pred = np.array([_box(33, 0, 133, 100)])
    m.update(pred, np.array([0.9]), np.array([0]), gt, np.array([0]))
    out = m.compute()
    # matches at IoU thr 0.50 only -> AP = 1 at 1 of 10 thresholds
    np.testing.assert_allclose(out["map"], 0.1, atol=1e-6)
    np.testing.assert_allclose(out["map_50"], 1.0)
    np.testing.assert_allclose(out["map_75"], 0.0)


def test_fp_before_tp_ap():
    """One FP ranked above one TP: precision at recall>0 is 0.5 -> AP ~ 0.5."""
    m = MeanAveragePrecision(num_classes=1)
    gt = np.array([_box(0, 0, 100, 100)])
    preds = np.array([_box(300, 300, 400, 400), _box(0, 0, 100, 100)])
    m.update(preds, np.array([0.9, 0.8]), np.array([0, 0]), gt, np.array([0]))
    out = m.compute()
    # 101-pt: p=0.5 for recall in [0,1] (envelope) -> AP = 0.5
    np.testing.assert_allclose(out["map_50"], 0.5, atol=1e-6)


def test_duplicate_detections_are_fps():
    """Second detection of an already-matched GT is a FP (greedy matching)."""
    m = MeanAveragePrecision(num_classes=1)
    gt = np.array([_box(0, 0, 100, 100)])
    preds = np.array([_box(0, 0, 100, 100), _box(1, 1, 101, 101)])
    m.update(preds, np.array([0.9, 0.8]), np.array([0, 0]), gt, np.array([0]))
    out = m.compute()
    # TP first -> precision envelope at all recalls is 1.0 -> AP 1.0 at thr .5
    np.testing.assert_allclose(out["map_50"], 1.0)


def test_area_buckets():
    m = MeanAveragePrecision(num_classes=1)
    small = np.array([_box(0, 0, 10, 10)])  # 100 px^2 < 32^2
    large = np.array([_box(0, 0, 200, 200)])  # > 96^2
    m.update(small, np.array([0.9]), np.array([0]), small, np.array([0]))
    m.update(large, np.array([0.9]), np.array([0]), large, np.array([0]))
    out = m.compute()
    assert out["map_small"] == 1.0
    assert out["map_large"] == 1.0
    assert out["map_medium"] == -1.0  # no medium GT anywhere


def test_max_dets_limits_recall():
    m = MeanAveragePrecision(num_classes=1)
    # 3 GTs, 3 perfect dets -> mar_1 should be 1/3
    gt = np.array([_box(0, 0, 50, 50), _box(60, 0, 110, 50), _box(0, 60, 50, 110)])
    gl = np.array([0, 0, 0])
    m.update(gt, np.array([0.9, 0.8, 0.7]), gl, gt, gl)
    out = m.compute()
    np.testing.assert_allclose(out["mar_1"], 1 / 3, atol=1e-6)
    np.testing.assert_allclose(out["mar_100"], 1.0)


def test_scores_rank_across_images():
    """Score sorting must be global across images (cross-image ranking)."""
    m = MeanAveragePrecision(num_classes=1)
    gt1 = np.array([_box(0, 0, 100, 100)])
    # image 1: a high-scoring FP
    m.update(
        np.array([_box(300, 300, 400, 400)]), np.array([0.95]), np.array([0]),
        gt1, np.array([0]),
    )
    # image 2: a lower-scoring TP
    gt2 = np.array([_box(0, 0, 100, 100)])
    m.update(gt2, np.array([0.5]), np.array([0]), gt2, np.array([0]))
    out = m.compute()
    # order: FP(0.95), TP(0.5) -> precision 0.5 up to recall 0.5, then 0.
    # 101-pt interpolation: 51 of 101 recall points (0.00..0.50) at p=0.5.
    np.testing.assert_allclose(out["map_50"], 51 / 101 * 0.5, atol=1e-6)


def test_reset():
    m = MeanAveragePrecision(num_classes=1)
    gt = np.array([_box(0, 0, 100, 100)])
    m.update(gt, np.array([0.9]), np.array([0]), gt, np.array([0]))
    m.reset()
    out = m.compute()
    assert out["map"] == -1.0  # nothing accumulated
