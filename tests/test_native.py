"""C++ host kernels vs SciPy / the Python reference implementations."""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from owlvit_tpu import native


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if native.lib() is None:
        pytest.skip("native library unavailable (no g++?)")


def test_lsap_vs_scipy(rng):
    for shape in [(1, 1), (5, 9), (16, 16), (64, 576)]:
        cost = rng.normal(size=shape)
        ours = native.lsap(cost)
        ri, ci = linear_sum_assignment(cost)
        assert len(set(ours.tolist())) == shape[0]
        np.testing.assert_allclose(
            cost[np.arange(shape[0]), ours].sum(), cost[ri, ci].sum(), rtol=1e-9
        )


def test_lsap_rejects_tall():
    with pytest.raises(ValueError):
        native.lsap(np.zeros((4, 2)))


def test_nms_matches_device_nms(rng):
    import jax.numpy as jnp

    from owlvit_tpu.ops import nms as jnms

    pts = rng.uniform(0, 1, size=(50, 2, 2)).astype(np.float32)
    boxes = np.concatenate([pts.min(1), pts.max(1) + 0.05], -1)
    scores = rng.uniform(0, 1, size=(50,)).astype(np.float32)

    keep_c = native.nms(boxes, scores, 0.5, 50)
    keep_j, valid_j = jnms.nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 50)
    keep_j = np.asarray(keep_j)[np.asarray(valid_j)]
    np.testing.assert_array_equal(keep_c, keep_j)


def test_coco_match_equals_python(rng):
    """The native matcher must agree with map_metric's Python loop, which is
    covered by its own hand-value tests."""
    from owlvit_tpu.ops import map_metric as M

    D, G = 12, 6
    iou = rng.uniform(0, 1, size=(D, G))
    gt_ignore = np.array([0, 0, 0, 0, 1, 1], np.uint8)

    matched_c, ignored_c = native.coco_match(iou, gt_ignore, M.IOU_THRS)

    # python re-derivation (same loop as map_metric's fallback)
    T = len(M.IOU_THRS)
    matched_p = np.zeros((T, D), bool)
    ignored_p = np.zeros((T, D), bool)
    for ti, thr in enumerate(M.IOU_THRS):
        taken = np.zeros(G, bool)
        for d in range(D):
            best, best_g = min(thr, 1 - 1e-10), -1
            for g in range(G):
                if taken[g]:
                    continue
                if best_g > -1 and not gt_ignore[best_g] and gt_ignore[g]:
                    break
                if iou[d, g] < best:
                    continue
                best, best_g = iou[d, g], g
            if best_g == -1:
                continue
            taken[best_g] = True
            matched_p[ti, d] = True
            ignored_p[ti, d] = bool(gt_ignore[best_g])
    np.testing.assert_array_equal(matched_c, matched_p)
    np.testing.assert_array_equal(ignored_c, ignored_p)


def test_map_metric_uses_native_and_matches(rng):
    """mAP with the native fast path == mAP with the Python loop."""
    from owlvit_tpu.ops.map_metric import MeanAveragePrecision

    def run(use_native):
        import owlvit_tpu.native as nat

        saved_lib, saved_tried = nat._lib, nat._tried
        if not use_native:
            nat._lib, nat._tried = None, True
        try:
            m = MeanAveragePrecision(num_classes=3)
            r = np.random.default_rng(7)
            for _ in range(4):
                n_gt, n_det = 5, 12
                gt = r.uniform(0, 200, size=(n_gt, 2))
                gt = np.concatenate([gt, gt + r.uniform(10, 120, size=(n_gt, 2))], 1)
                det = gt[r.integers(0, n_gt, n_det)] + r.normal(0, 12, size=(n_det, 4))
                det[:, 2:] = np.maximum(det[:, 2:], det[:, :2] + 1)
                m.update(det, r.uniform(0, 1, n_det), r.integers(0, 3, n_det),
                         gt, r.integers(0, 3, n_gt))
            return m.compute()
        finally:
            nat._lib, nat._tried = saved_lib, saved_tried

    a = run(True)
    b = run(False)
    for k in ("map", "map_50", "map_75", "mar_100", "map_small", "map_large"):
        np.testing.assert_allclose(a[k], b[k], atol=1e-12, err_msg=k)
