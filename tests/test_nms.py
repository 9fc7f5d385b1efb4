"""NMS / postprocess behavior on hand-constructed cases."""

import jax.numpy as jnp
import numpy as np

from owlvit_tpu.ops import nms


def test_nms_suppresses_overlaps():
    boxes = jnp.asarray(
        [
            [0.0, 0.0, 1.0, 1.0],
            [0.05, 0.0, 1.05, 1.0],  # IoU ~0.90 with box 0
            [2.0, 2.0, 3.0, 3.0],  # disjoint
        ]
    )
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep, valid = nms.nms(boxes, scores, iou_threshold=0.5, max_outputs=3)
    keep, valid = np.asarray(keep), np.asarray(valid)
    assert keep[valid].tolist() == [0, 2]


def test_nms_keeps_below_threshold_overlap():
    boxes = jnp.asarray([[0.0, 0.0, 1.0, 1.0], [0.5, 0.0, 1.5, 1.0]])  # IoU=1/3
    scores = jnp.asarray([0.9, 0.8])
    keep, valid = nms.nms(boxes, scores, iou_threshold=0.5, max_outputs=2)
    assert np.asarray(keep)[np.asarray(valid)].tolist() == [0, 1]


def test_nms_strictly_greater():
    # torchvision suppresses only IoU strictly > threshold
    boxes = jnp.asarray([[0.0, 0.0, 1.0, 1.0], [0.5, 0.0, 1.5, 1.0]])  # IoU=1/3
    scores = jnp.asarray([0.9, 0.8])
    keep, valid = nms.nms(boxes, scores, iou_threshold=1 / 3, max_outputs=2)
    assert np.asarray(valid).sum() == 2


def test_batched_nms_is_classwise():
    boxes = jnp.asarray([[0.0, 0.0, 1.0, 1.0], [0.01, 0.0, 1.01, 1.0]])
    scores = jnp.asarray([0.9, 0.8])
    # same class: suppressed
    keep, valid = nms.batched_nms(
        boxes, scores, jnp.asarray([0, 0]), iou_threshold=0.5, max_outputs=2
    )
    assert np.asarray(valid).sum() == 1
    # different classes: both kept
    keep, valid = nms.batched_nms(
        boxes, scores, jnp.asarray([0, 1]), iou_threshold=0.5, max_outputs=2
    )
    assert np.asarray(valid).sum() == 2


def test_postprocess_protocol(rng):
    B, P, C = 2, 16, 4
    sims = rng.uniform(0, 0.5, size=(B, P, C)).astype(np.float32)
    sims[0, 3, 2] = 0.9  # a clear detection
    boxes = rng.uniform(0.1, 0.4, size=(B, P, 4)).astype(np.float32)
    boxes[..., 2:] += 0.5  # valid xyxy
    out = nms.postprocess(
        jnp.asarray(boxes),
        jnp.asarray(sims),
        confidence_threshold=0.01,
        iou_threshold=0.6,
        top_k=8,
    )
    assert out["boxes"].shape == (B, 8, 4)
    scores0 = np.asarray(out["scores"][0])
    valid0 = np.asarray(out["valid"][0])
    # descending order among valid
    s = scores0[valid0]
    assert (np.diff(s) <= 1e-6).all()
    # the forced detection is rank 0 with class 2
    assert np.asarray(out["classes"])[0, 0] == 2
    assert abs(s[0] - 0.9) < 1e-5


def test_postprocess_confidence_filter():
    B, P, C = 1, 4, 2
    sims = np.full((B, P, C), 0.005, np.float32)  # all below threshold
    boxes = np.tile(np.asarray([[0.1, 0.1, 0.5, 0.5]], np.float32), (B, P, 1))
    out = nms.postprocess(
        jnp.asarray(boxes), jnp.asarray(sims), confidence_threshold=0.01,
        iou_threshold=0.6, top_k=4,
    )
    assert np.asarray(out["valid"]).sum() == 0


def test_fixpoint_equals_scan_nms():
    """nms_fixpoint must produce exactly the scan nms() results (same greedy
    semantics; it exists as a measured-slower-on-TPU alternative)."""
    import numpy as np

    from owlvit_tpu.ops.nms import nms, nms_fixpoint

    rng = np.random.default_rng(0)
    for trial in range(10):
        n = int(rng.integers(5, 60))
        b = np.sort(rng.random((n, 2, 2)), axis=1).reshape(n, 4) * 100
        s = np.round(rng.random(n), 1)  # ties
        s[rng.random(n) < 0.2] = -np.inf
        ia, va = nms(jnp.asarray(b), jnp.asarray(s), 0.5, 16)
        ib, vb = nms_fixpoint(jnp.asarray(b), jnp.asarray(s), 0.5, 16)
        np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
