"""Differential tests against the reference's LITERAL loss/matcher code.

The oracle here IS /root/reference/src/{matcher,losses}.py, imported
unchanged via reference_bridge (torchvision's box_area shimmed). This is the
strongest offline parity evidence available: a shared misreading of the
reference in the re-derived numpy/scipy oracles cannot pass these.

Covered semantics (reference file:line):
  * cost composition -softmax + L1 + -GIoU        matcher.py:106-131
  * scipy assignment optimum + dense targets      matcher.py:132-158
  * loss_bbox / loss_giou over matched pairs      losses.py:42-69
  * IoU>0.85 sequential label propagation with
    chaining (mutated-tensor loop)                losses.py:99-106
  * BCE(|sims|) + focal modulation, class weights losses.py:16-40
  * background id = n_classes                     losses.py:14
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from owlvit_tpu.ops import losses as our_losses  # noqa: E402
from owlvit_tpu.ops import matcher as our_matcher  # noqa: E402

from reference_bridge import load_reference  # noqa: E402

REF_MATCHER, REF_LOSSES, _ = load_reference()

# fp32 both sides; reductions are reassociated (torch subsets/means vs our
# masked sums), so tolerances are a few fp32 ulps of the summed magnitudes.
RTOL, ATOL = 5e-5, 1e-6


# --------------------------------------------------------------------------
# Generators
# --------------------------------------------------------------------------


def _rand_boxes(rng: np.random.Generator, n: int) -> np.ndarray:
    """Valid, non-degenerate xyxy boxes in [0, 1]."""
    xy = rng.uniform(0.05, 0.55, size=(n, 2))
    wh = rng.uniform(0.03, 0.4, size=(n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def _clustered_boxes(rng: np.random.Generator, n: int) -> np.ndarray:
    """Boxes in tight jitter clusters so many pairs exceed IoU 0.85 —
    exercises the propagation sweep (losses.py:99-106) on random data."""
    n_base = max(2, n // 4)
    base = _rand_boxes(rng, n_base)
    idx = rng.integers(0, n_base, size=n)
    jitter = rng.uniform(-0.004, 0.004, size=(n, 4)).astype(np.float32)
    out = base[idx] + jitter
    return np.clip(out, 0.0, 1.0).astype(np.float32)


def _trial(rng, P, G, C, clustered=False):
    sims = rng.uniform(-0.95, 0.95, size=(P, C)).astype(np.float32)
    pred = _clustered_boxes(rng, P) if clustered else _rand_boxes(rng, P)
    gt = _rand_boxes(rng, G)
    labels = rng.integers(0, C, size=(G,)).astype(np.int32)
    return sims, pred, gt, labels


# --------------------------------------------------------------------------
# Reference / ours runners
# --------------------------------------------------------------------------


def _ref_match(sims, pred, gt, labels, C):
    matcher = REF_MATCHER.HungarianMatcher(C)
    outputs = {
        "pred_logits": torch.from_numpy(sims)[None],
        "pred_boxes": torch.from_numpy(pred)[None],
    }
    targets = [
        {"labels": torch.from_numpy(labels).long(), "boxes": torch.from_numpy(gt)}
    ]
    target_classes, indices, _ = matcher(outputs, targets)
    # per-GT assigned patch: indices[0] = (patch_idx, gt_idx)
    patch_i, gt_j = indices[0]
    assigned = np.full((gt.shape[0],), -1, np.int64)
    assigned[gt_j.numpy()] = patch_i.numpy()
    return assigned, target_classes[0].numpy()


def _ref_loss(sims, pred, gt, labels, C, scales=None):
    crit = REF_LOSSES.PushPullLoss(
        C, None if scales is None else torch.from_numpy(scales)
    )
    out = crit(
        torch.from_numpy(sims)[None],
        torch.from_numpy(labels).long()[None],
        torch.from_numpy(pred)[None],
        torch.from_numpy(gt)[None],
    )
    return {k: float(v) for k, v in out.items()}


def _our_loss(sims, pred, gt, labels, C, scales=None, pad_to=None):
    G = gt.shape[0]
    Gp = pad_to or G
    gt_p = np.zeros((Gp, 4), np.float32)
    gt_p[:G] = gt
    # pad slots get valid-but-ignored geometry (degenerate zeros are fine for
    # the masked loss, but keep them tiny boxes to mimic the real loader)
    gt_p[G:] = np.array([0.0, 0.0, 1e-3, 1e-3], np.float32)
    labels_p = np.zeros((Gp,), np.int32)
    labels_p[:G] = labels
    mask = np.zeros((Gp,), bool)
    mask[:G] = True
    out = our_losses.push_pull_loss(
        jnp.asarray(sims)[None],
        jnp.asarray(pred)[None],
        jnp.asarray(labels_p)[None],
        jnp.asarray(gt_p)[None],
        jnp.asarray(mask)[None],
        C,
        class_weights=None if scales is None else jnp.asarray(scales),
    )
    return {k: float(v) for k, v in out.items()}


def _assert_losses_close(ours: dict, ref: dict):
    for k in ("loss_ce", "loss_bg", "loss_bbox", "loss_giou"):
        np.testing.assert_allclose(
            ours[k], ref[k], rtol=RTOL, atol=ATOL, err_msg=k
        )


# --------------------------------------------------------------------------
# Matcher differentials
# --------------------------------------------------------------------------


@pytest.mark.parametrize("seed,P,G,C", [
    (0, 24, 1, 5), (1, 24, 4, 6), (2, 24, 8, 3), (3, 60, 16, 11),
    (4, 24, 24, 4),  # G == P (square assignment)
    (5, 576, 12, 20),  # recipe-like patch count
])
def test_matcher_cost_and_assignment(seed, P, G, C):
    rng = np.random.default_rng(seed)
    sims, pred, gt, labels = _trial(rng, P, G, C)

    # cost matrix: reference builds [P, G]; ours is the [G, P] transpose
    outputs = {
        "pred_logits": torch.from_numpy(sims)[None],
        "pred_boxes": torch.from_numpy(pred)[None],
    }
    out_prob = outputs["pred_logits"].flatten(0, 1).softmax(-1)
    ref_cost = (
        -out_prob[:, torch.from_numpy(labels).long()]
        + torch.cdist(torch.from_numpy(pred), torch.from_numpy(gt), p=1)
        - REF_MATCHER.generalized_box_iou(
            torch.from_numpy(pred), torch.from_numpy(gt)
        )
    ).numpy()
    ours_cost = np.asarray(
        our_matcher.cost_matrix(
            jnp.asarray(sims), jnp.asarray(pred), jnp.asarray(labels),
            jnp.asarray(gt), jnp.ones((G,), bool),
        )
    )
    np.testing.assert_allclose(ours_cost, ref_cost.T, rtol=2e-5, atol=2e-6)

    ref_assigned, ref_targets = _ref_match(sims, pred, gt, labels, C)
    assigned, targets = our_matcher.match(
        jnp.asarray(sims), jnp.asarray(pred), jnp.asarray(labels),
        jnp.asarray(gt), jnp.ones((G,), bool), C,
    )
    assigned = np.asarray(assigned)

    # optimal total cost must agree exactly-up-to-fp; for generic random
    # costs the optimum is unique, so the assignment itself must too
    ref_total = ref_cost.T[np.arange(G), ref_assigned].sum()
    our_total = ours_cost[np.arange(G), assigned].sum()
    np.testing.assert_allclose(our_total, ref_total, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(assigned, ref_assigned)
    np.testing.assert_array_equal(np.asarray(targets), ref_targets)


def test_matcher_dense_targets_background_id():
    """Unmatched patches get id C (quirk #13), matched get their label."""
    rng = np.random.default_rng(7)
    sims, pred, gt, labels = _trial(rng, 30, 5, 4)
    _, ref_targets = _ref_match(sims, pred, gt, labels, 4)
    assert (ref_targets == 4).sum() == 25  # exactly P - G background
    _, targets = our_matcher.match(
        jnp.asarray(sims), jnp.asarray(pred), jnp.asarray(labels),
        jnp.asarray(gt), jnp.ones((5,), bool), 4,
    )
    np.testing.assert_array_equal(np.asarray(targets), ref_targets)


# --------------------------------------------------------------------------
# Loss differentials — randomized trials
# --------------------------------------------------------------------------


@pytest.mark.parametrize("seed,P,G,C,clustered", [
    (0, 24, 1, 5, False),
    (1, 24, 4, 6, False),
    (2, 40, 8, 3, True),   # clustered → propagation fires
    (3, 60, 16, 11, True),
    (4, 24, 6, 4, True),
    (5, 576, 12, 20, True),  # recipe-like patch count
])
def test_loss_differential_random(seed, P, G, C, clustered):
    rng = np.random.default_rng(seed + 100)
    sims, pred, gt, labels = _trial(rng, P, G, C, clustered=clustered)
    ref = _ref_loss(sims, pred, gt, labels, C)
    _assert_losses_close(_our_loss(sims, pred, gt, labels, C), ref)
    # padding GT to a larger fixed shape must not change any term
    _assert_losses_close(
        _our_loss(sims, pred, gt, labels, C, pad_to=G + 9), ref
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_loss_differential_class_weights(seed):
    """BCELoss(weight=scales): weights multiply the BCE *before* the focal
    modulation (losses.py:13,34-38) — distinct weights make any divergence
    in that order visible."""
    rng = np.random.default_rng(seed + 300)
    P, G, C = 40, 6, 7
    sims, pred, gt, labels = _trial(rng, P, G, C, clustered=True)
    scales = rng.uniform(0.5, 4.0, size=(C,)).astype(np.float32)
    ref = _ref_loss(sims, pred, gt, labels, C, scales=scales)
    _assert_losses_close(_our_loss(sims, pred, gt, labels, C, scales=scales), ref)


# --------------------------------------------------------------------------
# Loss differentials — constructed propagation cases
# --------------------------------------------------------------------------


def _boxes_at(slots: dict[int, np.ndarray], P: int) -> np.ndarray:
    """P far-apart boxes, with specific slots overridden."""
    pred = np.zeros((P, 4), np.float32)
    for i in range(P):
        # a row of small disjoint boxes along y=0.9
        x = 0.01 + 0.03 * i
        pred[i] = [x, 0.9, x + 0.02, 0.95]
    for i, b in slots.items():
        pred[i] = b
    return pred


def _chain_case(order: str):
    """GT matched at one patch; two more patches chained by IoU>0.85.

    ascending:  match at 5 → propagates to 9 at j=5 → 9 propagates to 14 at
                j=9 (chaining WITHIN one sweep — the reference's loop reads
                the tensor it mutates).
    descending: overlap chain 9→5→2 with the match at 9: j=5 runs while 5 is
                still background, so patch 2 must NOT be labeled.
    """
    a = np.array([0.10, 0.10, 0.50, 0.50], np.float32)
    b = a + np.array([0.004, 0.0, 0.004, 0.0], np.float32)   # IoU(a,b) ≈ 0.98
    c = b + np.array([0.004, 0.0, 0.004, 0.0], np.float32)   # IoU(b,c) ≈ 0.98
    far = np.array([0.6, 0.6, 0.9, 0.9], np.float32)
    # make IoU(a, c) still > 0.85 is wrong for the chain test — push c so
    # IoU(a,c) < 0.85 but IoU(b,c) > 0.85: shift c further from a
    c = a + np.array([0.036, 0.0, 0.036, 0.0], np.float32)
    b = a + np.array([0.018, 0.0, 0.018, 0.0], np.float32)
    # IoU(a,b) = (0.4-0.018)/(0.4+0.018) ≈ 0.914; IoU(b,c) ≈ 0.914;
    # IoU(a,c) = (0.4-0.036)/(0.4+0.036) ≈ 0.835 < 0.85
    if order == "ascending":
        slots = {5: a, 9: b, 14: c, 20: far}
        gt = a[None].copy()
    else:
        slots = {9: a, 5: b, 2: c, 20: far}
        gt = a[None].copy()
    pred = _boxes_at(slots, 24)
    return pred, gt


@pytest.mark.parametrize("order", ["ascending", "descending"])
def test_loss_propagation_chaining(order):
    """The sequential sweep's order-dependence must match the reference's
    mutating python loop exactly (losses.py:99-106)."""
    rng = np.random.default_rng(11)
    P, C = 24, 5
    pred, gt = _chain_case(order)
    sims = rng.uniform(-0.9, 0.9, size=(P, C)).astype(np.float32)
    labels = np.array([2], np.int32)
    # distinct per-class weights make any label difference change loss_ce
    scales = np.linspace(0.5, 3.0, C).astype(np.float32)
    ref = _ref_loss(sims, pred, gt, labels, C, scales=scales)
    _assert_losses_close(_our_loss(sims, pred, gt, labels, C, scales=scales), ref)

    # sanity: the two orders genuinely produce different propagation — the
    # ascending chain labels one more patch than the descending one
    other = _chain_case("descending" if order == "ascending" else "ascending")
    ref_other = _ref_loss(sims, other[0], other[1], labels, C, scales=scales)
    assert ref["loss_ce"] != ref_other["loss_ce"]


@pytest.mark.parametrize("delta", [-1e-3, +1e-3])
def test_loss_propagation_near_threshold(delta):
    """IoU strictly-greater-than 0.85 on both sides of the threshold.

    (Exactly AT the threshold the formulations may disagree by an ulp —
    reference divides, ours compares inter > t*union — so the probes sit
    1e-3 away, far above fp32 noise.)
    """
    rng = np.random.default_rng(13)
    P, C = 16, 4
    a = np.array([0.10, 0.10, 0.50, 0.50], np.float32)
    # two boxes [0,w]x[h] shifted by dx: IoU = (w-dx)/(w+dx); solve for t
    w = 0.4
    t = 0.85 + delta
    dx = w * (1 - t) / (1 + t)
    b = a + np.array([dx, 0.0, dx, 0.0], np.float32)
    pred = _boxes_at({3: a, 8: b}, P)
    gt = a[None].copy()
    labels = np.array([1], np.int32)
    sims = rng.uniform(-0.9, 0.9, size=(P, C)).astype(np.float32)
    scales = np.linspace(0.5, 3.0, C).astype(np.float32)
    ref = _ref_loss(sims, pred, gt, labels, C, scales=scales)
    _assert_losses_close(_our_loss(sims, pred, gt, labels, C, scales=scales), ref)


def test_loss_propagation_overwrites_matched_label():
    """A matched patch inside another match's IoU>0.85 halo is overwritten
    (the reference loop does not skip matched patches)."""
    rng = np.random.default_rng(17)
    P, C = 24, 5
    a = np.array([0.10, 0.10, 0.50, 0.50], np.float32)
    b = a + np.array([0.01, 0.0, 0.01, 0.0], np.float32)  # IoU ≈ 0.95
    pred = _boxes_at({4: a, 7: b}, P)
    gt = np.stack([a, b])  # two GTs match patches 4 and 7
    labels = np.array([1, 3], np.int32)
    sims = rng.uniform(-0.9, 0.9, size=(P, C)).astype(np.float32)
    scales = np.linspace(0.5, 3.0, C).astype(np.float32)
    ref = _ref_loss(sims, pred, gt, labels, C, scales=scales)
    _assert_losses_close(_our_loss(sims, pred, gt, labels, C, scales=scales), ref)
