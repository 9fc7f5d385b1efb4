"""PushPull loss vs an independent numpy oracle of the reference semantics."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment

from owlvit_tpu.ops import losses
from tests.test_matcher import _oracle_cost, _rand_boxes


def _np_iou(a, b):
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None] - inter
    return inter / union, union


def _np_giou_diag(a, b):
    iou, union = _np_iou(a, b)
    lt = np.minimum(a[:, None, :2], b[None, :, :2])
    rb = np.maximum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    hull = wh[..., 0] * wh[..., 1]
    return np.diag(iou - (hull - union) / hull)


def oracle_loss(sims, boxes, labels, gt_boxes, n_classes, weights=None):
    """Single-image reference semantics, written independently in numpy:
    scipy matching on the DETR cost, dense targets with background id, box
    L1+GIoU over matched pairs, sequential IoU>0.85 propagation with
    chaining, focal-modulated BCE on |sims| split fg/bg."""
    P = boxes.shape[0]
    G = labels.shape[0]
    cost = _oracle_cost(sims, boxes, labels, gt_boxes)  # [P, G]
    ri, ci = linear_sum_assignment(cost)

    target = np.full((P,), n_classes, np.int64)
    target[ri] = labels[ci]

    src = boxes[ri]
    tgt = gt_boxes[ci]
    loss_bbox = np.abs(src - tgt).sum() / G
    loss_giou = (1 - _np_giou_diag(src, tgt)).sum() / G

    # sequential propagation over the mutating target array
    iou, _ = _np_iou(boxes, boxes)
    for j in range(P):
        if target[j] == n_classes:
            continue
        target[iou[j] > 0.85] = target[j]

    x = np.clip(np.abs(sims), 0, 1)
    fg = target != n_classes
    onehot = np.zeros((P, n_classes))
    onehot[fg, target[fg]] = 1.0
    log_x = np.maximum(np.log(np.maximum(x, 1e-300)), -100)
    log_1mx = np.maximum(np.log(np.maximum(1 - x, 1e-300)), -100)
    bce_fg = -(onehot * log_x + (1 - onehot) * log_1mx)
    bce_bg = -log_1mx
    if weights is not None:
        bce_fg = bce_fg * weights
        bce_bg = bce_bg * weights

    def mod(l):
        return (1 - np.exp(-l)) ** 2 * l

    loss_ce = mod(bce_fg[fg]).sum(-1).mean() if fg.any() else 0.0
    loss_bg = mod(bce_bg[~fg]).sum(-1).mean() if (~fg).any() else 0.0
    return dict(
        loss_ce=loss_ce, loss_bg=loss_bg, loss_bbox=loss_bbox, loss_giou=loss_giou
    )


def _make_case(rng, P=36, C=5, G=4, with_overlap=True):
    sims = rng.normal(scale=0.3, size=(P, C)).astype(np.float32)
    boxes = _rand_boxes(rng, P)
    if with_overlap:
        # force some >0.85 IoU clusters so propagation actually fires
        boxes[1] = boxes[0] + 0.002
        boxes[2] = boxes[0] - 0.001
        boxes[11] = boxes[10] * 0.999 + 0.0005
    gt_boxes = boxes[rng.choice(P, size=G, replace=False)] + rng.normal(
        scale=0.01, size=(G, 4)
    ).astype(np.float32)
    gt_boxes = np.abs(gt_boxes)
    gt_boxes[:, 2:] = np.maximum(gt_boxes[:, 2:], gt_boxes[:, :2] + 0.02)
    labels = rng.integers(0, C, size=(G,)).astype(np.int32)
    return sims, boxes, labels, gt_boxes


def test_loss_vs_oracle_single_image(rng):
    for trial in range(3):
        sims, boxes, labels, gt_boxes = _make_case(rng)
        C = 5
        weights = (1.0 + rng.uniform(0, 3, size=(C,))).astype(np.float32)

        ours = losses.push_pull_loss(
            jnp.asarray(sims)[None],
            jnp.asarray(boxes)[None],
            jnp.asarray(labels)[None],
            jnp.asarray(gt_boxes)[None],
            jnp.ones((1, len(labels)), bool),
            n_classes=C,
            class_weights=jnp.asarray(weights),
        )
        ref = oracle_loss(sims, boxes, labels, gt_boxes, C, weights)
        for k in ref:
            np.testing.assert_allclose(
                float(ours[k]), ref[k], rtol=1e-4, atol=1e-5, err_msg=k
            )


def test_loss_no_weights(rng):
    sims, boxes, labels, gt_boxes = _make_case(rng, with_overlap=False)
    C = 5
    ours = losses.push_pull_loss(
        jnp.asarray(sims)[None],
        jnp.asarray(boxes)[None],
        jnp.asarray(labels)[None],
        jnp.asarray(gt_boxes)[None],
        jnp.ones((1, len(labels)), bool),
        n_classes=C,
    )
    ref = oracle_loss(sims, boxes, labels, gt_boxes, C)
    for k in ref:
        np.testing.assert_allclose(float(ours[k]), ref[k], rtol=1e-4, atol=1e-5)


def test_loss_padding_invariance(rng):
    """Padded GT slots must not change any loss term."""
    sims, boxes, labels, gt_boxes = _make_case(rng)
    C = 5
    G = len(labels)
    pad = 4
    labels_p = np.concatenate([labels, np.zeros(pad, np.int32)])
    gt_p = np.concatenate([gt_boxes, _rand_boxes(rng, pad)], 0)
    mask_p = np.concatenate([np.ones(G, bool), np.zeros(pad, bool)])

    a = losses.push_pull_loss(
        jnp.asarray(sims)[None], jnp.asarray(boxes)[None],
        jnp.asarray(labels)[None], jnp.asarray(gt_boxes)[None],
        jnp.ones((1, G), bool), n_classes=C,
    )
    b = losses.push_pull_loss(
        jnp.asarray(sims)[None], jnp.asarray(boxes)[None],
        jnp.asarray(labels_p)[None], jnp.asarray(gt_p)[None],
        jnp.asarray(mask_p)[None], n_classes=C,
    )
    for k in a:
        np.testing.assert_allclose(float(a[k]), float(b[k]), rtol=1e-5, err_msg=k)


def test_loss_batched_pools_patches(rng):
    """Batch of two different images == reference semantics pooled over the
    batch (fg/bg means across all patches, box sums over all GT)."""
    c1 = _make_case(rng)
    c2 = _make_case(rng, G=4)
    C = 5
    sims = np.stack([c1[0], c2[0]])
    boxes = np.stack([c1[1], c2[1]])
    labels = np.stack([c1[2], c2[2]])
    gts = np.stack([c1[3], c2[3]])
    out = losses.push_pull_loss(
        jnp.asarray(sims), jnp.asarray(boxes), jnp.asarray(labels),
        jnp.asarray(gts), jnp.ones((2, 4), bool), n_classes=C,
    )
    r1 = oracle_loss(*c1, C)
    r2 = oracle_loss(*c2, C)
    # box terms: sum of sums / total boxes
    np.testing.assert_allclose(
        float(out["loss_bbox"]), (r1["loss_bbox"] * 4 + r2["loss_bbox"] * 4) / 8,
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        float(out["loss_giou"]), (r1["loss_giou"] * 4 + r2["loss_giou"] * 4) / 8,
        rtol=1e-4,
    )


def test_loss_grads_finite(rng):
    sims, boxes, labels, gt_boxes = _make_case(rng)
    C = 5

    def f(sims, boxes):
        l = losses.push_pull_loss(
            sims[None], boxes[None], jnp.asarray(labels)[None],
            jnp.asarray(gt_boxes)[None], jnp.ones((1, len(labels)), bool),
            n_classes=C,
        )
        return losses.total_loss(l)

    g_sims, g_boxes = jax.grad(f, argnums=(0, 1))(
        jnp.asarray(sims), jnp.asarray(boxes)
    )
    assert bool(jnp.isfinite(g_sims).all())
    assert bool(jnp.isfinite(g_boxes).all())
    assert bool(jnp.any(g_sims != 0)) and bool(jnp.any(g_boxes != 0))


def test_loss_jits(rng):
    sims, boxes, labels, gt_boxes = _make_case(rng)
    C = 5
    f = jax.jit(
        lambda s, b: losses.total_loss(
            losses.push_pull_loss(
                s[None], b[None], jnp.asarray(labels)[None],
                jnp.asarray(gt_boxes)[None], jnp.ones((1, len(labels)), bool),
                n_classes=C,
            )
        )
    )
    v = f(jnp.asarray(sims), jnp.asarray(boxes))
    assert bool(jnp.isfinite(v))
