"""Hungarian solver vs SciPy; DETR cost/match vs a numpy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from owlvit_tpu.ops import matcher


def total_cost(cost, col4row):
    return float(cost[np.arange(cost.shape[0]), col4row].sum())


@pytest.mark.parametrize(
    "shape",
    [(1, 1), (1, 7), (4, 4), (5, 9), (16, 16), (20, 576), (64, 576)],
)
def test_hungarian_vs_scipy(rng, shape):
    for trial in range(5):
        cost = rng.normal(size=shape).astype(np.float32)
        ours = np.asarray(matcher.hungarian(jnp.asarray(cost)))
        ri, ci = linear_sum_assignment(cost)
        assert len(set(ours.tolist())) == shape[0], "assignment must be injective"
        np.testing.assert_allclose(
            total_cost(cost, ours), cost[ri, ci].sum(), rtol=1e-5, atol=1e-5
        )


def test_hungarian_row_mask_solves_submatrix(rng):
    """Masked rows are skipped (col4row -1); the valid rows' assignment is
    exactly the solve of the valid-row submatrix (r3 padded-GT skip)."""
    for trial in range(5):
        cost = rng.normal(size=(12, 30)).astype(np.float32)
        mask = rng.uniform(size=12) < 0.5
        if not mask.any():
            mask[0] = True
        ours = np.asarray(
            matcher.hungarian(jnp.asarray(cost), row_mask=jnp.asarray(mask))
        )
        assert (ours[~mask] == -1).all(), "masked rows must stay unassigned"
        sub = cost[mask]
        ri, ci = linear_sum_assignment(sub)
        valid = ours[mask]
        assert len(set(valid.tolist())) == mask.sum(), "injective on valid rows"
        np.testing.assert_allclose(
            sub[np.arange(len(valid)), valid].sum(), sub[ri, ci].sum(),
            rtol=1e-5, atol=1e-5,
        )


def test_hungarian_row_mask_batched(rng):
    """vmapped masked solve (the production shape: per-image gt_mask)."""
    B, G, P = 4, 8, 40
    costs = rng.normal(size=(B, G, P)).astype(np.float32)
    n_valid = np.array([2, 5, 8, 1])
    masks = np.arange(G)[None, :] < n_valid[:, None]
    outs = np.asarray(
        jax.vmap(matcher.hungarian)(jnp.asarray(costs), jnp.asarray(masks))
    )
    for b in range(B):
        sub = costs[b][masks[b]]
        ri, ci = linear_sum_assignment(sub)
        valid = outs[b][masks[b]]
        assert (outs[b][~masks[b]] == -1).all()
        np.testing.assert_allclose(
            sub[np.arange(len(valid)), valid].sum(), sub[ri, ci].sum(),
            rtol=1e-5, atol=1e-5,
        )


def test_hungarian_integer_ties(rng):
    # Ties: many equal entries — total cost must still be optimal.
    for trial in range(5):
        cost = rng.integers(0, 4, size=(8, 12)).astype(np.float32)
        ours = np.asarray(matcher.hungarian(jnp.asarray(cost)))
        ri, ci = linear_sum_assignment(cost)
        assert len(set(ours.tolist())) == 8
        np.testing.assert_allclose(total_cost(cost, ours), cost[ri, ci].sum())


def test_hungarian_constant_padding_rows_do_not_perturb(rng):
    """Padded GT rows (constant cost) must not change real rows' matches."""
    real = rng.normal(size=(6, 20)).astype(np.float32)
    padded = np.concatenate([real, np.zeros((4, 20), np.float32)], axis=0)
    ri, ci = linear_sum_assignment(real)
    ours = np.asarray(matcher.hungarian(jnp.asarray(padded)))[:6]
    np.testing.assert_allclose(total_cost(real, ours), real[ri, ci].sum(), rtol=1e-5)


def test_hungarian_jit_and_vmap(rng):
    costs = rng.normal(size=(3, 5, 11)).astype(np.float32)
    f = jax.jit(jax.vmap(matcher.hungarian))
    outs = np.asarray(f(jnp.asarray(costs)))
    for b in range(3):
        ri, ci = linear_sum_assignment(costs[b])
        np.testing.assert_allclose(
            total_cost(costs[b], outs[b]), costs[b][ri, ci].sum(), rtol=1e-5
        )


@pytest.mark.parametrize(
    "shape", [(4, 17), (8, 100), (16, 576), (3, 9)]
)
def test_hungarian_pruned_vs_scipy(rng, shape):
    """Top-R column pruning is EXACT (optimal total cost), incl. at shapes
    where R*R >= C falls through to the full solver ((3, 9))."""
    for trial in range(5):
        cost = rng.normal(size=shape).astype(np.float32)
        ours = np.asarray(matcher.hungarian_pruned(jnp.asarray(cost)))
        ri, ci = linear_sum_assignment(cost)
        assert len(set(ours.tolist())) == shape[0], "injective"
        np.testing.assert_allclose(
            total_cost(cost, ours), cost[ri, ci].sum(), rtol=1e-5, atol=1e-5
        )


def test_hungarian_pruned_duplicate_heavy_ties(rng):
    """Many identical entries make the per-row top-R unions overlap heavily
    (the duplicate-disable path) — the optimum must survive."""
    for trial in range(5):
        cost = rng.integers(0, 3, size=(6, 50)).astype(np.float32)
        ours = np.asarray(matcher.hungarian_pruned(jnp.asarray(cost)))
        ri, ci = linear_sum_assignment(cost)
        assert len(set(ours.tolist())) == 6
        np.testing.assert_allclose(total_cost(cost, ours), cost[ri, ci].sum())


def test_hungarian_pruned_row_mask(rng):
    for trial in range(5):
        cost = rng.normal(size=(10, 120)).astype(np.float32)
        mask = rng.uniform(size=10) < 0.5
        if not mask.any():
            mask[0] = True
        ours = np.asarray(
            matcher.hungarian_pruned(jnp.asarray(cost), row_mask=jnp.asarray(mask))
        )
        assert (ours[~mask] == -1).all()
        sub = cost[mask]
        ri, ci = linear_sum_assignment(sub)
        valid = ours[mask]
        assert len(set(valid.tolist())) == mask.sum()
        np.testing.assert_allclose(
            sub[np.arange(len(valid)), valid].sum(), sub[ri, ci].sum(),
            rtol=1e-5, atol=1e-5,
        )


def test_hungarian_pruned_jit_vmap(rng):
    costs = rng.normal(size=(4, 8, 64)).astype(np.float32)
    f = jax.jit(jax.vmap(matcher.hungarian_pruned))
    outs = np.asarray(f(jnp.asarray(costs)))
    for b in range(4):
        ri, ci = linear_sum_assignment(costs[b])
        np.testing.assert_allclose(
            total_cost(costs[b], outs[b]), costs[b][ri, ci].sum(), rtol=1e-5
        )


def test_match_prune_env_toggle(rng, monkeypatch):
    """OWLVIT_MATCH_PRUNE=1 routes match() through the pruned solver and
    produces an equal-cost assignment."""
    P, C, G_max, n_valid = 36, 5, 8, 5
    sims = rng.normal(size=(P, C)).astype(np.float32)
    pred_boxes = _rand_boxes(rng, P)
    gt_boxes = _rand_boxes(rng, G_max)
    gt_labels = rng.integers(0, C, size=(G_max,)).astype(np.int32)
    gt_mask = np.arange(G_max) < n_valid
    args = (jnp.asarray(sims), jnp.asarray(pred_boxes), jnp.asarray(gt_labels),
            jnp.asarray(gt_boxes), jnp.asarray(gt_mask))
    a0, t0 = matcher.match(*args, n_classes=C)
    monkeypatch.setenv("OWLVIT_MATCH_PRUNE", "1")
    a1, t1 = matcher.match(*args, n_classes=C)
    cost = _oracle_cost(sims, pred_boxes, gt_labels[:n_valid], gt_boxes[:n_valid])
    c0 = cost[np.asarray(a0)[:n_valid], np.arange(n_valid)].sum()
    c1 = cost[np.asarray(a1)[:n_valid], np.arange(n_valid)].sum()
    np.testing.assert_allclose(c0, c1, rtol=1e-5)


def _oracle_cost(sims, boxes, labels, gt_boxes):
    """Numpy re-derivation of the reference cost (matcher.py:106-131)."""
    e = np.exp(sims - sims.max(-1, keepdims=True))
    prob = e / e.sum(-1, keepdims=True)
    c_class = -prob[:, labels]  # [P, G]
    c_bbox = np.abs(boxes[:, None] - gt_boxes[None]).sum(-1)

    def area(b):
        return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])

    lt = np.maximum(boxes[:, None, :2], gt_boxes[None, :, :2])
    rb = np.minimum(boxes[:, None, 2:], gt_boxes[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area(boxes)[:, None] + area(gt_boxes)[None] - inter
    iou = inter / union
    lt_h = np.minimum(boxes[:, None, :2], gt_boxes[None, :, :2])
    rb_h = np.maximum(boxes[:, None, 2:], gt_boxes[None, :, 2:])
    wh_h = np.clip(rb_h - lt_h, 0, None)
    hull = wh_h[..., 0] * wh_h[..., 1]
    giou = iou - (hull - union) / hull
    return c_class + c_bbox - giou  # [P, G]


def _rand_boxes(rng, n):
    pts = rng.uniform(0.05, 0.95, size=(n, 2, 2))
    lo, hi = pts.min(1), pts.max(1) + 0.02
    return np.concatenate([lo, hi], -1).astype(np.float32)


def test_match_end_to_end(rng):
    P, C, G_max, n_valid = 36, 5, 8, 5
    sims = rng.normal(size=(P, C)).astype(np.float32)
    pred_boxes = _rand_boxes(rng, P)
    gt_boxes = _rand_boxes(rng, G_max)
    gt_labels = rng.integers(0, C, size=(G_max,)).astype(np.int32)
    gt_mask = np.arange(G_max) < n_valid

    assigned, target_classes = matcher.match(
        jnp.asarray(sims),
        jnp.asarray(pred_boxes),
        jnp.asarray(gt_labels),
        jnp.asarray(gt_boxes),
        jnp.asarray(gt_mask),
        n_classes=C,
    )
    assigned, target_classes = np.asarray(assigned), np.asarray(target_classes)

    # Oracle: scipy on the [P, G_valid] cost
    cost = _oracle_cost(sims, pred_boxes, gt_labels[:n_valid], gt_boxes[:n_valid])
    ri, ci = linear_sum_assignment(cost)  # ri: patch idx, ci: gt idx
    ref_cost = cost[ri, ci].sum()
    ours_cost = cost[assigned[:n_valid], np.arange(n_valid)].sum()
    np.testing.assert_allclose(ours_cost, ref_cost, rtol=1e-4)

    # target_classes: background everywhere except matched patches
    ref_targets = np.full((P,), C, np.int32)
    ref_targets[assigned[:n_valid]] = gt_labels[:n_valid]
    np.testing.assert_array_equal(target_classes, ref_targets)
    assert (target_classes == C).sum() == P - n_valid


def test_match_zero_valid_gt(rng):
    P, C, G_max = 16, 3, 4
    sims = rng.normal(size=(P, C)).astype(np.float32)
    pred_boxes = _rand_boxes(rng, P)
    gt_boxes = _rand_boxes(rng, G_max)
    gt_labels = np.zeros((G_max,), np.int32)
    gt_mask = np.zeros((G_max,), bool)

    _, target_classes = matcher.match(
        jnp.asarray(sims),
        jnp.asarray(pred_boxes),
        jnp.asarray(gt_labels),
        jnp.asarray(gt_boxes),
        jnp.asarray(gt_mask),
        n_classes=C,
    )
    assert (np.asarray(target_classes) == C).all()


def test_hungarian_pruned_recipe_shape(rng):
    """Exactness at the real detection shape (G=16 rows, P=2304 patch
    columns — the shape OWLVIT_MATCH_PRUNE targets on chip)."""
    cost = rng.normal(size=(16, 2304)).astype(np.float32)
    ours = np.asarray(matcher.hungarian_pruned(jnp.asarray(cost)))
    ri, ci = linear_sum_assignment(cost)
    assert len(set(ours.tolist())) == 16
    np.testing.assert_allclose(
        total_cost(cost, ours), cost[ri, ci].sum(), rtol=1e-5, atol=1e-5
    )
