"""Jit-compatible Hungarian matching (DETR-style) — no host round-trip.

The reference ships the cost matrix to the CPU every step and calls SciPy's C
solver (/root/reference/src/matcher.py:132-137). Here the assignment problem
is solved ON DEVICE with a Jonker–Volgenant shortest-augmenting-path solver
expressed in lax control flow, so the whole train step stays inside one XLA
program. Cost matrices are tiny ([max_gt, num_patches] = [~64, 576]), so the
sequential scan is negligible next to the ViT forward/backward.

Cost semantics match the reference (matcher.py:106-131):
    cost = 1 * (-softmax(sims)[*, label])  +  1 * L1(boxes)  +  1 * (-GIoU)

Variable ground-truth counts are handled with fixed-shape padding: invalid GT
rows are SKIPPED outright (lax.cond around each row's augmenting search, so
a padded row costs one predicate instead of a full sequential Dijkstra —
skipping a row is exactly solving the valid-row submatrix, since JV's duals
and matching evolve only from processed rows). COCO images average ~7 boxes
against a max_gt of 64 slots, so this removes ~90% of the solver's
sequential work at the reference recipe shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import boxes as box_ops

_INF = jnp.float32(jnp.inf)


def hungarian(cost: jnp.ndarray, row_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Solve min-cost assignment for cost [R, C] with R <= C.

    Returns col4row [R] int32: the column assigned to each row. Matches
    scipy.optimize.linear_sum_assignment's optimum (total cost; the
    assignment itself may differ under ties).

    row_mask [R] bool: rows marked False are skipped (their col4row stays
    -1). Skipping == solving the valid-row submatrix: every JV state
    mutation (duals, matching) happens inside one row's augmenting search,
    so an unprocessed row leaves the solve of the others untouched. The
    skip is implemented by seeding both while_loops with done=True and
    masking the state commits — NOT with lax.cond, so it survives vmap
    (a vmapped cond degenerates to select and would run both branches):
    under the batched matcher, a row that is padding in EVERY image of the
    batch contributes zero sequential iterations to the lockstep
    while_loop. COCO averages ~7 boxes against max_gt=64 slots, so this
    removes most of the solver's sequential depth at the recipe shape.

    Jonker–Volgenant shortest augmenting path with potentials, one Dijkstra
    per row; each Dijkstra step is a vectorized scan over all columns.
    """
    R, C = cost.shape
    if R > C:
        raise ValueError(f"hungarian requires rows <= cols, got {cost.shape}")
    cost = cost.astype(jnp.float32)
    if row_mask is None:
        row_mask = jnp.ones((R,), bool)

    def assign_row(carry, inp):
        u, v, row4col, col4row = carry
        cur_row, valid = inp

        # --- Dijkstra from cur_row to the nearest unassigned column -------
        def dij_cond(s):
            _, _, _, _, _, _, _, done = s
            return ~done

        def dij_body(s):
            shortest, pred_row, visited, row_visited, i, min_val, sink, _ = s
            row_visited = row_visited.at[i].set(True)
            d = min_val + cost[i] - u[i] - v
            upd = (~visited) & (d < shortest)
            shortest = jnp.where(upd, d, shortest)
            pred_row = jnp.where(upd, i, pred_row)
            masked = jnp.where(visited, _INF, shortest)
            j = jnp.argmin(masked)
            min_val = masked[j]
            visited = visited.at[j].set(True)
            nxt = row4col[j]
            done = nxt < 0
            sink = jnp.where(done, j, sink)
            i = jnp.where(done, i, nxt)
            return (shortest, pred_row, visited, row_visited, i, min_val, sink, done)

        init = (
            jnp.full((C,), _INF),
            jnp.full((C,), cur_row, jnp.int32),
            jnp.zeros((C,), bool),
            jnp.zeros((R,), bool),
            cur_row,
            jnp.float32(0.0),
            jnp.int32(0),
            jnp.array(False),
        )
        # do-while seed, then force done for skipped rows so the loop runs
        # ZERO iterations for them (in the vmapped solver the loop advances
        # while ANY lane is live — an all-padding row costs nothing)
        seed = dij_body(init)
        seed = seed[:-1] + (seed[-1] | ~valid,)
        shortest, pred_row, visited, row_visited, _, min_val, sink, _ = (
            jax.lax.while_loop(dij_cond, dij_body, seed)
        )

        # --- Dual potential updates (masked to no-ops for skipped rows) ----
        u = u.at[cur_row].add(jnp.where(valid, min_val, 0.0))
        row_delta = min_val - shortest[jnp.clip(col4row, 0)]
        other_rows = valid & row_visited & (jnp.arange(R) != cur_row)
        u = jnp.where(other_rows, u + row_delta, u)
        v = jnp.where(valid & visited, v - (min_val - shortest), v)

        # --- Augment along the alternating path back from the sink --------
        def aug_cond(s):
            _, _, _, done = s
            return ~done

        def aug_body(s):
            row4col, col4row, j, _ = s
            i = pred_row[j]
            row4col = row4col.at[j].set(i)
            j_next = col4row[i]
            col4row = col4row.at[i].set(j)
            return (row4col, col4row, j_next, i == cur_row)

        row4col, col4row, _, _ = jax.lax.while_loop(
            aug_cond, aug_body, (row4col, col4row, sink, ~valid)
        )
        return (u, v, row4col, col4row), None

    init_carry = (
        jnp.zeros((R,), jnp.float32),
        jnp.zeros((C,), jnp.float32),
        jnp.full((C,), -1, jnp.int32),
        jnp.full((R,), -1, jnp.int32),
    )
    (_, _, _, col4row), _ = jax.lax.scan(
        assign_row, init_carry,
        (jnp.arange(R, dtype=jnp.int32), row_mask),
    )
    return col4row


_BIG = jnp.float32(1e9)


def hungarian_pruned(cost: jnp.ndarray, row_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Exact assignment via column pruning: solve on each row's R smallest
    columns instead of all C.

    Exchange argument for exactness: in any optimal assignment, if row i
    held a column c outside its R smallest, the other <= R-1 assigned rows
    can occupy at most R-1 of row i's R cheaper-or-equal columns, so one is
    free — moving row i there does not increase the total. Each such move
    fixes one row without touching the others, so repeating terminates with
    an optimal assignment inside the union of per-row top-R columns
    (<= R*R of them). The same bound holds a fortiori when only a subset of
    rows is valid (row_mask): fewer rows occupy fewer columns.

    Duplicate columns in the union would let two rows take the same original
    column through different copies — an invalid matching — so duplicates
    are disabled with a big finite cost (each row still sees >= R distinct
    finite columns: its own top-R). Returns col4row [R] in ORIGINAL column
    indices (-1 for masked rows), optimal-cost-equal to `hungarian` (the
    assignment itself may differ under ties, as with scipy).

    Why: the JV solver's sequential Dijkstra scans all C columns per
    iteration; at the detection shapes C = num_patches (2304 at B/16) dwarfs
    R = max_gt, so shrinking the scan width R*R/C-fold cuts the per-iteration
    VPU work without touching the sequential structure.
    """
    R, C = cost.shape
    if R * R >= C:  # nothing to prune at this shape
        return hungarian(cost, row_mask)
    cost = cost.astype(jnp.float32)
    _, top_idx = jax.lax.top_k(-cost, R)  # [R, R] per-row smallest columns
    cols = jnp.sort(top_idx.reshape(-1))  # [R*R] ascending original indices
    dup = jnp.concatenate(
        [jnp.zeros((1,), bool), cols[1:] == cols[:-1]]
    )  # keep the first copy of each column
    sub = jnp.take(cost, cols, axis=1)  # [R, R*R]
    sub = jnp.where(dup[None, :], _BIG, sub)
    sub_col4row = hungarian(sub, row_mask)
    return jnp.where(
        sub_col4row >= 0, cols[jnp.clip(sub_col4row, 0)], jnp.int32(-1)
    ).astype(jnp.int32)


def cost_matrix(
    pred_sims: jnp.ndarray,
    pred_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_mask: jnp.ndarray,
    *,
    w_class: float = 1.0,
    w_bbox: float = 1.0,
    w_giou: float = 1.0,
) -> jnp.ndarray:
    """DETR matching cost, per image. Returns [G, P] (rows = GT, transposed
    relative to the reference's [P, G] — the solver wants rows <= cols).

    pred_sims [P, C] raw similarities; pred_boxes [P, 4] xyxy; gt_labels [G];
    gt_boxes [G, 4] xyxy; gt_mask [G] bool. Invalid rows are zeroed.
    """
    # softmax[p, l] = exp(x - lse(x)); gathering the G needed columns first
    # avoids materializing (and exp-ing) the full [P, C] probability tensor
    x = pred_sims.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(x, axis=-1, keepdims=True)  # [P, 1]
    c_class = -jnp.exp(x[:, gt_labels] - lse).T  # [G, P]
    c_bbox = jnp.sum(
        jnp.abs(gt_boxes[:, None, :] - pred_boxes[None, :, :]), axis=-1
    )  # [G, P]
    c_giou = -box_ops.pairwise_giou(gt_boxes, pred_boxes)  # [G, P]
    cost = w_class * c_class + w_bbox * c_bbox + w_giou * c_giou
    return jnp.where(gt_mask[:, None], cost, 0.0)


def match(
    pred_sims: jnp.ndarray,
    pred_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_mask: jnp.ndarray,
    n_classes: int,
    **cost_weights,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-image matching (vmap over batch for batched training).

    Returns:
      assigned_patch [G] int32 — patch index matched to each GT (junk where
        ~gt_mask; callers must mask),
      target_classes [P] int32 — per-patch class with background = n_classes
        (the reference's dense target construction, matcher.py:148-158).
    """
    import os

    C = cost_matrix(pred_sims, pred_boxes, gt_labels, gt_boxes, gt_mask, **cost_weights)
    # padded GT rows are skipped by the solver (OWLVIT_MATCH_SKIP=0 restores
    # the r2 solve-constant-rows behavior for A/B)
    mask = None if os.environ.get("OWLVIT_MATCH_SKIP") == "0" else gt_mask
    # OWLVIT_MATCH_PRUNE=1: exact top-G column pruning (hungarian_pruned) —
    # shrinks every Dijkstra scan from P to <= G*G columns. Measured on chip
    # (BENCH.md r3g): ~6% SLOWER at the recipe shape G=16 (loss bit-identical)
    # — the valid rows' Dijkstras were already near-1-iteration against the
    # mostly-free columns. Default stays OFF; the exact-pruned solver is kept
    # for padded-heavy recipes (e.g. max_gt 64 with ~7 valid), where the
    # un-pruned scan width would dominate.
    solver = (
        hungarian_pruned
        if os.environ.get("OWLVIT_MATCH_PRUNE") == "1"
        else hungarian
    )
    assigned = solver(C, row_mask=mask)  # [G]
    P = pred_boxes.shape[0]
    target_classes = jnp.full((P,), n_classes, jnp.int32)
    # Scatter valid GT labels to their matched patches; invalid rows scatter
    # to a dummy out-of-range index (dropped by scatter's OOB semantics).
    idx = jnp.where(gt_mask, assigned, P)
    target_classes = target_classes.at[idx].set(
        gt_labels.astype(jnp.int32), mode="drop"
    )
    return assigned, target_classes
