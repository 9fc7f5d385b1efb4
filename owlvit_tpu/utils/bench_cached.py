"""Shared cached-steady-state measurement (bench.py + tools/tpu_one_run.py).

One implementation of the activation-cache steady-state timing so the driver
benchmark and the campaign tool measure the SAME graphs in the SAME order.
The sequence is the one proven repeatedly on the chip (r2+r3): build state,
run the prefix once, measure the RESIDENT tail step (acts as a direct device
arg), then the device-store GATHER tail step (trainer.tail_step_gather's
shape: gather outside the grad closure). bench.py's first two from-scratch
variants of this sequence each hit relay faults the tool sequence never did;
sharing the exact code removes the variable.
"""

from __future__ import annotations

import numpy as np


def build_batch(cfg, batch, n_classes, seed=0):
    import jax.numpy as jnp

    G = min(16, cfg.vision.num_patches)
    S = cfg.vision.image_size
    rng = np.random.default_rng(seed)
    return {
        "image": jnp.asarray(
            rng.integers(0, 255, size=(batch, S, S, 3), dtype=np.uint8)
        ),
        "boxes": jnp.asarray(
            np.tile(np.asarray([[0.2, 0.2, 0.6, 0.7]], np.float32), (batch, G, 1))
        ),
        "labels": jnp.asarray(
            rng.integers(0, n_classes, size=(batch, G), dtype=np.int32)
        ),
        "gt_mask": jnp.asarray(np.tile(np.arange(G) < min(8, G), (batch, 1))),
    }


class _SkipSplit(Exception):
    pass


def measure_cached_steady_state(
    model: str,
    batch: int,
    steps: int,
    *,
    dtype: str = "bfloat16",
    trainable_last_k: int = 1,
    n_classes: int = 80,
    seed: int = 0,
    pool_bytes: float = 2e9,
    max_pool_rows: int = 2500,
    pool_gather: bool = True,
    split_gather: bool = True,
) -> dict:
    """Returns dict(tail_imgs_per_sec, gather_imgs_per_sec, loss, acts_mb,
    pool_imgs)."""
    import time

    import jax
    import jax.numpy as jnp
    import optax

    from owlvit_tpu.models import get_config, owlvit
    from owlvit_tpu.ops import losses as loss_ops
    from owlvit_tpu.ops.preprocess import normalize_image
    from owlvit_tpu.train.state import TrainState, combine_params, partition_params

    cfg = get_config(model, dtype=dtype, trainable_last_k=trainable_last_k)
    params = owlvit.init(jax.random.PRNGKey(seed), cfg, num_queries=3 * n_classes)
    trainable, frozen = partition_params(params, trainable_last_k)
    tx = optax.adamw(3e-6, weight_decay=0.1)
    state = TrainState(trainable, frozen, tx.init(trainable), jnp.int32(0))
    data = build_batch(cfg, batch, n_classes, seed)
    rng = np.random.default_rng(seed)

    def prefix_step(trainable, frozen, images):
        p = combine_params(trainable, frozen)
        return owlvit.embed_prefix(p, cfg, normalize_image(images))

    def tail_step(state, acts, labels, boxes, gt_mask):
        def loss_fn(trainable):
            p = combine_params(trainable, state.frozen)
            pb, sims = owlvit.forward_train_from_prefix(p, cfg, acts)
            terms = loss_ops.push_pull_loss(
                sims, pb, labels, boxes, gt_mask, n_classes
            )
            return loss_ops.total_loss(terms), terms

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.trainable
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.trainable)
        return (
            TrainState(
                optax.apply_updates(state.trainable, updates),
                state.frozen, opt_state, state.step + 1,
            ),
            loss,
        )

    pstep = jax.jit(prefix_step)
    tstep = jax.jit(tail_step, donate_argnums=(0,))
    acts = pstep(state.trainable, state.frozen, data["image"])
    jax.block_until_ready(acts)
    acts_mb = float(np.prod(acts.shape)) * acts.dtype.itemsize / 1e6
    la, bo, gm = data["labels"], data["boxes"], data["gt_mask"]

    state, loss = tstep(state, acts, la, bo, gm)  # compile
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss = tstep(state, acts, la, bo, gm)
    jax.block_until_ready(loss)
    tail_ips = steps * batch / (time.perf_counter() - t0)
    # settle the loss value NOW: relay faults cascade within a process, and
    # a fault in a LATER phase would otherwise poison this phase's already-
    # measured result at the final fetch (r5g L/14: the split phase faulted
    # inside its try, then float(loss) at return died — losing the clean
    # resident-tail number)
    loss_val = float(loss)

    # Device-store steady state (trainer.tail_step_gather): acts for a pool
    # of images live in HBM; each step gathers its batch rows. Zeros pool +
    # gather of FILLED rows only (zero rows -> NaN sims via the q/||q||
    # quirk; a tiled full-pool fill faulted the relay — r3). Gather cost
    # depends on shapes, not index values.
    row_bytes = acts[0].nbytes
    pool = max(batch, min(max_pool_rows, int(pool_bytes // row_bytes)))
    acts_all = jnp.zeros((pool,) + acts.shape[1:], acts.dtype)
    # settle the fill execs, THEN the index put (the r4d relay rule this
    # file's own fault history taught: never issue a transfer beside an
    # in-flight exec, and settle every put before the next RPC)
    acts_all = jax.block_until_ready(acts_all.at[:batch].set(acts))
    idxs = jax.block_until_ready(
        jnp.asarray(rng.integers(0, batch, (batch,), dtype=np.int64)))

    # pool_gather=False skips this monolithic structure: at L/14 (2 GB pool
    # beside the 24-layer tail grads) it faults the r5-era relay 3/3 — in
    # the SAME place every time, where it measured cleanly in r3 (114.3
    # img/s) — while the split structure below confines the pool to a
    # one-op program. The trainer already routes steady-state steps through
    # whichever structure is faster, so split alone is recipe-faithful.
    gather_ips = None
    if pool_gather:
        try:
            def gather_step(state, acts_all, idxs, labels, boxes, gt_mask):
                return tail_step(state, acts_all[idxs], labels, boxes,
                                 gt_mask)

            gstep = jax.jit(gather_step, donate_argnums=(0,))
            state, loss = gstep(state, acts_all, idxs, la, bo, gm)  # compile
            jax.block_until_ready(loss)
            t0 = time.perf_counter()
            for _ in range(steps):
                state, loss = gstep(state, acts_all, idxs, la, bo, gm)
            jax.block_until_ready(loss)
            gather_ips = steps * batch / (time.perf_counter() - t0)
            loss_val = float(loss)
        except Exception as e:  # noqa: BLE001 — the historically recurring
            # fault site (bench_cached.py:131 across r4c/r4d/r5 logs); keep
            # the already-measured resident number and report the fault
            gather_ips = None
            print(f"bench_cached: pool-gather phase faulted: "
                  f"{type(e).__name__}: {e}", flush=True)

    # SPLIT gather: the batch gather runs as its OWN tiny program and the
    # tail step takes the gathered acts as a direct arg. Rationale: the
    # gather itself is ~0.1 ms (r3 gatherprobe), so the ~6 ms
    # gather-vs-resident delta is the tail graph paying for CARRYING the
    # 2 GB pool argument; confining the pool to a one-op program trades
    # that for one extra dispatch. split_gather=False skips the phase
    # entirely: at L/14 this standalone loop faults the r5-era relay (2/2,
    # r5h) and poisons the rest of the process — while the TRAINER's split
    # routing runs the real recipe cleanly (r5h L/14 e2e: 3 epochs, losses
    # down). A relay-structure sensitivity of this bench loop, not of the
    # production path.
    split_ips = None
    try:
        if not split_gather:
            raise _SkipSplit
        ggather = jax.jit(lambda pool_, i: pool_[i])
        acts_g = ggather(acts_all, idxs)
        jax.block_until_ready(acts_g)
        state, loss = tstep(state, acts_g, la, bo, gm)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for _ in range(steps):
            acts_g = ggather(acts_all, idxs)
            state, loss = tstep(state, acts_g, la, bo, gm)
        jax.block_until_ready(loss)
        split_ips = round(steps * batch / (time.perf_counter() - t0), 2)
        loss_val = float(loss)
    except _SkipSplit:
        pass
    except Exception as e:  # noqa: BLE001 - keep the proven numbers on a
        # fault, but SAY which phase died and how (r5g: a silent except
        # here cost the diagnosis of the first L/14 split fault)
        split_ips = None
        print(f"bench_cached: split-gather phase faulted: "
              f"{type(e).__name__}: {e}", flush=True)

    return {
        "tail_imgs_per_sec": round(tail_ips, 2),
        "gather_imgs_per_sec":
            round(gather_ips, 2) if gather_ips is not None else None,
        "split_gather_imgs_per_sec": split_ips,
        "loss": loss_val,
        "acts_mb": round(acts_mb, 1),
        "pool_imgs": int(pool),
    }
