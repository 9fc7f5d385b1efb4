"""Capture a jax.profiler trace of the headline bench step (B/16 bf16 b32).

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache python tools/bench_profile.py [outdir]
       BENCH_CACHED=1 ... profiles the cached-backbone TAIL step instead
       (trainer.tail_step_gather equivalent: gather + trainable tail + loss).
Then: python tools/trace_top_ops.py <outdir> 30
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_trace"
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass

    from bench import _build

    model = os.environ.get("BENCH_MODEL", "b16")
    batch = int(os.environ.get("BENCH_BATCH", "32"))

    if os.environ.get("BENCH_CACHED") == "1":
        import numpy as np
        import jax.numpy as jnp
        import optax

        from owlvit_tpu.models import get_config, owlvit
        from owlvit_tpu.ops import losses as loss_ops
        from owlvit_tpu.ops.preprocess import normalize_image
        from owlvit_tpu.train.state import (
            TrainState, combine_params, partition_params,
        )

        cfg = get_config(model, dtype="bfloat16", trainable_last_k=1)
        n_classes = 80
        params = owlvit.init(jax.random.PRNGKey(0), cfg, num_queries=3 * n_classes)
        trainable, frozen = partition_params(params, 1)
        tx = optax.adamw(3e-6, weight_decay=0.1)
        state = TrainState(trainable, frozen, tx.init(trainable), jnp.int32(0))
        G, S = 16, cfg.vision.image_size
        rng = np.random.default_rng(0)
        images = jnp.asarray(rng.integers(0, 255, (batch, S, S, 3), dtype=np.uint8))
        la = jnp.asarray(rng.integers(0, n_classes, (batch, G), dtype=np.int32))
        bo = jnp.asarray(np.tile([[0.2, 0.2, 0.6, 0.7]], (batch, G, 1)).astype(np.float32))
        gm = jnp.asarray(np.tile(np.arange(G) < 8, (batch, 1)))

        acts = jax.jit(
            lambda tr, fz, im: owlvit.embed_prefix(
                combine_params(tr, fz), cfg, normalize_image(im)
            )
        )(state.trainable, state.frozen, images)
        pool = max(batch, int(2e9 // (acts.nbytes // batch)))
        acts_all = jnp.zeros((pool,) + acts.shape[1:], acts.dtype).at[:batch].set(acts)
        idxs = jnp.asarray(rng.integers(0, batch, (batch,), dtype=np.int64))

        def gstep(state, acts_all, idxs, labels, boxes, gt_mask):
            def loss_fn(trainable):
                p = combine_params(trainable, state.frozen)
                pb, sims = owlvit.forward_train_from_prefix(p, cfg, acts_all[idxs])
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

        step = jax.jit(gstep, donate_argnums=(0,))
        state, loss = step(state, acts_all, idxs, la, bo, gm)
        jax.block_until_ready(loss)
        jax.profiler.start_trace(outdir)
        for _ in range(3):
            state, loss = step(state, acts_all, idxs, la, bo, gm)
        jax.block_until_ready(loss)
        jax.profiler.stop_trace()
        print(f"cached-tail trace written to {outdir}; loss={float(loss):.4f}")
        return

    step, state, data = _build(model, batch, "bfloat16", trainable_last_k=1)

    # compile + warmup outside the trace
    state, loss = step(state, data)
    jax.block_until_ready(loss)

    jax.profiler.start_trace(outdir)
    for _ in range(3):
        state, loss = step(state, data)
    jax.block_until_ready(loss)
    jax.profiler.stop_trace()
    print(f"trace written to {outdir}; loss={float(loss):.4f}")


if __name__ == "__main__":
    main()
