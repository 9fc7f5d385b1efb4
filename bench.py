"""Benchmark: OWL-ViT B/16 fine-tune train-step throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Headline: bf16 batch-32 jitted train step (normalize -> ViT-B/16 forward ->
Hungarian match -> PushPull loss -> AdamW on the reference's trainable set).

vs_baseline: the reference publishes NO numbers (BASELINE.md) and its CUDA
stack cannot run here, so the baseline is the reference's ALGORITHMIC
configuration measured on the same chip: fp32, batch=1, full-precision
matmuls, trainable_last_k=1 — matching the reference's actual autograd
work (its frozen params have requires_grad=False, so torch never backprops
through layers 0..10 and AdamW skips them). vs_baseline = headline / that.

Env knobs: BENCH_BATCH (default 32), BENCH_STEPS (default 20),
BENCH_MODEL (default b16), BENCH_SKIP_BASELINE=1 to skip the slow fp32 ref.
"""

import json
import os
import time

import numpy as np


def _build(model_name, batch, dtype, trainable_last_k, n_classes=80, seed=0):
    import jax
    import jax.numpy as jnp
    import optax

    from owlvit_tpu.models import get_config, owlvit
    from owlvit_tpu.ops import losses as loss_ops
    from owlvit_tpu.ops.preprocess import normalize_image
    from owlvit_tpu.train.state import TrainState, combine_params, partition_params

    cfg = get_config(
        model_name, dtype=dtype, trainable_last_k=trainable_last_k
    )
    params = owlvit.init(jax.random.PRNGKey(seed), cfg, num_queries=3 * n_classes)
    k = trainable_last_k if trainable_last_k else cfg.vision.num_layers
    trainable, frozen = partition_params(params, k)
    tx = optax.adamw(3e-6, weight_decay=0.1)
    state = TrainState(
        trainable, frozen, tx.init(trainable), jnp.int32(0)
    )

    G, S = 16, cfg.vision.image_size
    rng = np.random.default_rng(seed)
    batch_data = {
        "image": jnp.asarray(
            rng.integers(0, 255, size=(batch, S, S, 3), dtype=np.uint8)
        ),
        "boxes": jnp.asarray(
            np.tile(np.asarray([[0.2, 0.2, 0.6, 0.7]], np.float32), (batch, G, 1))
        ),
        "labels": jnp.asarray(rng.integers(0, n_classes, size=(batch, G), dtype=np.int32)),
        "gt_mask": jnp.asarray(np.tile(np.arange(G) < 8, (batch, 1))),
    }

    def train_step(state, data):
        def loss_fn(trainable):
            p = combine_params(trainable, state.frozen)
            px = normalize_image(data["image"])
            boxes, sims = owlvit.forward_train(p, cfg, px)
            terms = loss_ops.push_pull_loss(
                sims, boxes, data["labels"], data["boxes"], data["gt_mask"],
                n_classes,
            )
            return loss_ops.total_loss(terms), terms

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.trainable
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        return (
            TrainState(trainable, state.frozen, opt_state, state.step + 1),
            loss,
        )

    step = jax.jit(train_step, donate_argnums=(0,))
    return step, state, batch_data


def _measure(step, state, data, n_steps):
    import jax

    # compile + warmup
    state, loss = step(state, data)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, loss = step(state, data)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    return n_steps / dt, float(loss)


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass

    model = os.environ.get("BENCH_MODEL", "b16")
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    n_steps = int(os.environ.get("BENCH_STEPS", "20"))

    step, state, data = _build(model, batch, "bfloat16", trainable_last_k=1)
    sps, loss = _measure(step, state, data, n_steps)
    imgs_per_sec = sps * batch
    assert np.isfinite(loss)

    vs_baseline = None
    if os.environ.get("BENCH_SKIP_BASELINE") != "1":
        # Reference-equivalent config: fp32, batch=1, backward only through
        # the last layer (the reference's requires_grad=False set means torch
        # never builds the frozen layers' backward either).
        ref_steps = max(4, n_steps // 4)
        step_r, state_r, data_r = _build(model, 1, "float32", trainable_last_k=1)
        sps_r, loss_r = _measure(step_r, state_r, data_r, ref_steps)
        assert np.isfinite(loss_r)
        vs_baseline = imgs_per_sec / (sps_r * 1.0)

    print(
        json.dumps(
            {
                "metric": f"owlvit-{model} bf16 train images/sec/chip (batch {batch})",
                "value": round(imgs_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
            }
        )
    )


if __name__ == "__main__":
    main()
