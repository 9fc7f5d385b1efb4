"""Single-purpose TPU measurement: ONE config per process (the relay
cascades failures within a process, so every experiment gets its own).

Usage: python tools/tpu_one_run.py NAME [batch=32] [packed=0] [bwd=both]
       [fused=0] [model=b16] [k=1] [dtype=bfloat16] [steps=20] [remat=0]
Modes (mutually exclusive): loss=1, gatherprobe=1, infer=1, quantdrift=1,
       cached=1, aug=1 (uncached step + on-device augmentation),
       accum=K (cached tail with optax.MultiSteps grad accumulation).
Appends one JSON line to /tmp/tpu_runs.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

args = dict(a.split("=", 1) for a in sys.argv[2:])
name = sys.argv[1]
batch = int(args.get("batch", 32))
steps = int(args.get("steps", 20))
model = args.get("model", "b16")
dtype = args.get("dtype", "bfloat16")
k = args.get("k", "1")
k = None if k in ("none", "null") else int(k)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ["OWLVIT_PACKED_FLASH"] = args.get("packed", "1")  # match production default
os.environ["OWLVIT_PACKED_BWD"] = args.get("bwd", "both")
os.environ["OWLVIT_FUSED_LN"] = args.get("fused", "0")
if "matchmask" in args:  # r3 diagnostic: force-disable the padded-row skip
    os.environ["OWLVIT_MATCH_SKIP"] = args["matchmask"]
# prune=1: exact top-G column pruning in the Hungarian solve (matcher.py
# hungarian_pruned) — A/B via `loss=1 prune=0|1` and `cached=1 prune=0|1`
os.environ["OWLVIT_MATCH_PRUNE"] = args.get("prune", "0")
# staticmax=<C>: fixed-shift softmax in the packed fwd kernel (no per-row
# max pass; flash_attention._static_max_env) — A/B via `infer=1 staticmax=0`
if "staticmax" in args:
    os.environ["OWLVIT_STATIC_MAX"] = args["staticmax"]

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

if args.get("cpu") == "1":  # CPU smoke-testing of a mode (axon overrides env)
    jax.config.update("jax_platforms", "cpu")

rec = {"name": name, **{k2: v for k2, v in args.items()}}
t0 = time.time()
try:
    (jnp.ones((256, 256)) @ jnp.ones((256, 256))).block_until_ready()
    rec["probe_s"] = round(time.time() - t0, 1)
    import bench

    if args.get("remat") == "1":
        import owlvit_tpu.models.configs as _cfgs
        _orig = _cfgs.get_config
        def _patched(name, **kw):
            kw["remat"] = True
            return _orig(name, **kw)
        _cfgs.get_config = _patched
        import owlvit_tpu.models as _m
        _m.get_config = _patched
        import bench as _b
        _b.get_config = _patched  # in case of direct import

    t = time.time()
    if args.get("loss") == "1":
        # Loss+matcher micro-bench: fwd+grad of push_pull_loss wrt
        # (sims, boxes) at the train-step shape — isolates the ~25-30 ms of
        # loss/matcher fusions seen in the cached-tail trace.
        import numpy as np

        from owlvit_tpu.models import get_config
        from owlvit_tpu.ops import losses as loss_ops

        cfg = get_config(model)
        P_, C_, G_ = cfg.vision.num_patches, 80, 16
        rng = np.random.default_rng(0)
        sims = jnp.asarray(rng.normal(size=(batch, P_, C_)), jnp.float32)
        boxes_raw = rng.uniform(0.05, 0.5, size=(batch, P_, 4)).astype(np.float32)
        pred_boxes = jnp.asarray(
            np.concatenate([boxes_raw[..., :2], boxes_raw[..., :2] + boxes_raw[..., 2:]], -1)
        )
        labels = jnp.asarray(rng.integers(0, C_, (batch, G_), dtype=np.int32))
        gt = jnp.asarray(np.tile([[0.2, 0.2, 0.6, 0.7]], (batch, G_, 1)).astype(np.float32))
        gm = jnp.asarray(np.tile(np.arange(G_) < 8, (batch, 1)))

        def f(sims, pb):
            terms = loss_ops.push_pull_loss(sims, pb, labels, gt, gm, C_)
            return loss_ops.total_loss(terms)

        g = jax.jit(jax.value_and_grad(f, argnums=(0, 1)))
        out = g(sims, pred_boxes)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(steps):
            out = g(sims, pred_boxes)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        rec.update(
            ms_per_call=round(dt / steps * 1e3, 2),
            loss=float(out[0]),
            compile_secs=round(time.time() - t, 1),
            ok=True,
        )
    elif args.get("gatherprobe") == "1":
        # Act-pool gather lowering A/B (r3): the cached-tail GATHER step is
        # ~6 ms/step slower than acts-resident at b32 (119.5 MB batch ->
        # ~40 GB/s effective, far below HBM peak), so the gather's XLA
        # lowering is suspect. Measure the gather ALONE in four lowerings:
        # random int64 idxs (status quo: acts_all[idxs]), sorted idxs with
        # indices_are_sorted+unique (exact for the trainer: batch loss is
        # permutation-invariant, labels ride the same permutation), int32
        # idxs, and the contiguous dynamic-slice lower bound.
        import numpy as np

        from jax import lax

        from owlvit_tpu.models import get_config

        cfg = get_config(model, dtype=dtype)
        P1 = cfg.vision.num_patches + 1
        S_pad = -(-P1 // 128) * 128
        D = cfg.vision.hidden_size
        row_mb = S_pad * D * 2 / 1e6
        pool = max(batch, int(2e9 // (row_mb * 1e6)))
        x = jnp.zeros((pool, S_pad, D), jnp.bfloat16)
        rng = np.random.default_rng(0)
        idx_np = rng.choice(pool, size=batch, replace=False)
        variants = {
            "random_i64": (
                jax.jit(lambda x, i: x[i]),
                jnp.asarray(idx_np, jnp.int64),
            ),
            "sorted_i64": (
                jax.jit(
                    lambda x, i: jnp.take(
                        x, i, axis=0, indices_are_sorted=True,
                        unique_indices=True,
                    )
                ),
                jnp.asarray(np.sort(idx_np), jnp.int64),
            ),
            "random_i32": (
                jax.jit(lambda x, i: x[i]),
                jnp.asarray(idx_np, jnp.int32),
            ),
            "slice_bound": (
                jax.jit(
                    lambda x, i: lax.dynamic_slice_in_dim(x, i[0], batch, 0)
                ),
                jnp.asarray([7], jnp.int32),
            ),
        }
        for vname, (fn, idxs) in variants.items():
            out = fn(x, idxs)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(steps):
                out = fn(x, idxs)
            jax.block_until_ready(out)
            ms = (time.perf_counter() - t0) / steps * 1e3
            rec[vname + "_ms"] = round(ms, 3)
            rec[vname + "_gbps"] = round(batch * row_mb / ms, 1)
        rec.update(
            batch_mb=round(batch * row_mb, 1), pool_rows=int(pool),
            compile_secs=round(time.time() - t, 1), ok=True,
        )
    elif args.get("infer") == "1":
        # Serving path: uint8 batch -> normalize -> forward -> NMS postprocess
        # (the eval/infer graph, trainer.eval_step equivalent).
        import numpy as np

        from owlvit_tpu.models import get_config, owlvit
        from owlvit_tpu.ops import nms as nms_ops
        from owlvit_tpu.ops.preprocess import normalize_image

        # ik=0 (the default, mirroring serve.py) makes the WHOLE encoder a
        # frozen prefix: licenses the fwd-only kernel modes (static-max
        # softmax — this is a pure-inference process, the proven-safe
        # surface) and composes with quant=1 (int8 projections/MLP) for
        # fully-quantized serving. ik=none restores the k=None branch;
        # static=0 keeps the dynamic per-row max for A/Bs.
        ik = args.get("ik", "0")
        cfg = get_config(
            model, dtype=dtype,
            trainable_last_k=None if ik in ("none", "null") else int(ik),
            quant_backbone=args.get("quant") == "1",
            static_softmax=args.get("static", "1") == "1"
            and ik not in ("none", "null"),
        )
        n_classes = 80
        params = owlvit.init(jax.random.PRNGKey(0), cfg, num_queries=3 * n_classes)
        S = cfg.vision.image_size
        rng = np.random.default_rng(0)
        images = jnp.asarray(rng.integers(0, 255, (batch, S, S, 3), dtype=np.uint8))

        def infer_step(params, images):
            boxes, sims = owlvit.forward_train(params, cfg, normalize_image(images))
            return nms_ops.postprocess(
                boxes, sims, confidence_threshold=0.01, iou_threshold=0.6,
                top_k=200,
            )

        istep = jax.jit(infer_step)
        out = istep(params, images)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(steps):
            out = istep(params, images)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        from owlvit_tpu.utils import flops as flops_mod

        m = flops_mod.mfu(
            steps * batch / dt,
            flops_mod.serve_flops_per_image(cfg, num_queries=3 * n_classes),
            flops_mod.chip_peak_flops(jax.devices()[0].device_kind),
        )
        rec.update(
            imgs_per_sec=round(steps * batch / dt, 2),
            mfu=round(m, 4) if m else None,
            compile_secs=round(time.time() - t, 1),
            ok=True,
        )
    elif args.get("quantdrift") == "1":
        # int8 accuracy probe WITHOUT training noise: same weights, same
        # images, two jitted forwards (quant_backbone on/off is a config
        # flag, so both arms live in one process). Reports elementwise
        # drift of (sims, boxes) AND an agreement mAP — the int8 arm's
        # detections scored against the bf16 arm's detections as pseudo-GT
        # (mAP=1.0 means int8 changes no detection above threshold).
        import numpy as np

        from owlvit_tpu.models import get_config, owlvit
        from owlvit_tpu.ops import nms as nms_ops
        from owlvit_tpu.ops.map_metric import MeanAveragePrecision
        from owlvit_tpu.ops.preprocess import normalize_image

        n_classes = 80
        cfg0 = get_config(model, dtype=dtype, trainable_last_k=1,
                          quant_backbone=False)
        cfg1 = cfg0.replace(quant_backbone=True)
        params = owlvit.init(jax.random.PRNGKey(0), cfg0,
                             num_queries=3 * n_classes)
        S = cfg0.vision.image_size
        rng = np.random.default_rng(int(args.get("seed", "0")))
        images = jnp.asarray(
            rng.integers(0, 255, (batch, S, S, 3), dtype=np.uint8)
        )

        def fwd(cfg):
            def f(params, images):
                return owlvit.forward_train(
                    params, cfg, normalize_image(images)
                )
            return jax.jit(f)

        b0, s0 = fwd(cfg0)(params, images)
        jax.block_until_ready(s0)
        b1, s1 = fwd(cfg1)(params, images)
        jax.block_until_ready(s1)
        b0n, s0n = np.asarray(b0, np.float32), np.asarray(s0, np.float32)
        b1n, s1n = np.asarray(b1, np.float32), np.asarray(s1, np.float32)
        rec["sims_max_abs_drift"] = round(float(np.abs(s1n - s0n).max()), 6)
        rec["sims_mean_abs_drift"] = round(float(np.abs(s1n - s0n).mean()), 6)
        rec["boxes_max_abs_drift"] = round(float(np.abs(b1n - b0n).max()), 6)

        post = lambda b, s: nms_ops.postprocess(
            b, s, confidence_threshold=0.01, iou_threshold=0.6, top_k=200
        )
        scalev = np.array([S, S, S, S], np.float64)

        def agreement(oa, ob):
            """mAP of arm-a detections against arm-b detections as GT."""
            m = MeanAveragePrecision(n_classes)
            for i in range(batch):
                ka, kb = oa["valid"][i], ob["valid"][i]
                m.update(
                    oa["boxes"][i][ka] * scalev, oa["scores"][i][ka],
                    oa["classes"][i][ka],
                    ob["boxes"][i][kb] * scalev, ob["classes"][i][kb],
                )
            return m.compute()

        o0 = {k2: np.asarray(v) for k2, v in post(b0, s0).items()}
        o1 = {k2: np.asarray(v) for k2, v in post(b1, s1).items()}
        agg = agreement(o1, o0)
        rec.update(
            agreement_map=round(float(agg["map"]), 4),
            agreement_map_50=round(float(agg["map_50"]), 4),
            n_det_bf16=int(o0["valid"].sum()),
            n_det_int8=int(o1["valid"].sum()),
        )

        # NOISE FLOOR control: bf16 (no quant) vs fp32 — random-init
        # detections are a wall of near-threshold ties, so even pure
        # precision noise reorders them; int8's agreement only means
        # something relative to this floor.
        cfg_f32 = get_config(model, dtype="float32", trainable_last_k=1)
        bf, sf = fwd(cfg_f32)(params, images)
        jax.block_until_ready(sf)
        sfn = np.asarray(sf, np.float32)
        rec["bf16_sims_mean_abs_drift_vs_f32"] = round(
            float(np.abs(s0n - sfn).mean()), 6
        )
        of = {k2: np.asarray(v) for k2, v in post(bf, sf).items()}
        floor = agreement(o0, of)
        rec.update(
            floor_map=round(float(floor["map"]), 4),
            floor_map_50=round(float(floor["map_50"]), 4),
            compile_secs=round(time.time() - t, 1),
            ok=True,
        )
    elif args.get("aug") == "1":
        # On-device augmentation in the uncached full step (the only path
        # it composes with — augmented pixels defeat the activation cache).
        # Measures (a) the augment_batch pipeline alone and (b) the full
        # train step with augmentation folded in, at the trainer's exact
        # composition (fold_in(step) inside the jitted step). Compare (b)
        # against the established 126.2 img/s non-augmented uncached row.
        import numpy as np
        import optax

        from owlvit_tpu.models import get_config, owlvit
        from owlvit_tpu.ops import losses as loss_ops
        from owlvit_tpu.ops.augment import augment_batch
        from owlvit_tpu.ops.preprocess import normalize_image
        from owlvit_tpu.train.state import (
            TrainState, combine_params, partition_params,
        )

        n_classes = 80
        cfg = get_config(model, dtype=dtype, trainable_last_k=k or 1)
        params = owlvit.init(jax.random.PRNGKey(0), cfg, num_queries=3 * n_classes)
        trainable, frozen = partition_params(params, k or 1)
        tx = optax.adamw(3e-6, weight_decay=0.1)
        state = TrainState(trainable, frozen, tx.init(trainable), jnp.int32(0))
        data = bench._make_batch(cfg, batch, n_classes)
        aug_key = jax.random.PRNGKey(0)
        aug_kw = dict(
            hflip_prob=float(args.get("hflip", "0.5")),
            color_strength=float(args.get("color", "0.4")),
            scale_min=float(args.get("smin", "0.8")),
            scale_max=float(args.get("smax", "1.2")),
        )

        def aug_only(step_i, image, boxes, gt_mask):
            kk = jax.random.fold_in(aug_key, step_i)
            return augment_batch(kk, image, boxes, gt_mask, **aug_kw)

        aonly = jax.jit(aug_only)
        out = aonly(state.step, data["image"], data["boxes"], data["gt_mask"])
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(steps):
            out = aonly(state.step, data["image"], data["boxes"], data["gt_mask"])
        jax.block_until_ready(out)
        rec["aug_only_ms"] = round(
            (time.perf_counter() - t0) / steps * 1e3, 2
        )

        def train_step(state, data):
            kk = jax.random.fold_in(aug_key, state.step)
            img, bxs, msk = augment_batch(
                kk, data["image"], data["boxes"], data["gt_mask"], **aug_kw
            )

            def loss_fn(trainable):
                p = combine_params(trainable, state.frozen)
                pb, sims = owlvit.forward_train(p, cfg, normalize_image(img))
                terms = loss_ops.push_pull_loss(
                    sims, pb, data["labels"], bxs, msk, n_classes
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

        astep = jax.jit(train_step, donate_argnums=(0,))
        sps, loss, _ = bench._measure(astep, state, data, steps)
        rec.update(
            imgs_per_sec=round(sps * batch, 2),
            loss=float(loss),
            compile_secs=round(time.time() - t, 1),
            ok=True,
        )
    elif "accum" in args:
        # Gradient accumulation (training.grad_accum, optax.MultiSteps) on
        # the cached-tail steady-state step: micro-step rate at batch_size
        # with updates every k micro-steps — effective batch k*batch_size
        # through the b32-proven graph (b48/b64 fault the relay).
        import optax

        from owlvit_tpu.models import get_config, owlvit
        from owlvit_tpu.ops import losses as loss_ops
        from owlvit_tpu.ops.preprocess import normalize_image
        from owlvit_tpu.train.state import (
            TrainState, combine_params, partition_params,
        )
        from owlvit_tpu.utils.bench_cached import build_batch

        accum = int(args["accum"])
        n_classes = 80
        cfg = get_config(model, dtype=dtype, trainable_last_k=k or 1)
        params = owlvit.init(jax.random.PRNGKey(0), cfg, num_queries=3 * n_classes)
        trainable, frozen = partition_params(params, k or 1)
        tx = optax.adamw(3e-6, weight_decay=0.1)
        if accum > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=accum)
        state = TrainState(trainable, frozen, tx.init(trainable), jnp.int32(0))
        data = build_batch(cfg, batch, n_classes)

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
            updates, opt_state = tx.update(
                grads, state.opt_state, state.trainable
            )
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
        la, bo, gm = data["labels"], data["boxes"], data["gt_mask"]
        state, loss = tstep(state, acts, la, bo, gm)  # compile
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for _ in range(steps):
            state, loss = tstep(state, acts, la, bo, gm)
        jax.block_until_ready(loss)
        dt = time.perf_counter() - t0
        rec.update(
            imgs_per_sec=round(steps * batch / dt, 2),
            effective_batch=accum * batch,
            loss=float(loss),
            compile_secs=round(time.time() - t, 1),
            ok=True,
        )
    elif args.get("hflip") == "1":
        # training.augment_hflip steady-state cost on the cached tail:
        # gather from a TWO-row-per-image pool (rows 2i / 2i+1 = flipped
        # prefix) + in-graph GT mirror + the [B] flip argument. Compare
        # against the same-campaign `cached=1` gather number.
        import numpy as np
        import optax

        from owlvit_tpu.models import get_config, owlvit
        from owlvit_tpu.ops import losses as loss_ops
        from owlvit_tpu.ops.augment import mirror_boxes
        from owlvit_tpu.ops.preprocess import normalize_image
        from owlvit_tpu.train.state import (
            TrainState, combine_params, partition_params,
        )
        from owlvit_tpu.utils.bench_cached import build_batch

        n_classes = 80
        cfg = get_config(model, dtype=dtype, trainable_last_k=k or 1)
        params = owlvit.init(jax.random.PRNGKey(0), cfg, num_queries=3 * n_classes)
        trainable, frozen = partition_params(params, k or 1)
        tx = optax.adamw(3e-6, weight_decay=0.1)
        state = TrainState(trainable, frozen, tx.init(trainable), jnp.int32(0))
        data = build_batch(cfg, batch, n_classes)

        def prefix_step(trainable, frozen, images, flipped=False):
            p = combine_params(trainable, frozen)
            if flipped:
                images = images[:, :, ::-1, :]
            return owlvit.embed_prefix(p, cfg, normalize_image(images))

        def tail_step(state, pool, rows, flip, labels, boxes, gt_mask):
            acts = pool[rows]
            boxes = mirror_boxes(boxes, flip)

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
            updates, opt_state = tx.update(
                grads, state.opt_state, state.trainable
            )
            return (
                TrainState(
                    optax.apply_updates(state.trainable, updates),
                    state.frozen, opt_state, state.step + 1,
                ),
                loss,
            )

        pstep = jax.jit(prefix_step, static_argnums=(3,))
        acts = pstep(state.trainable, state.frozen, data["image"])
        acts_f = pstep(state.trainable, state.frozen, data["image"], True)
        jax.block_until_ready((acts, acts_f))
        row_bytes = acts.shape[1] * acts.shape[2] * acts.dtype.itemsize
        imgs = max(batch, min(2500, int(2e9 / row_bytes)))  # match cached=1
        pool = jnp.zeros((2 * imgs,) + acts.shape[1:], acts.dtype)
        pool = pool.at[0:2 * batch:2].set(acts)
        pool = pool.at[1:2 * batch + 1:2].set(acts_f)
        flip_np = (np.arange(batch) % 2).astype(bool)
        rows = jnp.asarray(2 * np.arange(batch) + flip_np)
        flip = jnp.asarray(flip_np)
        la, bo, gm = data["labels"], data["boxes"], data["gt_mask"]
        tstep = jax.jit(tail_step, donate_argnums=(0,))
        state, loss = tstep(state, pool, rows, flip, la, bo, gm)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for _ in range(steps):
            state, loss = tstep(state, pool, rows, flip, la, bo, gm)
        jax.block_until_ready(loss)
        dt = time.perf_counter() - t0
        rec.update(
            imgs_per_sec=round(steps * batch / dt, 2),
            pool_imgs=imgs, pool_rows=2 * imgs,
            loss=float(loss),
            compile_secs=round(time.time() - t, 1),
            ok=True,
        )
    elif args.get("emabench") == "1":
        # EMA dispatch overhead on the cached tail (trainer composition):
        # the EMA update is a separate tiny jitted program per optimizer
        # step (training.ema_decay) — measure the steady-state tail step
        # with and without it in one process.
        import optax

        from owlvit_tpu.models import get_config, owlvit
        from owlvit_tpu.ops import losses as loss_ops
        from owlvit_tpu.ops.preprocess import normalize_image
        from owlvit_tpu.train.state import (
            TrainState, combine_params, partition_params,
        )
        from owlvit_tpu.utils.bench_cached import build_batch

        n_classes = 80
        cfg = get_config(model, dtype=dtype, trainable_last_k=k or 1)
        params = owlvit.init(jax.random.PRNGKey(0), cfg, num_queries=3 * n_classes)
        trainable, frozen = partition_params(params, k or 1)
        tx = optax.adamw(3e-6, weight_decay=0.1)
        state = TrainState(trainable, frozen, tx.init(trainable), jnp.int32(0))
        data = build_batch(cfg, batch, n_classes)

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

        d = float(args.get("decay", "0.999"))
        ema_step = jax.jit(
            lambda e, p: jax.tree.map(
                lambda a, b: a * d + b.astype(a.dtype) * (1.0 - d), e, p
            ),
            donate_argnums=(0,),
        )
        pstep = jax.jit(prefix_step)
        tstep = jax.jit(tail_step, donate_argnums=(0,))
        acts = pstep(state.trainable, state.frozen, data["image"])
        jax.block_until_ready(acts)
        la, bo, gm = data["labels"], data["boxes"], data["gt_mask"]
        state, loss = tstep(state, acts, la, bo, gm)  # compile
        ema = jax.jit(lambda p: jax.tree.map(jnp.copy, p))(state.trainable)
        ema = ema_step(ema, state.trainable)  # compile
        jax.block_until_ready(ema)

        t0 = time.perf_counter()
        for _ in range(steps):
            state, loss = tstep(state, acts, la, bo, gm)
        jax.block_until_ready(loss)
        plain = time.perf_counter() - t0

        t0 = time.perf_counter()
        for _ in range(steps):
            state, loss = tstep(state, acts, la, bo, gm)
            ema = ema_step(ema, state.trainable)
        jax.block_until_ready((loss, ema))
        with_ema = time.perf_counter() - t0
        rec.update(
            imgs_per_sec=round(steps * batch / with_ema, 2),
            plain_imgs_per_sec=round(steps * batch / plain, 2),
            ema_ms_per_step=round((with_ema - plain) / steps * 1e3, 3),
            loss=float(loss),
            compile_secs=round(time.time() - t, 1),
            ok=True,
        )
    elif args.get("qcache") == "1":
        # int8 activation-pool store (training.cache_store_dtype=int8):
        # measure the gather+dequant tail step against the bf16-pool gather
        # step IN THE SAME PROCESS (same claim, same compile session), plus
        # the storage-quantization drift: |loss(int8 acts) - loss(exact)|,
        # sims/boxes elementwise drift, and the agreement mAP of detections
        # from dequantized acts scored against exact-acts detections.
        import numpy as np
        import optax

        from owlvit_tpu.models import get_config, owlvit
        from owlvit_tpu.ops import losses as loss_ops
        from owlvit_tpu.ops import nms as nms_ops
        from owlvit_tpu.ops.map_metric import MeanAveragePrecision
        from owlvit_tpu.ops.preprocess import normalize_image
        from owlvit_tpu.ops.quant import dequantize_rows, quantize_rows
        from owlvit_tpu.train.state import (
            TrainState, combine_params, partition_params,
        )
        from owlvit_tpu.utils.bench_cached import build_batch

        n_classes = 80
        cfg = get_config(model, dtype=dtype, trainable_last_k=k or 1)
        params = owlvit.init(jax.random.PRNGKey(0), cfg, num_queries=3 * n_classes)
        trainable, frozen = partition_params(params, k or 1)
        tx = optax.adamw(3e-6, weight_decay=0.1)
        state = TrainState(trainable, frozen, tx.init(trainable), jnp.int32(0))
        data = build_batch(cfg, batch, n_classes)
        rng = np.random.default_rng(0)

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
        acts = pstep(state.trainable, state.frozen, data["image"])
        jax.block_until_ready(acts)
        la, bo, gm = data["labels"], data["boxes"], data["gt_mask"]
        row_bytes = acts[0].nbytes
        pool = max(batch, min(2500, int(2e9 // row_bytes)))
        idxs = jnp.asarray(rng.integers(0, batch, (batch,), dtype=np.int64))

        # arm A: bf16 pool (the shipped default), zeros pool + filled rows
        acts_all = jnp.zeros((pool,) + acts.shape[1:], acts.dtype)
        acts_all = acts_all.at[:batch].set(acts)

        def gstep_bf16(state, acts_all, idxs, labels, boxes, gt_mask):
            return tail_step(state, acts_all[idxs], labels, boxes, gt_mask)

        g0 = jax.jit(gstep_bf16, donate_argnums=(0,))
        state, loss = g0(state, acts_all, idxs, la, bo, gm)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for _ in range(steps):
            state, loss = g0(state, acts_all, idxs, la, bo, gm)
        jax.block_until_ready(loss)
        rec["bf16_gather_imgs_per_sec"] = round(
            steps * batch / (time.perf_counter() - t0), 2
        )
        del acts_all

        # arm B: int8 pool {q, s}
        q, s = jax.jit(quantize_rows)(acts)
        jax.block_until_ready(q)
        pool_q = jnp.zeros((pool,) + q.shape[1:], jnp.int8).at[:batch].set(q)
        pool_s = jnp.zeros((pool,) + s.shape[1:], jnp.float32).at[:batch].set(s)

        def gstep_int8(state, pq, ps, idxs, labels, boxes, gt_mask):
            a = dequantize_rows(pq[idxs], ps[idxs], jnp.dtype(dtype))
            return tail_step(state, a, labels, boxes, gt_mask)

        g1 = jax.jit(gstep_int8, donate_argnums=(0,))
        state, loss_q = g1(state, pool_q, pool_s, idxs, la, bo, gm)
        jax.block_until_ready(loss_q)
        t0 = time.perf_counter()
        for _ in range(steps):
            state, loss_q = g1(state, pool_q, pool_s, idxs, la, bo, gm)
        jax.block_until_ready(loss_q)
        rec["int8_gather_imgs_per_sec"] = round(
            steps * batch / (time.perf_counter() - t0), 2
        )
        rec["pool_imgs"] = int(pool)
        rec["bf16_pool_mb"] = round(pool * row_bytes / 1e6, 1)
        rec["int8_pool_mb"] = round(
            pool * (q[0].nbytes + s[0].nbytes) / 1e6, 1
        )

        # drift: forward loss + detections, exact vs dequantized acts.
        # params/labels must be ARGS, not closure constants — baked-in
        # weights blow the remote-compile request past its HTTP 413 size
        # cap (observed r3g).
        def fwd_loss(trainable, frozen, acts, la, bo, gm):
            p = combine_params(trainable, frozen)
            pb, sims = owlvit.forward_train_from_prefix(p, cfg, acts)
            terms = loss_ops.push_pull_loss(
                sims, pb, la, bo, gm, n_classes
            )
            return loss_ops.total_loss(terms), (pb, sims)

        f = jax.jit(fwd_loss)
        deq = jax.jit(
            lambda q, s: dequantize_rows(q, s, jnp.dtype(dtype))
        )(q, s)
        l_exact, (pb0, s0) = f(state.trainable, state.frozen, acts, la, bo, gm)
        l_quant, (pb1, s1) = f(state.trainable, state.frozen, deq, la, bo, gm)
        jax.block_until_ready((l_exact, l_quant))
        s0n, s1n = np.asarray(s0, np.float32), np.asarray(s1, np.float32)
        rec["loss_exact"] = round(float(l_exact), 6)
        rec["loss_int8"] = round(float(l_quant), 6)
        rec["sims_mean_abs_drift"] = round(float(np.abs(s1n - s0n).mean()), 6)
        rec["sims_max_abs_drift"] = round(float(np.abs(s1n - s0n).max()), 6)

        post = lambda b, sm: nms_ops.postprocess(
            b, sm, confidence_threshold=0.01, iou_threshold=0.6, top_k=200
        )
        S_img = cfg.vision.image_size
        scalev = np.array([S_img] * 4, np.float64)
        o0 = {k2: np.asarray(v) for k2, v in post(pb0, s0).items()}
        o1 = {k2: np.asarray(v) for k2, v in post(pb1, s1).items()}
        m = MeanAveragePrecision(n_classes)
        for i in range(batch):
            ka, kb = o1["valid"][i], o0["valid"][i]
            m.update(
                o1["boxes"][i][ka] * scalev, o1["scores"][i][ka],
                o1["classes"][i][ka],
                o0["boxes"][i][kb] * scalev, o0["classes"][i][kb],
            )
        agg = m.compute()
        rec.update(
            agreement_map=round(float(agg["map"]), 4),
            agreement_map_50=round(float(agg["map_50"]), 4),
            compile_secs=round(time.time() - t, 1),
            ok=True,
        )
    elif args.get("stream") == "1":
        # Streamed uncached training through the REAL loader (epoch-1 /
        # full-fine-tune composition): fresh host batch -> prefetch_to_device
        # -> jitted step -> float(loss) per step (the trainer's epoch-loop
        # sync). Three sub-arms in one process: consumer-side put (serial
        # relay protocol), producer-THREAD put (classic prefetch — the
        # transfer overlaps the in-flight exec), then serial again (does the
        # overlapped arm's degradation persist in-process?). The r4
        # concurrency probe showed overlapped transfers ~100x slower on the
        # relay; r3g epoch-1 walls (34 s / 8 batches) match.
        import numpy as np
        import optax

        from owlvit_tpu.data.loader import prefetch_to_device
        from owlvit_tpu.models import get_config, owlvit
        from owlvit_tpu.ops import losses as loss_ops
        from owlvit_tpu.ops.preprocess import normalize_image
        from owlvit_tpu.train.state import (
            TrainState, combine_params, partition_params,
        )

        n_classes = 80
        cfg = get_config(model, dtype=dtype, trainable_last_k=k or 1)
        params = owlvit.init(jax.random.PRNGKey(0), cfg, num_queries=3 * n_classes)
        trainable, frozen = partition_params(params, k or 1)
        tx = optax.adamw(3e-6, weight_decay=0.1)
        state = TrainState(trainable, frozen, tx.init(trainable), jnp.int32(0))
        S = cfg.vision.image_size
        G = min(16, cfg.vision.num_patches)  # tiny CPU-smoke config cap
        rng = np.random.default_rng(0)
        gt = dict(
            boxes=np.tile(np.asarray([[0.2, 0.2, 0.6, 0.7]], np.float32),
                          (batch, G, 1)),
            labels=rng.integers(0, n_classes, (batch, G)).astype(np.int32),
            gt_mask=np.tile(np.arange(G) < 8, (batch, 1)),
        )

        def host_batches(n):
            for _ in range(n):
                yield dict(
                    image=rng.integers(0, 255, (batch, S, S, 3),
                                       dtype=np.uint8),
                    **{kk: v.copy() for kk, v in gt.items()},
                )

        def train_step(state, data):
            img = data["image"].reshape(batch, S, S, 3)

            def loss_fn(trainable):
                p = combine_params(trainable, state.frozen)
                pb, sims = owlvit.forward_train(p, cfg, normalize_image(img))
                terms = loss_ops.push_pull_loss(
                    sims, pb, data["labels"], data["boxes"], data["gt_mask"],
                    n_classes,
                )
                return loss_ops.total_loss(terms), terms

            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.trainable
            )
            updates, opt_state = tx.update(
                grads, state.opt_state, state.trainable
            )
            return (
                TrainState(
                    optax.apply_updates(state.trainable, updates),
                    state.frozen, opt_state, state.step + 1,
                ),
                loss,
            )

        jstep = jax.jit(train_step, donate_argnums=(0,))
        warm = {kk: jnp.asarray(v) for kk, v in next(host_batches(1)).items()}
        warm["image"] = warm["image"].reshape(batch, -1)
        state, loss = jstep(state, warm)  # compile
        jax.block_until_ready(loss)
        rec["compile_secs"] = round(time.time() - t, 1)

        for arm, flag in (("serial", "1"), ("thread", "0"),
                          ("serial_after", "1")):
            os.environ["OWLVIT_SERIAL_RELAY"] = flag
            t0 = time.perf_counter()
            n = 0
            for b in prefetch_to_device(host_batches(steps)):
                state, loss = jstep(state, b)
                lv = float(loss)  # the trainer's per-step sync
                n += 1
            dt = time.perf_counter() - t0
            rec[f"{arm}_imgs_per_sec"] = round(n * batch / dt, 2)
            rec[f"{arm}_s_per_batch"] = round(dt / n, 3)

        # staged: the r5 pixel pre-stage (training.stage_pixels) — pool the
        # whole set's pixels device-resident in settled <=64 MB puts once,
        # then each step is a tiny idx put + on-device gather + the same
        # jitted step. ZERO per-step image H2D; this is what the trainer
        # runs on tpu backends by default now.
        rowb = S * S * 3
        n_rows = max(batch, steps * batch // 2)  # pool > 1 batch, bounded
        pool = jnp.zeros((n_rows, rowb), jnp.uint8)
        upd = jax.jit(
            lambda p, c, lo: jax.lax.dynamic_update_slice(p, c, (lo, 0)),
            donate_argnums=(0,),
        )
        chunk = max(1, min(n_rows, int(64e6 // rowb)))
        t0 = time.perf_counter()
        lo = 0
        while lo < n_rows:
            start = min(lo, n_rows - chunk)
            host = rng.integers(0, 255, (chunk, rowb), dtype=np.uint8)
            dev = jax.block_until_ready(jnp.asarray(host))
            pool = jax.block_until_ready(upd(pool, dev, np.int32(start)))
            lo = start + chunk
        rec["staged_fill_s"] = round(time.perf_counter() - t0, 2)
        rec["staged_pool_mb"] = round(pool.nbytes / 1e6)
        gt_dev = {kk: jnp.asarray(v) for kk, v in gt.items()}
        gather = jax.jit(lambda p, i: p[i])
        state, loss = jstep(  # compile the flat-image variant
            state, dict(image=gather(pool, jnp.arange(batch)), **gt_dev)
        )
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for s_i in range(steps):
            idx = jax.block_until_ready(jnp.asarray(
                rng.integers(0, n_rows, (batch,), dtype=np.int64)
            ))
            state, loss = jstep(state, dict(image=gather(pool, idx), **gt_dev))
            lv = float(loss)
        dt = time.perf_counter() - t0
        rec["staged_imgs_per_sec"] = round(steps * batch / dt, 2)
        rec["staged_s_per_batch"] = round(dt / steps, 3)
        rec.update(loss=lv, ok=True)
    elif args.get("cached") == "1":
        # Frozen-backbone activation-cache steady state: epochs >= 2 run
        # prefix-free (trainer._train_one_batch). Shared implementation
        # with bench.py (owlvit_tpu/utils/bench_cached.py) so the driver
        # benchmark and this tool measure identical graphs.
        from owlvit_tpu.utils.bench_cached import measure_cached_steady_state

        # gather=0 skips the monolithic pool-gather structure (L/14: 2 GB
        # pool arg beside tail grads faults the r5-era relay deterministically;
        # split-gather is the trainer's preferred structure anyway)
        c = measure_cached_steady_state(
            model, batch, steps, dtype=dtype, trainable_last_k=k or 1,
            pool_gather=args.get("gather", "1") == "1",
        )
        rec.update(
            acts_mb=c["acts_mb"],
            tail_imgs_per_sec=c["tail_imgs_per_sec"],
            imgs_per_sec=c["gather_imgs_per_sec"],
            split_gather_imgs_per_sec=c.get("split_gather_imgs_per_sec"),
            loss=c["loss"],
            compile_secs=round(time.time() - t, 1),
            pool_imgs=c["pool_imgs"],
            ok=True,
        )
    else:
        step, state, data = bench._build(model, batch, dtype, trainable_last_k=k)
        sps, loss, _ = bench._measure(step, state, data, steps)
        rec.update(
            imgs_per_sec=round(sps * batch, 2),
            loss=float(loss),
            compile_secs=round(time.time() - t, 1),
            ok=True,
        )
except Exception as e:  # noqa: BLE001
    rec.update(ok=False, err=repr(e)[:400])
print(rec, flush=True)
with open("/tmp/tpu_runs.jsonl", "a") as f:
    f.write(json.dumps(rec) + "\n")
sys.exit(0 if rec.get("ok") else 1)
