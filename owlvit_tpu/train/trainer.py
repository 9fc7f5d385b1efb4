"""Train/eval driver: one jit-compiled train step, epoch loop, eval, mAP.

Rebuilds the reference driver (/root/reference/main.py) TPU-first:

  * ONE `jax.jit`-compiled train step: on-device normalize -> ViT forward ->
    Hungarian match -> loss -> grads -> AdamW update. The reference crosses
    the host boundary every step (matcher on CPU, .item() syncs); here the
    only per-step host work is feeding the next batch.
  * batch_size is free (vmap-batched loss), vs. the reference's batch=1.
  * frozen backbone never builds a backward pass (state.partition_params).
  * Orbax checkpointing + resume (absent in the reference).
  * per-epoch eval: jitted forward+NMS postprocess, host COCO mAP,
    per-class history (class_maps.json), progress table, JSONL metrics.
  * behavioral fixes over the reference, on purpose: eval runs in eval mode
    every epoch (main.py:62,99 never restores train mode — inert for this
    architecture), loss accumulator resets per epoch (util.py:30-31 bug).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from owlvit_tpu.data import DetectionDataset, batch_iterator, prefetch_to_device
from owlvit_tpu.data import synthetic as synthetic_data
from owlvit_tpu.data.coco import load_labelmap
from owlvit_tpu.data.tokenizer import CLIPTokenizer, HashTokenizer, build_prompts
from owlvit_tpu.models import get_config, owlvit
from owlvit_tpu.models.convert import load_params
from owlvit_tpu.ops import losses as loss_ops
from owlvit_tpu.ops import nms as nms_ops
from owlvit_tpu.ops.map_metric import MeanAveragePrecision
from owlvit_tpu.ops.preprocess import normalize_image
from owlvit_tpu.utils.config import Config
from owlvit_tpu.utils.logging import JSONLLogger, LossAccumulator, ProgressFormatter

from . import checkpoint as ckpt
from .state import TrainState, combine_params, partition_params


def _resolved_static_max(dtype_name: str) -> str:
    """The softmax shift constant the flash kernels will actually trace with
    at this model dtype ("" = dynamic per-row max)."""
    from owlvit_tpu.ops.flash_attention import _static_max_env

    v = _static_max_env(jnp.dtype(dtype_name))
    return "" if v is None else repr(v)

TrainConfig = Config  # alias: the full config drives the trainer

# the four reference loss terms (losses.py push_pull_loss), in the packed
# order grad_update returns them
_TERM_KEYS = ("loss_ce", "loss_bg", "loss_bbox", "loss_giou")


class Trainer:
    def __init__(self, config: Config, workdir: str = "."):
        self.cfg = config
        self.workdir = workdir
        os.makedirs(self.workdir, exist_ok=True)
        self.setup()

    # ------------------------------------------------------------------ setup

    def setup(self):
        cfg = self.cfg
        d = cfg.data

        if d.synthetic_root:
            paths = synthetic_data.generate(
                d.synthetic_root,
                n_train=d.num_train_images,
                n_test=d.num_test_images,
                n_classes=d.synthetic_classes,
                seed=cfg.training.seed,
            )
            d.images_path = paths["images_dir"]
            d.train_annotations = paths["train"]
            d.test_annotations = paths["test"]
            d.labelmap = paths["labelmap"]

        self.labelmap = load_labelmap(d.labelmap)
        self.n_classes = len(self.labelmap)

        self.model_cfg = get_config(
            cfg.model.name,
            dtype=cfg.model.dtype,
            attention_impl=cfg.model.attention_impl,
            remat=cfg.model.remat,
            trainable_last_k=cfg.model.trainable_last_k,
            # int8 backbone is a tools-only experiment since r5 (drift gate
            # failure, BENCH.md r3); OWLVIT_QUANT_BACKBONE=1 still reaches
            # the kernels for A/B probes
        )
        size = self.model_cfg.vision.image_size

        self.train_ds = DetectionDataset(
            d.train_annotations, d.images_path, image_size=size,
            max_gt=d.max_gt, cache_resized=d.cache_resized,
            native_decode=d.native_decode,
        )
        self.test_ds = DetectionDataset(
            d.test_annotations, d.images_path, image_size=size,
            max_gt=d.max_gt, cache_resized=d.cache_resized,
            native_decode=d.native_decode,
        )

        # --- params ---------------------------------------------------------
        if cfg.model.params_npz:
            params = load_params(cfg.model.params_npz)
        else:
            params = owlvit.init(
                jax.random.PRNGKey(cfg.training.seed), self.model_cfg
            )
        if "queries" not in params:
            will_restore = cfg.training.checkpoint_dir and (
                ckpt.latest_step(cfg.training.checkpoint_dir) is not None
            )
            # Keep the bank ON DEVICE (no np.asarray): a d2h fetch here would
            # be the process's FIRST fetch, and on the relay the first fetch
            # is implicated in flipping the process into permanent
            # degraded-put mode (BENCH.md r5 probe v2) — the pixel pre-stage
            # fill that follows must run in the fresh fast-put mode.
            if will_restore:
                # checkpoint overwrites the bank below — skip the text-encoder
                # compile (the expensive part of cold inference setup)
                params["queries"] = (
                    jax.random.normal(
                        jax.random.PRNGKey(cfg.training.seed),
                        (3 * self.n_classes, self.model_cfg.projection_dim),
                    )
                    * 0.02
                )
            else:
                params["queries"] = self._build_query_bank(params)

        # --- optimizer over the trainable partition only --------------------
        trainable, frozen = partition_params(params, cfg.model.trainable_last_k)
        self.tx = optax.adamw(
            learning_rate=self._lr_schedule(),
            weight_decay=cfg.training.weight_decay,
        )
        if cfg.training.grad_accum < 1:
            raise ValueError(
                f"training.grad_accum must be >= 1, got {cfg.training.grad_accum}"
            )
        if cfg.training.grad_accum > 1:
            # k micro-steps of batch_size average into ONE adamw update
            # (effective batch k*batch_size) through the SAME compiled step
            # graph — no larger graph to compile (b48/b64 fault the remote
            # compiler, BENCH.md). MultiSteps state embeds a params-shaped
            # grad accumulator, so opt_state sharding (structural suffix
            # match, parallel/sharding.py) and Orbax checkpointing both
            # compose untouched. The inner adamw schedule advances once per
            # completed accumulation = once per optimizer update.
            self.tx = optax.MultiSteps(
                self.tx, every_k_schedule=cfg.training.grad_accum
            )
        self.state = TrainState(
            trainable=jax.tree.map(jnp.asarray, trainable),
            frozen=jax.tree.map(jnp.asarray, frozen),
            opt_state=self.tx.init(jax.tree.map(jnp.asarray, trainable)),
            step=jnp.int32(0),
        )
        if cfg.training.checkpoint_dir:
            restored = ckpt.restore(cfg.training.checkpoint_dir, self.state)
            if restored is not None:
                self.state = restored
                print(f"resumed from step {int(self.state.step)}", flush=True)

        # --- GSPMD mesh (training.mesh_data x training.mesh_model) -----------
        self.mesh = None
        t_ = cfg.training
        if t_.mesh_data * t_.mesh_model > 1:
            from owlvit_tpu.parallel import create_mesh, shard_state

            n_dev = len(jax.devices())
            if t_.mesh_data * t_.mesh_model > n_dev:
                raise ValueError(
                    f"mesh {t_.mesh_data}x{t_.mesh_model} needs "
                    f"{t_.mesh_data * t_.mesh_model} devices, have {n_dev}"
                )
            if t_.batch_size % t_.mesh_data:
                raise ValueError(
                    f"training.batch_size={t_.batch_size} must divide by "
                    f"mesh_data={t_.mesh_data}"
                )
            self.mesh = create_mesh(
                data=t_.mesh_data, model=t_.mesh_model,
                devices=jax.devices()[: t_.mesh_data * t_.mesh_model],
            )
            self.state = shard_state(self.state, self.mesh)

        # --- EMA of the trainable params (training.ema_decay) ----------------
        # Kept OUTSIDE TrainState (checkpoint structure stays unchanged; the
        # EMA tree is saved/restored alongside via checkpoint.save_tree).
        # Only the trainable subtree is averaged — the frozen set never moves.
        self.ema = None
        self._ema_step = None
        self._batches_done = 0
        if t_.ema_decay:
            if not 0.0 < t_.ema_decay < 1.0:
                raise ValueError(
                    f"training.ema_decay must be in (0, 1), got {t_.ema_decay}"
                )
            d = t_.ema_decay
            self._ema_step = jax.jit(
                lambda e, p: jax.tree.map(
                    lambda a, b: a * d + b.astype(a.dtype) * (1.0 - d), e, p
                ),
                donate_argnums=(0,),
            )
            base = self.state.trainable
            if t_.checkpoint_dir:
                restored_ema = ckpt.restore_tree(
                    t_.checkpoint_dir, int(self.state.step), base
                )
                if restored_ema is not None:
                    base = restored_ema
                    print("resumed EMA params", flush=True)
            # match the trainable shardings exactly (restore returns host
            # arrays; on a mesh the EMA must live where the params live),
            # then force DISTINCT buffers: train_step donates the state, so
            # an EMA that aliased the initial trainable would be left holding
            # deleted buffers after the first step (jitted copy can't alias
            # its inputs without donation).
            placed = jax.tree.map(
                lambda t, e: jax.device_put(e, t.sharding),
                self.state.trainable, base,
            )
            self.ema = jax.jit(lambda p: jax.tree.map(jnp.copy, p))(placed)

        scales = (
            jnp.asarray(self.train_ds.class_scales(self.n_classes))
            if cfg.training.use_class_weight
            else None
        )

        # --- jitted steps ----------------------------------------------------
        mcfg = self.model_cfg
        n_classes = self.n_classes
        tx = self.tx
        self._scales = scales

        def grad_update(state: TrainState, loss_fn):
            """The ONE optimizer-update block (shared by the fused train
            step and the cached tail step, so they can never diverge).

            Loss terms return PACKED into one [4] f32 vector: on the relay
            every device->host read is a separate RPC (~26 ms), so the run
            loop's per-term float() reads cost ~100 ms/step — one packed
            fetch (np.asarray in _train_one_batch) collapses them to one
            RPC (the same wire trick as eval_step/serve)."""
            (_, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.trainable
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.trainable)
            trainable = optax.apply_updates(state.trainable, updates)
            return (
                TrainState(trainable, state.frozen, opt_state, state.step + 1),
                jnp.stack([terms[k].astype(jnp.float32) for k in _TERM_KEYS]),
            )

        self._grad_update = grad_update

        aug = cfg.training
        if aug.augment and aug.cache_backbone:
            raise ValueError(
                "training.augment and training.cache_backbone are mutually "
                "exclusive: the activation cache stores frozen-prefix outputs "
                "of CONSTANT pixels; augmentation changes pixels every step. "
                "For flip augmentation under the cache use "
                "training.augment_hflip (deterministic two-row pool)."
            )
        if aug.augment and aug.augment_hflip:
            raise ValueError(
                "training.augment already includes hflip (training.aug_hflip); "
                "training.augment_hflip is the cache-compatible variant — "
                "enable one or the other"
            )
        # hflip decisions are sampled HOST-side (Philox keyed by seed+step,
        # _sample_flips) so the cached path's pool-row choice and the
        # in-graph box mirror see the same bits.
        self._hflip = aug.augment_hflip
        aug_key = jax.random.PRNGKey(aug.seed) if aug.augment else None

        S_img = mcfg.vision.image_size

        def unflatten_images(img):
            """Accept the loader's FLAT [B, S*S*3] wire format (see
            data/loader.py — flat uint8 crosses the relay unpadded) or the
            plain [B, S, S, 3] layout (tools/tests with device-resident
            batches). Static-rank branch, resolved at trace time."""
            if img.ndim == 2:
                return img.reshape(img.shape[0], S_img, S_img, 3)
            return img

        self._unflatten_images = unflatten_images

        if aug.augment:
            # import EAGERLY, not inside the traced step: module-level
            # constants created during a trace leak as stale tracers into
            # the next retrace (second Trainer in one process)
            from owlvit_tpu.ops.augment import augment_batch
        if self._hflip:
            from owlvit_tpu.ops.augment import apply_hflip

        def train_step(state: TrainState, batch):
            batch = {**batch, "image": unflatten_images(batch["image"])}
            if "flip" in batch:  # augment_hflip, uncached path (host-sampled)
                img, bxs = apply_hflip(
                    batch["image"], batch["boxes"], batch.pop("flip")
                )
                batch = {**batch, "image": img, "boxes": bxs}
            if aug.augment:
                k = jax.random.fold_in(aug_key, state.step)
                img, bxs, msk = augment_batch(
                    k, batch["image"], batch["boxes"], batch["gt_mask"],
                    hflip_prob=aug.aug_hflip, color_strength=aug.aug_color,
                    scale_min=aug.aug_scale_min, scale_max=aug.aug_scale_max,
                )
                batch = {**batch, "image": img, "boxes": bxs, "gt_mask": msk}

            def loss_fn(trainable):
                params = combine_params(trainable, state.frozen)
                px = normalize_image(batch["image"])
                boxes, sims = owlvit.forward_train(params, mcfg, px)
                terms = loss_ops.push_pull_loss(
                    sims, boxes, batch["labels"], batch["boxes"],
                    batch["gt_mask"], n_classes, scales,
                )
                return loss_ops.total_loss(terms), terms

            return grad_update(state, loss_fn)

        t = cfg.training

        def eval_step(trainable, frozen, images):
            params = combine_params(trainable, frozen)
            px = normalize_image(unflatten_images(images))
            eval_cfg = mcfg.replace(trainable_last_k=None)
            boxes, sims = owlvit.forward_train(params, eval_cfg, px)
            return self._postprocess_pack(boxes, sims)

        self.train_step = jax.jit(train_step, donate_argnums=(0,))
        self.eval_step = jax.jit(eval_step)
        self._train_step_raw = train_step  # composed by the staged epoch step

        # --- frozen-backbone activation cache --------------------------------
        self.act_cache = None
        if t.cache_backbone:
            if cfg.model.trainable_last_k is None:
                raise ValueError(
                    "training.cache_backbone requires model.trainable_last_k "
                    "(full fine-tuning has no frozen prefix to cache)"
                )
            self._setup_act_cache()

        # --- device-resident pixel pre-stage (training.stage_pixels) ---------
        self._setup_pixel_stage()

        # One-line mode banner: the active mesh/cache/store configuration is
        # otherwise discoverable only by reading code (VERDICT r2 weak #7).
        mesh_desc = (
            f"mesh data={t.mesh_data}x model={t.mesh_model}"
            if self.mesh is not None else "single-device"
        )
        cache_desc = (
            f"act-cache ON (store={self.act_store}"
            + (f", {t.cache_store_dtype}" if t.cache_store_dtype else "")
            + ")"
            if t.cache_backbone else "act-cache off"
        )
        print(
            f"trainer: model={cfg.model.name} dtype={cfg.model.dtype} "
            f"trainable_last_k={cfg.model.trainable_last_k} | {mesh_desc} | "
            f"{cache_desc} | batch={t.batch_size}"
            + (f" | grad_accum={t.grad_accum} (eff. batch "
               f"{t.grad_accum * t.batch_size})" if t.grad_accum > 1 else "")
            + (" | augment ON" if t.augment else "")
            + (" | hflip ON (cache-compatible)" if t.augment_hflip else "")
            + (" | pixels pre-staged on device" if self._stage_on else ""),
            flush=True,
        )

    def _postprocess_pack(self, boxes, sims):
        """postprocess + pack into ONE [B, K, 7] f32 tensor (xyxy boxes,
        score, class id, valid flag) -> one device->host fetch per eval
        batch (four separate fetches each pay a relay RPC; same wire
        protocol as serve.py — class ids and the 0/1 flag are exact in
        f32). The ONE implementation shared by the jitted eval_step and the
        deployment-parity infer_fn path (`cli eval --from-export`), so
        in-training eval and served-artifact eval can never desynchronize."""
        t = self.cfg.training
        out = nms_ops.postprocess(
            boxes, sims,
            confidence_threshold=t.confidence_threshold,
            iou_threshold=t.iou_threshold, top_k=t.top_k,
        )
        return nms_ops.pack_detections(out)

    def _act_pool_bytes(self, rows: int, qdt) -> float:
        """Device act-pool size: BLOCK_Q-padded token count x hidden size x
        element payload (bf16/f32, or int8 + one f32 scale per token). The
        ONE implementation — both the store auto-pick (_setup_act_cache)
        and the pixel-stage HBM-fit budget (_setup_pixel_stage) must agree,
        or staging could be enabled for a pool that OOMs during epoch 1."""
        from owlvit_tpu.ops.flash_attention import BLOCK_Q

        mcfg = self.model_cfg
        S = mcfg.vision.num_patches + 1
        if owlvit._attn_impl(mcfg) == "flash":
            S = ((S + BLOCK_Q - 1) // BLOCK_Q) * BLOCK_Q
        elt = 2.0 if mcfg.dtype == "bfloat16" else 4.0
        if qdt == "int8":  # int8 payload + one f32 scale per token
            elt = 1 + 4.0 / mcfg.vision.hidden_size
        return rows * S * mcfg.vision.hidden_size * elt

    def _setup_act_cache(self):
        from owlvit_tpu.data.act_cache import ActivationCache, fingerprint

        cfg, mcfg = self.cfg, self.model_cfg
        n_classes = self.n_classes
        scales = self._scales
        grad_update = self._grad_update

        qdt = cfg.training.cache_store_dtype
        if qdt not in (None, "int8"):
            raise ValueError(
                "training.cache_store_dtype must be null or 'int8', "
                f"got {qdt!r}"
            )
        compute_dtype = jnp.dtype(mcfg.dtype)

        if self._hflip:
            from owlvit_tpu.ops.augment import mirror_boxes

        def prefix_step(trainable, frozen, images, flipped: bool = False):
            params = combine_params(trainable, frozen)
            images = self._unflatten_images(images)
            if flipped:  # the pool's odd rows: prefix of the x-mirrored image
                images = images[:, :, ::-1, :]
            return owlvit.embed_prefix(params, mcfg, normalize_image(images))

        def tail_loss_update(state, acts, labels, boxes, gt_mask, flip=None):
            if flip is not None:  # augment_hflip: acts row already mirrored,
                boxes = mirror_boxes(boxes, flip)  # GT mirrors in-graph

            def loss_fn(trainable):
                params = combine_params(trainable, state.frozen)
                pb, sims = owlvit.forward_train_from_prefix(params, mcfg, acts)
                terms = loss_ops.push_pull_loss(
                    sims, pb, labels, boxes, gt_mask, n_classes, scales,
                )
                return loss_ops.total_loss(terms), terms

            return grad_update(state, loss_fn)

        if qdt:
            # import OUTSIDE the traced fns (in-trace module imports can
            # leak module-level constants as stale tracers; see augment)
            from owlvit_tpu.ops.quant import dequantize_rows, quantize_rows
        if self.mesh is not None:
            # Sharded pool: rows live on their data-parallel rank; the
            # shard-aligned sampler (run()) keeps every gather/scatter
            # rank-local — zero collectives in the steady state.
            from owlvit_tpu.parallel import local_gather, local_scatter

            mesh = self.mesh

            def pool_gather(pool, idxs):
                if qdt:
                    return dequantize_rows(
                        local_gather(pool["q"], idxs, mesh),
                        local_gather(pool["s"], idxs, mesh),
                        compute_dtype,
                    )
                return local_gather(pool, idxs, mesh)

            def scatter_acts(pool, idxs, acts):
                if qdt:
                    q, s = quantize_rows(acts)
                    return {
                        "q": local_scatter(pool["q"], idxs, q, mesh),
                        "s": local_scatter(pool["s"], idxs, s, mesh),
                    }
                return local_scatter(pool, idxs, acts, mesh)
        else:

            def pool_gather(pool, idxs):
                # one HBM-local gather replaces any host transfer
                if qdt:
                    return dequantize_rows(
                        pool["q"][idxs], pool["s"][idxs], compute_dtype
                    )
                return pool[idxs]

            def scatter_acts(pool, idxs, acts):
                if qdt:
                    q, s = quantize_rows(acts)
                    return {
                        "q": pool["q"].at[idxs].set(q),
                        "s": pool["s"].at[idxs].set(s),
                    }
                return pool.at[idxs].set(acts)

        def tail_step_gather(state, pool, idxs, labels, boxes, gt_mask,
                             flip=None):
            acts = pool_gather(pool, idxs)
            return tail_loss_update(state, acts, labels, boxes, gt_mask, flip)

        self.prefix_step = jax.jit(prefix_step, static_argnums=(3,))
        self.tail_step = jax.jit(tail_loss_update, donate_argnums=(0,))
        self.tail_step_gather = jax.jit(tail_step_gather, donate_argnums=(0,))
        self.scatter_acts = jax.jit(scatter_acts, donate_argnums=(0,))
        # raw (unjitted) pieces, composed by the staged device-epoch step
        self._pool_gather_raw = pool_gather
        self._tail_loss_update_raw = tail_loss_update
        # Split gather: run the pool gather as its OWN one-op program and
        # feed the tail step directly. The gather itself is ~0.1 ms (r3
        # gatherprobe); the fused tail_step_gather pays ~6 ms/step at b32
        # just for CARRYING the multi-GB pool argument through the big
        # graph. Costs one extra dispatch. OWLVIT_SPLIT_GATHER=0 restores
        # the fused step.
        self.pool_gather = jax.jit(pool_gather)
        # auto: split for deep models — the monolithic pool-gather step at
        # L/14 (2 GB pool argument beside the 24-layer tail grads) faults
        # the r5-era relay deterministically (3/3, bench_cached.py:131)
        # where it measured fine in r3; at B/16 split vs fused is noise
        # (381.2 vs 381.7 img/s, BENCH.md r5). OWLVIT_SPLIT_GATHER=0/1
        # forces either structure.
        _sg = os.environ.get("OWLVIT_SPLIT_GATHER", "auto")
        self._split_gather = (
            self.model_cfg.vision.num_layers > 12 if _sg == "auto"
            else _sg == "1"
        )
        self._cache_qdt = qdt

        # --- store backend ---------------------------------------------------
        t, m = cfg.training, cfg.model
        store = t.cache_backbone_store
        if store not in ("auto", "device", "disk"):
            raise ValueError(
                f"training.cache_backbone_store must be auto|device|disk, got {store!r}"
            )
        if (
            self.mesh is not None
            and store != "disk"
            and len(self.train_ds) % t.mesh_data != 0
        ):
            # The sharded pool owns rows contiguously per rank; a dataset
            # that does not divide by mesh_data would drop the remainder
            # from EVERY epoch under the aligned sampler — use the disk
            # store instead (it shards naturally through the batch put).
            store = "disk"
            print(
                f"cache_backbone: {len(self.train_ds)} images do not divide "
                f"by mesh_data={t.mesh_data} -> disk store", flush=True,
            )
        if store == "auto":
            rows = (2 if self._hflip else 1) * len(self.train_ds)
            total = self._act_pool_bytes(rows, qdt)
            # 10 GB leaves ~5 GB of v5e HBM for params/opt/activations; the
            # reference recipe (2500 imgs, B/16 bf16: 9.34 GB) fits on-device.
            store = "device" if total <= 10e9 else "disk"
        if qdt and store != "device":
            raise ValueError(
                f"training.cache_store_dtype={qdt!r} only applies to the "
                f"device pool, but the store resolved to {store!r} (the disk "
                "memmap already persists at the activation dtype; if 'auto' "
                "picked disk, the set exceeds HBM even quantized)"
            )
        if self._hflip and store == "disk":
            raise ValueError(
                "training.augment_hflip with cache_backbone requires the "
                "device store (two pool rows per image, selected per step); "
                f"the store resolved to 'disk'. Shrink the set, use "
                "cache_store_dtype: int8 (halves the pool), or drop hflip."
            )
        self.act_store = store
        self._acts_dev = None  # [rows, S_pad, D] device array (device store)
        # hflip: rows 2i (as-is) / 2i+1 (x-mirrored) — interleaving keeps a
        # sharded pool's gathers rank-local under shard_aligned_batches
        self._pool_rows = (2 if self._hflip else 1) * len(self.train_ds)
        self._acts_filled = np.zeros((self._pool_rows,), bool)

        self.act_cache = None
        if store == "disk":
            if m.params_npz:
                st = os.stat(m.params_npz)
                src = f"npz:{m.params_npz}:{st.st_size}:{int(st.st_mtime)}"
            else:
                src = f"random:{t.seed}"
            # Image CONTENT identity, not just annotation keys: regenerated
            # synthetic data (different training.seed, same paths) or
            # replaced/edited images must invalidate the cache, or the tail
            # would train on stale activations (ADVICE r2, medium). Per-image
            # (size, mtime) stat is cheap (~ms for 2500 files) and catches
            # any rewrite; training.seed covers in-place regeneration whose
            # mtime granularity might miss a same-second rewrite.
            img_ids = []
            for key, _ in self.train_ds.items:
                path = os.path.join(
                    cfg.data.images_path, os.path.basename(key)
                )
                try:
                    st_i = os.stat(path)
                    img_ids.append((key, st_i.st_size, int(st_i.st_mtime)))
                except OSError:
                    img_ids.append((key, -1, -1))
            fp = fingerprint(
                {
                    "params": src,
                    "model": m.name,
                    "dtype": m.dtype,
                    "trainable_last_k": m.trainable_last_k,
                    # env knobs change the prefix numerics too (vit.py reads
                    # them at trace time) — a stale cache must not survive an
                    # A/B flip of either
                    "quant_backbone": mcfg.quant_backbone
                    or os.environ.get("OWLVIT_QUANT_BACKBONE") == "1",
                    "fast_softmax": os.environ.get("OWLVIT_FAST_SOFTMAX", "0"),
                    # resolved value, not the raw env — and "" whenever the
                    # model config keeps static_softmax off (trainers always
                    # do since r5: static-max kernels fault grad-bearing
                    # processes, BENCH.md r4d). Caches built under the r4
                    # static default are invalidated by the flip to "".
                    "static_max": (
                        _resolved_static_max(m.dtype)
                        if mcfg.static_softmax else ""
                    ),
                    "attention_impl": owlvit._attn_impl(mcfg),
                    "seed": t.seed,
                    "dataset": img_ids,
                }
            )
            # workdir, not the dataset dir: annotations often live on
            # read-only mounts, and the cache is an artifact of THIS run
            # config (the fingerprint pins dataset identity)
            base = os.path.join(self.workdir, f"backbone_{m.name}")
            self.act_cache = ActivationCache(base, len(self.train_ds), fp)

    def _init_pool(self, shape, act_dtype):
        """Zero-init the device activation pool ([N, S, D] at the activation
        dtype, or {"q": int8 [N, S, D], "s": f32 [N, S]} under
        cache_store_dtype=int8), row-sharded over "data" on a mesh. A zeros
        pool + scatter of computed rows is the relay-safe fill pattern
        (BENCH.md r3: a tile+slice fill transient faulted the chip)."""
        if self._cache_qdt == "int8":
            mk = lambda: {  # noqa: E731
                "q": jnp.zeros(shape, jnp.int8),
                "s": jnp.zeros(shape[:-1], jnp.float32),
            }
        else:
            mk = lambda: jnp.zeros(shape, act_dtype)  # noqa: E731
        if self.mesh is None:
            return mk()
        from jax.sharding import NamedSharding, PartitionSpec

        row = lambda nd: NamedSharding(  # noqa: E731
            self.mesh, PartitionSpec("data", *([None] * (nd - 1)))
        )
        sharding = jax.tree.map(lambda x: row(x.ndim), jax.eval_shape(mk))
        return jax.jit(mk, out_shardings=sharding)()

    # -------------------------------------------------- pixel pre-stage pools

    def _setup_pixel_stage(self):
        """Resolve training.stage_pixels and build the device gather programs.

        The reference streams pixels host->device every step through torch
        DataLoader workers (reference src/dataset.py:101-106). On the TPU
        relay that per-step transfer is the epoch-1 bottleneck AND a fault
        hazard (an overlapped transfer runs ~100x slower; a mis-ordered put
        flips the process into permanent degraded-put mode — BENCH.md
        r4b/r4d). Pre-staging moves ALL image bytes in a few settled
        idle-time puts into a [N, S*S*3] uint8 device pool (+ tiny GT pools),
        and every training batch is then assembled ON DEVICE by one gather
        program: the steady state issues zero host->device image transfers.
        """
        t = self.cfg.training
        v = str(t.stage_pixels).strip().lower()
        if v in ("off", "false", "0", "none", ""):
            mode = "off"
        elif v in ("on", "true", "1"):
            mode = "on"
        elif v == "auto":
            mode = "auto"
        else:
            raise ValueError(
                f"training.stage_pixels must be auto|on|off, got {t.stage_pixels!r}"
            )
        self._stage_on = False
        self._pix_train = None  # {"image","labels","boxes","gt_mask"} pools
        self._pix_test = None  # [N_pad, S*S*3] uint8 (GT stays host-side)
        if mode == "off":
            return

        n = len(self.train_ds)
        mesh_ok = self.mesh is None or n % t.mesh_data == 0
        if mode == "on" and not mesh_ok:
            raise ValueError(
                f"training.stage_pixels=on with mesh_data={t.mesh_data}: the "
                f"sharded pixel pool owns rows contiguously per rank, so the "
                f"train set ({n} images) must divide by mesh_data"
            )

        S = self.model_cfg.vision.image_size
        pix_bytes = (n + len(self.test_ds)) * S * S * 3
        act_bytes = 0
        if (
            t.cache_backbone
            and getattr(self, "act_store", None) == "device"
        ):
            act_bytes = self._act_pool_bytes(self._pool_rows, self._cache_qdt)
        if mode == "auto":
            # pixels coexist with the activation pool only during epoch 1
            # (the pixel pool is freed once every act row is filled); 14 GB
            # of the chip's ~16 GB leaves headroom for params/opt/working
            # set. The bf16 2500-image B/16 recipe (9.3 GB acts + 4.4 GB
            # pixels) fits; cache_store_dtype: int8 halves the act side.
            fits = pix_bytes + act_bytes <= 14e9
            on_tpu = False
            try:
                on_tpu = jax.default_backend() in ("tpu", "axon")
            except Exception:  # noqa: BLE001
                pass
            if not (fits and on_tpu and mesh_ok):
                return

        mesh = self.mesh
        if mesh is not None and self._shard_aligned_order():
            from owlvit_tpu.parallel import local_gather

            def gather_rows(pool, idxs):
                return local_gather(pool, idxs, mesh)
        elif mesh is not None:
            # plain-shuffle order (uncached, or a disk act store): the
            # sampler is NOT shard-aligned here (see _shard_aligned_order),
            # and local_gather's rank-local addressing would silently read
            # wrong rows — use the global GSPMD gather, constrained to the
            # batch-axis sharding so the train step sees exactly the layout
            # a streamed put produces (staged == streamed bitwise)
            from jax.sharding import NamedSharding, PartitionSpec

            def gather_rows(pool, idxs):
                sh = NamedSharding(
                    mesh, PartitionSpec("data", *([None] * (pool.ndim - 1)))
                )
                return jax.lax.with_sharding_constraint(pool[idxs], sh)
        else:

            def gather_rows(pool, idxs):
                return pool[idxs]

        def gather_batch(pools, idxs, with_image):
            out = {
                k: gather_rows(pools[k], idxs)
                for k in ("labels", "boxes", "gt_mask")
            }
            if with_image:
                out["image"] = gather_rows(pools["image"], idxs)
            return out

        self._gather_batch = jax.jit(gather_batch, static_argnums=(2,))
        # eval indices are not shard-aligned — plain GSPMD gather
        self._gather_eval = jax.jit(lambda pool, idxs: pool[idxs])
        self._stage_on = True

        # --- RPC-minimal device-epoch steps -------------------------------
        # Every relay RPC costs ~25-150 ms and a mis-ordered one can flip
        # the process into degraded-put mode, so the steady-state epoch is
        # driven with the step counter ON DEVICE: the epoch's whole index
        # order (and hflip bits) pre-stage as ONE settled put, each step
        # slices its row with state.step % steps_per_epoch, and the loss
        # terms accumulate into a device [4] vector fetched ONCE per epoch.
        # Per step the host issues exactly one exec dispatch.
        hflip = self._hflip

        def _row(mat, step, spe):
            i = (step % spe).astype(jnp.int32)
            return jax.lax.dynamic_index_in_dim(mat, i, 0, keepdims=False)

        def epoch_step_uncached(state, pools, rows, flips, acc):
            idx = _row(rows, state.step, rows.shape[0])
            batch = gather_batch(pools, idx, True)
            if flips is not None:
                batch["flip"] = _row(flips, state.step, flips.shape[0])
            state, packed = self._train_step_raw(state, batch)
            return state, acc + packed

        self._epoch_step_uncached = jax.jit(
            epoch_step_uncached, donate_argnums=(0, 4)
        )
        self._epoch_step_cached = None
        if t.cache_backbone:
            pool_gather = self._pool_gather_raw
            tail_update = self._tail_loss_update_raw

            def epoch_step_cached(state, pools, acts_pool, rows, flips, acc):
                idx = _row(rows, state.step, rows.shape[0])
                gt = gather_batch(pools, idx, False)
                flip = None
                prow = idx
                if hflip:
                    flip = _row(flips, state.step, flips.shape[0])
                    prow = 2 * idx + flip.astype(idx.dtype)
                acts = pool_gather(acts_pool, prow)
                state, packed = tail_update(
                    state, acts, gt["labels"], gt["boxes"], gt["gt_mask"],
                    flip,
                )
                return state, acc + packed

            self._epoch_step_cached = jax.jit(
                epoch_step_cached, donate_argnums=(0, 5)
            )

    def _zeros_pool(self, shape, dtype):
        """Device zeros, row-sharded over "data" on a mesh (the relay-safe
        fill pattern: zeros + scatter of computed rows — see _init_pool)."""
        if self.mesh is None:
            return jnp.zeros(shape, dtype)
        from jax.sharding import NamedSharding, PartitionSpec

        sh = NamedSharding(
            self.mesh, PartitionSpec("data", *([None] * (len(shape) - 1)))
        )
        return jax.jit(lambda: jnp.zeros(shape, dtype), out_shardings=sh)()

    def _stage_fill_pixels(self, ds, n_rows):
        """Decode the whole set and fill a [n_rows, S*S*3] uint8 device pool
        in <=64 MB settled puts (single transfers up to 128 MB are safe on
        the relay; every put AND the scatter exec settle before the next RPC
        — BENCH.md r4d). Returns the pixel pool device array."""
        S = self.model_cfg.vision.image_size
        n = len(ds)
        rowb = S * S * 3
        pool = self._zeros_pool((n_rows, rowb), jnp.uint8)
        chunk = max(1, min(n, int(64e6 // rowb)))
        upd = jax.jit(
            lambda p, c, lo: jax.lax.dynamic_update_slice(p, c, (lo, 0)),
            donate_argnums=(0,),
        )
        host = np.empty((chunk, rowb), np.uint8)
        lo = 0
        while lo < n:
            start = min(lo, n - chunk)  # uniform chunk shape: one compile
            samples = ds.load_batch(range(start, start + chunk))
            for j, s in enumerate(samples):
                host[j] = s["image"].reshape(-1)
            dev = jax.block_until_ready(jnp.asarray(host))
            pool = jax.block_until_ready(upd(pool, dev, np.int32(start)))
            lo = start + chunk
        return pool

    def _ensure_staged_train(self):
        if self._pix_train is not None or not self._stage_on:
            return
        t0 = time.perf_counter()
        n = len(self.train_ds)
        pool = self._stage_fill_pixels(self.train_ds, n)
        G = self.train_ds.max_gt
        labels = np.zeros((n, G), np.int32)
        boxes = np.zeros((n, G, 4), np.float32)
        mask = np.zeros((n, G), bool)
        for i, s in enumerate(self.train_ds.load_batch(range(n),
                                                       with_images=False)):
            labels[i], boxes[i], mask[i] = s["labels"], s["boxes"], s["gt_mask"]
        put = self._batch_put() or jax.device_put
        self._pix_train = {
            "image": pool,
            "labels": jax.block_until_ready(put(labels)),
            "boxes": jax.block_until_ready(put(boxes)),
            "gt_mask": jax.block_until_ready(put(mask)),
        }
        mb = pool.nbytes / 1e6
        print(
            f"pixel pre-stage: {n} train images ({mb:.0f} MB uint8) device-"
            f"resident in {time.perf_counter() - t0:.1f}s — zero per-step "
            "image H2D from here",
            flush=True,
        )
        # the (small) eval pool fills in the same pre-first-fetch window:
        # puts issued later in the process risk the degraded-put mode
        self._ensure_staged_eval()

    def _ensure_staged_eval(self):
        if self._pix_test is not None or not self._stage_on:
            return
        n = len(self.test_ds)
        dp = self.cfg.training.mesh_data if self.mesh is not None else 1
        n_pad = ((n + dp - 1) // dp) * dp  # rows shard evenly; pads unused
        self._pix_test = self._stage_fill_pixels(self.test_ds, n_pad)

    def _steps_per_epoch_micro(self) -> int:
        """Train batches (micro-steps) per epoch for the ACTIVE sampler:
        the shard-aligned sampler drops the per-shard ragged remainder,
        the plain shuffle the global one. state.step advances by exactly
        this much per epoch (grad_accum does not change it — MultiSteps
        counts micro-steps too), which is what resume arithmetic needs."""
        t = self.cfg.training
        n = len(self.train_ds)
        if self._shard_aligned_order():
            dp = t.mesh_data
            return max(1, (n // dp) // max(1, t.batch_size // dp))
        return max(1, n // t.batch_size)

    def _shard_aligned_order(self) -> bool:
        """One condition for BOTH the staged and streamed samplers: the
        shard-aligned batch order exists for rank-local gathers into the
        dp-sharded device ACT pool; everywhere else the plain per-epoch
        shuffle keeps two stronger invariants — staged == streamed AND
        dp == single-device — trajectory-identical (mesh+uncached staged
        pays cross-shard pixel gathers, which GSPMD handles)."""
        t = self.cfg.training
        return (
            self.mesh is not None
            and t.cache_backbone
            and getattr(self, "act_store", None) == "device"
        )

    def _staged_index_matrix(self, epoch) -> np.ndarray:
        """[steps_per_epoch, batch_size] int32 — the epoch's batch order,
        identical to what batch_iterator + the streamed path would run
        (plain per-epoch shuffle, ragged remainder dropped; shard-aligned
        layout only where the streamed path uses it too)."""
        t = self.cfg.training
        n = len(self.train_ds)
        if self._shard_aligned_order():
            from owlvit_tpu.parallel import shard_aligned_batches

            rows = list(shard_aligned_batches(
                n, t.batch_size, t.mesh_data, seed=t.seed + epoch
            ))
        else:
            order = np.arange(n)
            np.random.default_rng(t.seed + epoch).shuffle(order)
            rows = [
                order[s : s + t.batch_size]
                for s in range(0, n - n % t.batch_size, t.batch_size)
            ]
        return np.asarray(rows, np.int32)

    def _staged_train_iter(self, epoch):
        """One epoch of device-assembled batches: same order/GT/semantics as
        batch_iterator + prefetch_to_device, but every array in the yielded
        batch is the output of one on-device gather of the staged pools."""
        want = self._want_image()
        for idxs in self._staged_index_matrix(epoch):
            idxs = np.asarray(idxs, np.int64)
            # settle the (tiny) index put before dispatching the gather: an
            # RPC over an in-flight put risks degraded-put mode (BENCH r4d)
            jidx = jax.block_until_ready(jnp.asarray(idxs))
            with_img = True if want is None else bool(want(idxs))
            batch = dict(self._gather_batch(self._pix_train, jidx, with_img))
            batch["indices"] = idxs
            yield batch

    def _epoch_device_ready(self) -> bool:
        """True when the whole epoch can run in RPC-minimal device mode: the
        pools are staged and no per-step host bookkeeping remains (uncached,
        or a fully-built device act cache)."""
        if not self._stage_on or self._pix_train is None:
            return False
        t = self.cfg.training
        if not t.cache_backbone:
            # same deep-model routing as _split_gather: the uncached epoch
            # step carries the multi-GB pixel pool through a grad-bearing
            # program — the structure class that faults the r5-era relay at
            # L/14 (2 GB pool arg beside 24-layer tail grads, 3/3); deep
            # models run the per-batch split gathers instead
            return self.model_cfg.vision.num_layers <= 12
        return (
            getattr(self, "act_store", None) == "device"
            and self._epoch_step_cached is not None
            and self._acts_filled.all()
            # the composed epoch step carries the whole act pool through
            # the tail-grad program — the exact structure split routing
            # exists to avoid (r5-era L/14 fault); fall back to per-batch
            # split steps when split is active
            and not self._split_gather
        )

    def _run_epoch_device(self, epoch) -> dict:
        """One steady-state epoch, RPC-minimal: stage the epoch's index
        order (and hflip bits) in one settled put, dispatch every step
        back-to-back (the step counter lives in state.step ON DEVICE), and
        fetch the accumulated loss terms once at the end. Per-step host
        cost: one exec dispatch — no put, no fetch. Returns the epoch's
        mean loss terms (what LossAccumulator would have produced)."""
        t = self.cfg.training
        rows = self._staged_index_matrix(epoch)
        spe = rows.shape[0]
        rows_dev = jax.block_until_ready(jnp.asarray(rows))
        flips_dev = None
        if self._hflip:
            # same Philox bits the per-step path would draw (keyed by the
            # batch counter, which advances once per step below)
            flips = np.stack([
                np.random.Generator(
                    np.random.Philox(
                        key=[t.seed, self._batches_done + i]
                    )
                ).random(rows.shape[1]) < 0.5
                for i in range(spe)
            ])
            flips_dev = jax.block_until_ready(jnp.asarray(flips))
        acc = jnp.zeros((len(_TERM_KEYS),), jnp.float32)
        accum = max(1, t.grad_accum)
        for _ in range(spe):
            if t.cache_backbone:
                self.state, acc = self._epoch_step_cached(
                    self.state, self._pix_train, self._acts_dev,
                    rows_dev, flips_dev, acc,
                )
            else:
                self.state, acc = self._epoch_step_uncached(
                    self.state, self._pix_train, rows_dev, flips_dev, acc,
                )
            self._batches_done += 1
            if self._ema_step is not None and self._batches_done % accum == 0:
                self.ema = self._ema_step(self.ema, self.state.trainable)
        means = np.asarray(jax.block_until_ready(acc)) / max(1, spe)
        return dict(zip(_TERM_KEYS, means.tolist()))

    def _train_one_batch(self, batch) -> dict:
        """One optimizer step (+ EMA track); routes via _train_one_batch_impl.
        Returns {term: float} — unpacked from the step's packed [4] vector
        with ONE device read (see grad_update)."""
        packed = self._train_one_batch_impl(batch)
        terms = dict(zip(_TERM_KEYS, np.asarray(packed).tolist()))
        self._batches_done += 1
        accum = max(1, self.cfg.training.grad_accum)
        # update only on optimizer-update boundaries: under MultiSteps the
        # params change every `accum` micro-steps; averaging the unchanged
        # params in between would just distort the effective decay.
        if self._ema_step is not None and self._batches_done % accum == 0:
            self.ema = self._ema_step(self.ema, self.state.trainable)
        return terms

    def _sample_flips(self, n: int) -> np.ndarray:
        """Per-step hflip decisions (training.augment_hflip): host-side
        Philox keyed by (seed, batch counter) — deterministic per config,
        and shared bits between the pool-row choice and the in-graph box
        mirror (the cached and uncached paths flip identically)."""
        rng = np.random.Generator(
            np.random.Philox(
                key=[self.cfg.training.seed, self._batches_done]
            )
        )
        return rng.random(n) < 0.5

    def _train_one_batch_impl(self, batch) -> dict:
        """One optimizer step; routes through the activation cache if on."""
        if not self.cfg.training.cache_backbone:
            batch.pop("indices", None)
            if self._hflip:
                n = batch["labels"].shape[0]
                # settle EVERY put before the exec dispatch (r4d relay rule:
                # an RPC over an in-flight put can flip the process into
                # permanent degraded-put mode; tiny puts settle in ~ms)
                batch["flip"] = jax.block_until_ready(
                    jnp.asarray(self._sample_flips(n)))
            self.state, terms = self.train_step(self.state, batch)
            return terms
        idxs = np.asarray(batch.pop("indices"))
        args = (batch["labels"], batch["boxes"], batch["gt_mask"])
        flip = None
        rows = idxs
        if self._hflip:
            flip_np = self._sample_flips(len(idxs))
            rows = 2 * idxs + flip_np.astype(np.int64)
            flip = jax.block_until_ready(jnp.asarray(flip_np))  # r4d rule

        if self.act_store == "device":
            if not self._acts_filled[rows].all():
                acts = self.prefix_step(
                    self.state.trainable, self.state.frozen, batch["image"]
                )
                if self._acts_dev is None:
                    shape = (self._pool_rows,) + acts.shape[1:]
                    self._acts_dev = self._init_pool(shape, acts.dtype)
                if self._hflip:
                    # fill BOTH variants from the one transferred batch
                    acts_f = self.prefix_step(
                        self.state.trainable, self.state.frozen,
                        batch["image"], True,
                    )
                    # settled index puts before each scatter exec (r4d)
                    r0 = jax.block_until_ready(jnp.asarray(2 * idxs))
                    r1 = jax.block_until_ready(jnp.asarray(2 * idxs + 1))
                    self._acts_dev = self.scatter_acts(
                        self._acts_dev, r0, acts
                    )
                    self._acts_dev = self.scatter_acts(
                        self._acts_dev, r1, acts_f
                    )
                    self._acts_filled[2 * idxs] = True
                    self._acts_filled[2 * idxs + 1] = True
                    # fall through to the gather path: both rows now filled
                else:
                    self._acts_dev = self.scatter_acts(
                        self._acts_dev,
                        jax.block_until_ready(jnp.asarray(idxs)), acts
                    )
                    self._acts_filled[idxs] = True
                    # acts already in hand — skip the gather
                    self.state, terms = self.tail_step(
                        self.state, acts, *args, None
                    )
                    return terms
            jidx = jax.block_until_ready(jnp.asarray(rows))  # r4d rule
            if self._split_gather:
                acts = self.pool_gather(self._acts_dev, jidx)
                self.state, terms = self.tail_step(
                    self.state, acts, *args, flip
                )
            else:
                self.state, terms = self.tail_step_gather(
                    self.state, self._acts_dev, jidx, *args, flip
                )
            return terms

        # disk store
        if "acts" in batch:  # cache hit resolved on the host side
            # explicit settled put (r4d rule) — passing host numpy straight
            # into the jitted tail would transfer it inside the exec dispatch
            acts = jax.block_until_ready(jnp.asarray(batch["acts"]))
        else:
            acts = self.prefix_step(
                self.state.trainable, self.state.frozen, batch["image"]
            )
            self.act_cache.write(idxs, jax.device_get(acts))
        self.state, terms = self.tail_step(self.state, acts, *args)
        return terms

    def _want_image(self):
        """batch_iterator callback: skip image decode AND transfer entirely
        for batches whose activations are already cached (the cache makes
        pixels dead weight — this is where the host-decode and the
        56 MB/step H2D savings of a cached epoch actually come from)."""
        if not self.cfg.training.cache_backbone:
            return None
        if self.act_store == "device":
            if self._hflip:  # pixels needed until BOTH pool rows are filled
                return lambda idxs: not (
                    self._acts_filled[2 * np.asarray(idxs)].all()
                    and self._acts_filled[2 * np.asarray(idxs) + 1].all()
                )
            return lambda idxs: not self._acts_filled[np.asarray(idxs)].all()
        return lambda idxs: not self.act_cache.has(idxs)

    def _with_cached_acts(self, it):
        """Host-side (disk store): attach cached activations when available
        (the image was already skipped at assembly by _want_image)."""
        for batch in it:
            if self.act_cache.has(batch["indices"]):
                batch["acts"] = self.act_cache.read(batch["indices"])
                batch.pop("image", None)
            yield batch

    def _batch_put(self):
        """Transfer fn for input batches: plain device_put single-device,
        batch-axis NamedSharding put on a mesh."""
        if self.mesh is None:
            return None
        from jax.sharding import NamedSharding, PartitionSpec

        sh = NamedSharding(self.mesh, PartitionSpec("data"))
        return lambda v: jax.device_put(v, sh)

    def _lr_schedule(self):
        """Learning-rate schedule from config. "constant" (the reference's
        fixed AdamW lr, main.py:56-60) or "cosine" decay to lr_final, both
        with optional linear warmup. Returns a float or an optax schedule."""
        t = self.cfg.training
        if t.lr_schedule not in ("constant", "cosine"):
            raise ValueError(
                f"training.lr_schedule must be constant|cosine, got {t.lr_schedule!r}"
            )
        if t.lr_schedule == "constant" and not t.warmup_steps:
            return t.learning_rate
        n = len(self.train_ds)
        if t.cache_backbone and t.mesh_data > 1 and n % t.mesh_data == 0:
            # the shard-aligned sampler (run()) drops the PER-SHARD ragged
            # remainder, not the global one: steps = (n/dp) // (B/dp), which
            # can undershoot n // B — use the actual count so cosine decay
            # reaches lr_final on the last real step (ADVICE r2). If the
            # store falls back to disk the plain sampler runs instead; the
            # counts differ by at most one step per epoch there.
            dp = t.mesh_data
            steps_per_epoch = max(1, (n // dp) // max(1, t.batch_size // dp))
        else:
            steps_per_epoch = max(1, n // t.batch_size)
        # MultiSteps advances the inner adamw schedule once per COMPLETED
        # accumulation, so schedule steps count optimizer updates, not
        # micro-steps.
        steps_per_epoch = max(1, steps_per_epoch // max(1, t.grad_accum))
        total = max(t.n_epochs * steps_per_epoch, t.warmup_steps + 1)
        if t.lr_schedule == "constant":
            return optax.join_schedules(
                [
                    optax.linear_schedule(0.0, t.learning_rate, t.warmup_steps),
                    optax.constant_schedule(t.learning_rate),
                ],
                [t.warmup_steps],
            )
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=t.learning_rate,
            warmup_steps=t.warmup_steps,
            decay_steps=total,
            end_value=t.lr_final,
        )

    def _build_query_bank(self, params) -> jnp.ndarray:
        """CLIP-text-encode 3 prompts per class (reference models.py:155-171)."""
        m = self.cfg.model
        if bool(m.clip_vocab) != bool(m.clip_merges):
            raise ValueError(
                "model.clip_vocab and model.clip_merges must be set together "
                f"(got clip_vocab={m.clip_vocab!r}, clip_merges={m.clip_merges!r})"
            )
        if m.clip_vocab and m.clip_merges:
            tok = CLIPTokenizer(m.clip_vocab, m.clip_merges,
                                max_len=self.model_cfg.text.max_len)
        else:
            if m.params_npz:
                # A real converted checkpoint with a fake tokenizer would
                # silently produce a garbage query bank (VERDICT r1 missing
                # #2) — refuse. scripts/fetch_assets.py downloads the vocab.
                raise ValueError(
                    "model.params_npz is set (real checkpoint) but "
                    "model.clip_vocab/clip_merges are not: the fallback "
                    "HashTokenizer would build a meaningless query bank. "
                    "Provide the real CLIP BPE assets (see "
                    "scripts/fetch_assets.py) or unset params_npz."
                )
            tok = HashTokenizer(self.model_cfg.text.vocab_size,
                                max_len=self.model_cfg.text.max_len)
        enc = tok(build_prompts(self.labelmap))
        return owlvit.build_query_bank(
            params, self.model_cfg,
            jnp.asarray(enc["input_ids"]), jnp.asarray(enc["attention_mask"]),
        )

    # ------------------------------------------------------------------- train

    def run(self) -> dict:
        t = self.cfg.training
        logger = (
            JSONLLogger(os.path.join(self.workdir, t.log_file))
            if t.log_file
            else None
        )
        acc = LossAccumulator()
        progress = ProgressFormatter()
        class_maps = {name: [] for name in self.labelmap.values()}
        last_val = {}
        tb = None
        if t.tensorboard_dir:
            from owlvit_tpu.utils.tb_writer import TBWriter

            tb = TBWriter(os.path.join(self.workdir, t.tensorboard_dir))
        if t.keep_best and not t.checkpoint_dir:
            raise ValueError(
                "training.keep_best requires training.checkpoint_dir"
            )
        best_map = -1.0
        evals_since_best = 0

        if len(self.train_ds) < t.batch_size:
            raise ValueError(
                f"training.batch_size={t.batch_size} exceeds the train set "
                f"({len(self.train_ds)} images) — every epoch would drop the "
                f"ragged remainder and train on nothing"
            )

        if self._stage_on:
            self._ensure_staged_train()

        # Resume semantics: a restored checkpoint at step k*spe means k
        # epochs are DONE — continue to n_epochs total, don't retrain from
        # epoch 0 (which would also replay the per-epoch shuffle seeds and
        # run the restored cosine schedule entirely in its decayed tail).
        # _batches_done picks up the global micro-step count so the EMA
        # accumulation-boundary gate stays aligned with MultiSteps' restored
        # inner counter and the hflip Philox stream continues where it left.
        spe = self._steps_per_epoch_micro()
        start_epoch = min(int(self.state.step) // spe, t.n_epochs)
        self._batches_done = int(self.state.step)
        if start_epoch:
            print(
                f"resume: {start_epoch}/{t.n_epochs} epoch(s) already "
                f"complete at step {int(self.state.step)} — "
                + ("nothing left to train; running eval"
                   if start_epoch >= t.n_epochs else
                   f"continuing from epoch {start_epoch}"),
                flush=True,
            )
        if start_epoch >= t.n_epochs:
            last_val = self.evaluate(epoch=t.n_epochs - 1)

        profiling = None
        for epoch in range(start_epoch, t.n_epochs):
            acc.reset()
            ep_t0 = time.perf_counter()
            if self._epoch_device_ready() and not (
                t.profile_dir and epoch == 0  # profiling needs per-step hooks
            ):
                # RPC-minimal steady state: one put (index order), dispatch
                # every step, one fetch (accumulated terms) — see
                # _run_epoch_device
                acc.update(self._run_epoch_device(epoch))
                batches = ()
            elif self._stage_on and self._pix_train is not None:
                # device-assembled batches from the staged pools (identical
                # order + numerics to the streamed path; zero image H2D)
                batches = self._staged_train_iter(epoch)
                if self.act_cache is not None:
                    batches = self._with_cached_acts(batches)
            else:
                index_batches = None
                if self._shard_aligned_order():
                    # keep gathers/scatters into the sharded pool rank-local
                    from owlvit_tpu.parallel import shard_aligned_batches

                    index_batches = shard_aligned_batches(
                        len(self.train_ds), t.batch_size, t.mesh_data,
                        seed=t.seed + epoch,
                    )
                it = batch_iterator(
                    self.train_ds, t.batch_size,
                    shuffle=True, seed=t.seed + epoch, pad_final=False,
                    index_batches=index_batches,
                    want_image=self._want_image(),
                )
                if self.act_cache is not None:  # disk store host-side swap
                    it = self._with_cached_acts(it)
                batches = prefetch_to_device(
                    it, put=self._batch_put(),
                    # metadata the train step never reads — keep off-device
                    # (each put is a relay RPC)
                    host_keys=("image_valid", "width", "height"),
                )
            for step_i, batch in enumerate(batches):
                batch.pop("paths", None)
                batch.pop("image_valid", None)
                batch.pop("width", None)
                batch.pop("height", None)
                if t.profile_dir and epoch == 0 and step_i == 1:
                    # skip step 0 (compile); trace the next profile_steps
                    jax.profiler.start_trace(t.profile_dir)
                    profiling = True
                terms = self._train_one_batch(batch)
                acc.update({k: float(v) for k, v in terms.items()})
                if profiling and step_i >= t.profile_steps:
                    jax.block_until_ready(self.state.step)
                    jax.profiler.stop_trace()
                    profiling = None
                    print(f"profiler trace: {t.profile_dir}", flush=True)

            if profiling:  # epoch shorter than profile_steps: don't leak the trace
                jax.block_until_ready(self.state.step)
                jax.profiler.stop_trace()
                profiling = None
                print(f"profiler trace (short epoch): {t.profile_dir}", flush=True)

            if (
                self._pix_train is not None
                and t.cache_backbone
                and getattr(self, "act_store", None) == "device"
                and self._acts_filled.all()
            ):
                # every activation row is cached: the pixels are dead weight
                # from here — free the image pool's HBM before the eval epoch
                # (the tiny GT pools stay: cached epochs gather them)
                self._pix_train.pop("image", None)

            # training wall for this epoch (pre-eval): every path above is
            # host-blocked by its final terms fetch, so this is honest.
            # The console table rounds to seconds — steady cached epochs are
            # sub-second, so the JSONL row is the measurable record.
            epoch_train_secs = time.perf_counter() - ep_t0
            epoch_imgs = (len(self.train_ds) // t.batch_size) * t.batch_size

            train_metrics = acc.means()
            run_eval = (
                (epoch + 1) % max(1, t.eval_every_epochs) == 0
                or epoch == t.n_epochs - 1
            )
            val_metrics = self.evaluate(epoch=epoch) if run_eval else {}
            if run_eval:
                last_val = val_metrics
                for i, name in sorted(self.labelmap.items()):
                    class_maps[name].append(
                        float(val_metrics["map_per_class"][i])
                    )
                with open(
                    os.path.join(self.workdir, "class_maps.json"), "w"
                ) as f:
                    json.dump(class_maps, f)

            improved = False
            if run_eval:
                m = float(val_metrics.get("map", 0.0))
                if m > best_map:
                    best_map, evals_since_best, improved = m, 0, True
                else:
                    evals_since_best += 1

            progress.update(epoch, train_metrics, val_metrics)
            progress.print()
            if logger:
                logger.log(
                    dict(epoch=epoch, step=int(self.state.step),
                         # note: NOT train_-prefixed — several equivalence
                         # tests compare all train_* keys across runs, and
                         # wall-clock fields must stay out of that set
                         epoch_train_secs=round(epoch_train_secs, 4),
                         epoch_imgs_per_sec=round(
                             epoch_imgs / max(epoch_train_secs, 1e-9), 2),
                         **{f"train_{k}": v for k, v in train_metrics.items()},
                         **{f"val_{k}": v for k, v in val_metrics.items()
                            if not k.endswith("per_class")})
                )
            if tb:
                tb.scalars(train_metrics, epoch, prefix="train/")
                if run_eval:
                    tb.scalars(val_metrics, epoch, prefix="val/")
                tb.flush()
            if (
                t.checkpoint_dir
                and t.checkpoint_every_epochs > 0  # 0 = periodic saves off
                and (epoch + 1) % t.checkpoint_every_epochs == 0
            ):
                path = ckpt.save(t.checkpoint_dir, self.state)
                if self.ema is not None:
                    ckpt.save_tree(
                        t.checkpoint_dir, int(self.state.step), self.ema
                    )
                print(f"checkpoint: {path}", flush=True)
            if improved and t.keep_best:
                bdir = os.path.join(t.checkpoint_dir, "best")
                path = ckpt.save(bdir, self.state)
                if self.ema is not None:
                    ckpt.save_tree(bdir, int(self.state.step), self.ema)
                ckpt.prune_steps(bdir, int(self.state.step))
                print(f"best checkpoint (map={best_map:.4f}): {path}",
                      flush=True)
            if (
                t.early_stop_patience
                and evals_since_best >= t.early_stop_patience
            ):
                print(
                    f"early stop at epoch {epoch}: no mAP improvement in "
                    f"{evals_since_best} eval(s) (best {best_map:.4f})",
                    flush=True,
                )
                break

        if tb:
            tb.close()
        if logger:
            logger.close()
        return last_val

    # -------------------------------------------------------------------- eval

    def evaluate(self, epoch: Optional[int] = None, infer_fn=None,
                 save_detections: Optional[str] = None) -> dict:
        """Eval epoch -> COCO mAP dict.

        infer_fn: optional deployment-parity hook — a callable
        `images_u8 [B, S, S, 3] -> (boxes, sims)` (e.g. a loaded export
        artifact, train/export.py). The SAME postprocess/metric protocol
        runs on its outputs, so `cli eval --from-export` proves the served
        artifact reproduces the in-package eval.

        save_detections: optional path; writes every kept detection in
        COCO-results style ({image_id, image_path, category_id,
        category_name, bbox [x,y,w,h] absolute px, score}) so external
        tooling (e.g. pycocotools in an egress-enabled env) can re-score
        the exact predictions this eval measured. category_id is the DENSE
        0..C-1 training id (the subset builder's remapping); category_name
        is the labelmap string."""
        t = self.cfg.training
        metric = MeanAveragePrecision(self.n_classes)
        debug_dir = None
        if t.save_eval_images and epoch is not None:
            debug_dir = os.path.join(self.workdir, "debug", str(epoch))
            os.makedirs(debug_dir, exist_ok=True)

        if infer_fn is None:
            # EMA weights (when tracked and ema_eval) are what a deployment
            # would serve — eval and best-checkpoint selection use them too.
            ev_trainable = (
                self.ema
                if self.ema is not None and t.ema_eval
                else self.state.trainable
            )
            packed_fn = lambda images: self.eval_step(  # noqa: E731
                ev_trainable, self.state.frozen, images
            )
        else:
            S_img = self.model_cfg.vision.image_size

            @jax.jit
            def packed_fn(images):
                if images.ndim == 2:  # loader's flat wire -> artifact's 4-D
                    images = images.reshape(-1, S_img, S_img, 3)
                return self._postprocess_pack(*infer_fn(images))

        detections = [] if save_detections else None
        img_idx = 0
        staged = self._stage_on
        if staged:
            # the test pixels live in a device pool (one-time settled fill);
            # eval batches carry only host GT/metadata + indices, and the
            # images come from an on-device gather — zero per-batch image H2D
            self._ensure_staged_eval()
            batches = batch_iterator(
                self.test_ds, t.batch_size, shuffle=False,
                want_image=lambda idxs: False,
            )
        else:
            it = batch_iterator(self.test_ds, t.batch_size, shuffle=False)
            # Ground truth and image metadata are consumed on the host only —
            # host_keys keeps them out of the device round trip entirely (each
            # device_put / np.asarray is a separate relay RPC).
            batches = prefetch_to_device(
                it, put=self._batch_put(),
                host_keys=("image_valid", "width", "height",
                           "boxes", "labels", "gt_mask"),
            )
        for bi, batch in enumerate(batches):
            paths = batch.pop("paths", None)
            if staged:
                jidx = jax.block_until_ready(
                    jnp.asarray(np.asarray(batch["indices"], np.int64))
                )
                images = self._gather_eval(self._pix_test, jidx)
            else:
                images = batch["image"]
            # [B, K, 7] — one fetch; see eval_step's wire comment
            packed = np.asarray(packed_fn(images))
            valid_imgs = batch["image_valid"]
            widths = batch["width"]
            heights = batch["height"]
            gt_boxes = batch["boxes"]
            gt_labels = batch["labels"]
            gt_mask = batch["gt_mask"]

            for i in range(len(valid_imgs)):
                if not valid_imgs[i]:
                    continue
                w, h = float(widths[i]), float(heights[i])
                keep = packed[i, :, 6] > 0.5
                det_boxes = packed[i, keep, :4]
                det_scores = packed[i, keep, 4]
                det_classes = packed[i, keep, 5].astype(np.int32)
                scale = np.array([w, h, w, h])
                metric.update(
                    det_boxes * scale,
                    det_scores,
                    det_classes,
                    gt_boxes[i][gt_mask[i]] * scale,
                    gt_labels[i][gt_mask[i]],
                )
                if detections is not None:
                    abs_boxes = det_boxes * scale
                    for b, s, c in zip(abs_boxes, det_scores, det_classes):
                        x0, y0, x1, y1 = (float(v) for v in b)
                        detections.append({
                            "image_id": img_idx,
                            "image_path": paths[i] if paths else None,
                            "category_id": int(c),
                            "category_name": self.labelmap.get(int(c), "?"),
                            "bbox": [x0, y0, x1 - x0, y1 - y0],
                            "score": float(s),
                        })
                img_idx += 1
                if debug_dir and paths:
                    self._save_debug_image(
                        paths[i], det_boxes * scale,
                        det_classes,
                        os.path.join(debug_dir, f"{bi}_{i}.png"),
                    )
        if save_detections:
            with open(save_detections, "w") as f:
                json.dump(detections, f)
            print(f"wrote {len(detections)} detections: {save_detections}",
                  flush=True)
        return metric.compute()

    def _save_debug_image(self, src, boxes_abs, classes, out_path):
        from PIL import Image, ImageDraw

        img = Image.open(src).convert("RGB")
        draw = ImageDraw.Draw(img)
        for b, c in zip(boxes_abs, classes):
            draw.rectangle(list(map(float, b)), outline=(0, 255, 0), width=2)
            draw.text((float(b[0]), float(b[1])), self.labelmap.get(int(c), "?"),
                      fill=(0, 255, 0))
        img.save(out_path)
