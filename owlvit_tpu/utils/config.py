"""YAML config loading with validation and defaults.

The reference reads config.yaml ad-hoc in three places with no validation
(SURVEY §5.6). Here a single load_config() parses the whole file into typed
sections with defaults, unknown-key errors, and reference-compatible names
(data.*, training.*) plus the new model/runtime knobs.
"""

from __future__ import annotations

import dataclasses
import typing
from typing import Optional

import yaml


@dataclasses.dataclass
class DataConfig:
    images_path: str = ""
    annotations_file: str = ""
    train_annotations: str = "data/train.json"
    test_annotations: str = "data/test.json"
    labelmap: str = "data/labelmap.json"
    num_train_images: int = 2500
    num_test_images: int = 100
    max_gt: int = 64
    cache_resized: bool = False  # memmap cache of decoded+resized images
    native_decode: bool = True  # C++ threaded decode+resize (PIL fallback)
    synthetic_root: Optional[str] = None  # if set, generate+use synthetic data
    synthetic_classes: int = 4


@dataclasses.dataclass
class TrainingConfig:
    n_epochs: int = 20
    learning_rate: float = 3e-6
    # "constant" matches the reference (fixed AdamW lr, main.py:56-60);
    # "cosine" decays to lr_final over the run after warmup_steps of linear
    # warmup (warmup also applies to "constant").
    lr_schedule: str = "constant"
    warmup_steps: int = 0
    lr_final: float = 0.0
    weight_decay: float = 0.1
    batch_size: int = 1
    use_class_weight: bool = True
    confidence_threshold: float = 0.01
    iou_threshold: float = 0.6
    save_eval_images: bool = False
    seed: int = 0
    checkpoint_dir: Optional[str] = None
    checkpoint_every_epochs: int = 1
    # Run the val-set eval (mAP epoch) every N epochs. Default 1 matches the
    # reference (main.py evaluates after every train epoch); the final epoch
    # always evaluates. Raising this speeds recipes whose cached tail epochs
    # are shorter than the eval pass (e.g. the L/14 cached fine-tune).
    eval_every_epochs: int = 1
    log_file: Optional[str] = "metrics.jsonl"
    top_k: int = 200
    profile_dir: Optional[str] = None  # jax.profiler trace of train steps
    profile_steps: int = 5
    # Cache frozen-backbone activations after first compute: the frozen
    # prefix is ~2/3 of the B/16 train step and (with no augmentation)
    # constant per image, so epochs >= 2 skip it entirely. Requires
    # model.trainable_last_k. Cost ~ S_pad*D*2 bytes/image (B/16: ~3.7MB).
    cache_backbone: bool = False
    # Where cached activations live: "device" keeps one [N, S, D] array in
    # HBM (no per-step host transfer — measured H2D here is ~1.6 GB/s, i.e.
    # ~75 ms/batch for B/16 b32 acts, comparable to the tail step itself);
    # "disk" memmaps them on the host (persists across runs, any size);
    # "auto" picks device when the whole set fits in ~10 GB of HBM.
    cache_backbone_store: str = "auto"
    # Storage dtype for the DEVICE pool. None stores activations at their
    # compute dtype (bit-identical cached training — the default). "int8"
    # stores per-token symmetric int8 + one f32 scale per token (ops/quant.py
    # quantize_rows): the pool shrinks ~2x, which keeps recipe-scale L/14
    # sets device-resident (2500 imgs: 19 GB bf16 vs 9.5 GB int8) where bf16
    # would overflow HBM and fall back to per-step disk streaming (which
    # faults this env's relay). Epoch 1 still trains on EXACT activations
    # (the quantized copy is only read from epoch 2 on); worst-case storage
    # error is rowmax/254 per element. Device store only.
    cache_store_dtype: Optional[str] = None
    # GSPMD mesh for the train/eval steps: batch shards over mesh_data
    # (gradient all-reduce rides ICI), tensors over mesh_model
    # (Megatron-style specs, parallel/sharding.py). 1x1 = single device,
    # exactly the reference's setup (SURVEY §2.3: it has no parallelism).
    mesh_data: int = 1
    mesh_model: int = 1
    # --- on-device augmentation (beyond-reference; ops/augment.py) -------
    # Master switch. Mutually exclusive with cache_backbone: the activation
    # cache requires constant pixels per image, augmentation changes them
    # every step. Sampled inside the jitted step from PRNGKey(seed) folded
    # with the step counter — bit-reproducible per training.seed.
    augment: bool = False
    aug_hflip: float = 0.5  # per-image horizontal-flip probability
    aug_color: float = 0.0  # brightness/contrast/saturation strength
    aug_scale_min: float = 1.0  # zoom window scale range; <1 crops (zoom
    aug_scale_max: float = 1.0  # in), >1 shrinks onto a zero canvas
    # Deterministic horizontal-flip augmentation that COMPOSES with the
    # activation cache (unlike `augment`): hflip has exactly two outcomes
    # per image, so the device pool stores both prefixes (rows 2i / 2i+1,
    # interleaved to keep sharded gathers rank-local) and each step samples
    # which row to gather, mirroring the GT boxes in-graph. Doubles the pool
    # (cache_store_dtype: int8 halves it back). Works uncached too (plain
    # p=0.5 flip). Mutually exclusive with `augment`; device store only.
    augment_hflip: bool = False
    # --- model selection / regularization (beyond-reference prod knobs) ---
    # Exponential moving average of the TRAINABLE params (the frozen set
    # never moves, so averaging it would be a no-op): ema = d*ema + (1-d)*p
    # after every optimizer update. 0 disables. Standard detector practice
    # the reference lacks; the averaged weights usually eval better late in
    # a fine-tune.
    ema_decay: float = 0.0
    # When EMA is on, run the eval epoch (and keep_best selection) with the
    # EMA weights instead of the raw ones.
    ema_eval: bool = True
    # Save checkpoint_dir/best whenever the eval mAP improves (the artifact
    # a deployment actually wants — the reference loses even its final
    # weights, SURVEY §5.4). Old best steps are pruned.
    keep_best: bool = False
    # Stop after N consecutive evals without mAP improvement (0 = off).
    # Counts EVALS, so it composes with eval_every_epochs.
    early_stop_patience: int = 0
    # Emit standard TensorBoard event files (scalars per epoch) here. The
    # reference imports SummaryWriter but never constructs one (quirk #6);
    # this is the live, dependency-free implementation (utils/tb_writer.py).
    tensorboard_dir: Optional[str] = None
    # Gradient accumulation (optax.MultiSteps): k micro-steps of batch_size
    # average their grads into ONE optimizer update — the effective batch is
    # k*batch_size through the same compiled step graph. Use when the target
    # batch doesn't compile/fit (here: b48/b64 fault the remote compiler;
    # 2x32 gives effective 64). LR-schedule steps count optimizer updates.
    grad_accum: int = 1
    # Pre-stage the train/test pixels into a device-resident uint8 pool at
    # run start (a few big idle-time transfers), then assemble every batch
    # ON DEVICE with a gather — no per-step host->device image transfer at
    # all. On the TPU relay a transfer issued beside an in-flight exec runs
    # ~100x slower and one mis-ordered put can flip the process into a
    # permanent ~9.4 MB/s degraded-put mode (BENCH.md r4b/r4d), so removing
    # the per-step stream entirely is the robust fix for epoch-1/uncached
    # throughput. "auto" stages on tpu backends when pixels (+ the device
    # activation pool, if cache_backbone) fit ~14 GB of HBM; "on" forces it
    # (any backend); "off" streams per step (the pre-r5 behavior). Batch
    # order, augmentation and loss trajectories are identical either way
    # (tests/test_pixel_stage.py pins staged == streamed).
    stage_pixels: str = "auto"


@dataclasses.dataclass
class ModelConfig:
    name: str = "b32"
    params_npz: Optional[str] = None  # converted HF checkpoint
    dtype: str = "float32"  # or "bfloat16"
    attention_impl: str = "auto"
    remat: bool = False
    # (r5) int8 frozen backbone was DEMOTED out of the production config:
    # +6.4% measured but it fails the r3 drift gate — detections drift 3.1x
    # the bf16 noise floor and the 3-seed training A/B could not resolve the
    # mAP effect (BENCH.md). It remains a tools-only experiment via
    # OWLVIT_QUANT_BACKBONE=1 and OwlViTConfig.quant_backbone
    # (tools/tpu_one_run.py quantdrift=1 is the agreement probe).
    trainable_last_k: int = 1
    prompts_per_class: int = 3
    clip_vocab: Optional[str] = None  # vocab.json path (real CLIP BPE)
    clip_merges: Optional[str] = None


@dataclasses.dataclass
class Config:
    data: DataConfig
    training: TrainingConfig
    model: ModelConfig


def _build(cls, section: dict, name: str):
    fields = {f.name for f in dataclasses.fields(cls)}
    unknown = set(section) - fields
    if unknown:
        raise ValueError(f"unknown keys in config section '{name}': {sorted(unknown)}")
    # YAML 1.1 parses bare scientific notation ("1e-4", no dot) as a STRING
    # and ints where floats are declared — coerce scalars to the declared
    # field type so configs written like the reference's (`lr: 3e-6`) work.
    hints = typing.get_type_hints(cls)
    coerced = {}
    for k, v in section.items():
        t = hints.get(k)
        optional = False
        if typing.get_origin(t) is typing.Union:
            args = [a for a in typing.get_args(t) if a is not type(None)]
            optional = len(args) < len(typing.get_args(t))
            t = args[0] if len(args) == 1 else None
        if t is float and isinstance(v, (int, str)) and not isinstance(v, bool):
            v = float(v)
        elif t is int and isinstance(v, str):
            v = int(v)
        elif t is str and isinstance(v, bool):
            if optional:
                # Optional[str] fields are PATHS (log_file, checkpoint_dir,
                # tensorboard_dir, ...): `log_file: false` means "disable",
                # not a file literally named "off" — map False -> None and
                # refuse a bare `true` (no sensible path to invent)
                if v:
                    raise ValueError(
                        f"{name}.{k}: `true` is not a path — give a string "
                        "or `false`/null to disable"
                    )
                v = None
            else:
                # tri-state string knobs (e.g. stage_pixels) written as
                # YAML booleans: map true/false onto their on/off states
                v = "on" if v else "off"
        coerced[k] = v
    return cls(**coerced)


def load_config(path: str) -> Config:
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    return Config(
        data=_build(DataConfig, raw.get("data", {}), "data"),
        training=_build(TrainingConfig, raw.get("training", {}), "training"),
        model=_build(ModelConfig, raw.get("model", {}), "model"),
    )
