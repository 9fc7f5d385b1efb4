"""OWL-ViT detector: query-bank fine-tuning, zero-shot and one-shot paths.

Rebuilds the capabilities of the reference model layer
(/root/reference/src/models.py) plus the HF pieces it borrows:

  * image_embedder        — models.py:77-96 (post-LN, CLS fusion, merged LN)
  * box_predictor         — models.py:65-73 + HF box head (modeling_owlvit.py:1113-1129)
  * query-bank class head — models.py:15-38 (dense0, L2 norms with the
                            reference's epsilon quirk, cosine sims, 3-way max
                            over prompt variants)
  * HF class head         — modeling_owlvit.py:1132-1180 (logit shift/scale/elu)
                            for zero-shot text conditioning
  * build_query_bank      — models.py:149-171 (3 prompts/class -> CLIP text
                            embeds -> trainable bank)
  * embed_image_query     — modeling_owlvit.py:1382-1418 (OWLv2-style one-shot
                            image-conditioned queries), re-designed branch-free
                            for jit

Everything is batched [B, ...] — the reference's batch=1 limitation is gone.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from owlvit_tpu.ops import boxes as box_ops
from owlvit_tpu.ops.box_bias import compute_box_bias

from . import text as text_model
from . import vit
from .configs import OwlViTConfig
from .layers import (
    gelu,
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
)

# --------------------------------------------------------------------------
# Init
# --------------------------------------------------------------------------


def init(key, cfg: OwlViTConfig, num_queries: Optional[int] = None) -> dict:
    """Random-init full detector params. num_queries adds a query bank
    [num_queries, projection_dim] (fine-tuning path)."""
    ks = jax.random.split(key, 9)
    D, P = cfg.vision.hidden_size, cfg.projection_dim
    params = {
        "vision": vit.init(ks[0], cfg.vision),
        "text": text_model.init(ks[1], cfg.text, P),
        "merged_ln": init_layer_norm(D),
        "box_head": {
            "dense0": init_linear(ks[2], D, D),
            "dense1": init_linear(ks[3], D, D),
            "dense2": init_linear(ks[4], D, 4),
        },
        "class_head": {
            "dense0": init_linear(ks[5], D, P),
            "logit_shift": init_linear(ks[6], D, 1),
            "logit_scale": init_linear(ks[7], D, 1),
        },
    }
    if num_queries is not None:
        # ks[8], not the parent key: reusing a split key violates JAX's
        # no-key-reuse rule (the bank draw would correlate with ks[0..7])
        params["queries"] = (
            jax.random.normal(ks[8], (num_queries, P), jnp.float32) * 0.02
        )
    return params


# --------------------------------------------------------------------------
# Embedders and heads
# --------------------------------------------------------------------------


def image_embedder(params: dict, cfg: OwlViTConfig, pixel_values: jnp.ndarray):
    """[B, H, W, 3] -> image_feats [B, P, D].

    Matches reference models.py:77-96: post-LN over ALL tokens, multiply patch
    tokens by the broadcast CLS token, then the detector's merged layernorm.
    The [B, gh, gw, D] "feature map" of the reference is just a reshape of
    this; we keep the flat layout and reshape only where needed.
    """
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    last_hidden = vit.forward(
        params["vision"],
        cfg.vision,
        pixel_values,
        dtype=dtype,
        attention_impl=_attn_impl(cfg),
        remat=cfg.remat,
        trainable_last_k=cfg.trainable_last_k,
        quant_backbone=cfg.quant_backbone,
        static_softmax=cfg.static_softmax,
    )
    return _merge_feats(params, cfg, last_hidden)


def _merge_feats(params, cfg: OwlViTConfig, last_hidden) -> jnp.ndarray:
    """Shared encoder epilogue: post-LN -> CLS*patches fusion -> merged LN
    (HF OwlViTModel.get_image_features tail). ONE implementation for the
    full forward (image_embedder) and the cached-prefix tail
    (forward_train_from_prefix) — their bit-identity contract depends on
    running literally the same code here."""
    x = layer_norm(params["vision"]["post_ln"], last_hidden, cfg.vision.layer_norm_eps)
    cls, patches = x[:, :1, :], x[:, 1:, :]
    merged = patches * cls
    return layer_norm(params["merged_ln"], merged, cfg.vision.layer_norm_eps)


def _attn_impl(cfg: OwlViTConfig) -> str:
    if cfg.attention_impl == "auto":
        import jax

        from owlvit_tpu.ops.flash_attention import flash_supported

        return (
            "flash"
            if jax.default_backend() == "tpu" and flash_supported()
            else "xla"
        )
    return cfg.attention_impl


def box_predictor(
    params: dict, cfg: OwlViTConfig, image_feats: jnp.ndarray
) -> jnp.ndarray:
    """[B, P, D] -> xyxy boxes in [0,1], [B, P, 4].

    MLP (gelu x2) + per-patch grid bias -> sigmoid cxcywh -> corners
    (reference models.py:65-73; HF head modeling_owlvit.py:1113-1129).
    """
    h = gelu(linear(params["box_head"]["dense0"], image_feats))
    h = gelu(linear(params["box_head"]["dense1"], h))
    pred = linear(params["box_head"]["dense2"], h).astype(jnp.float32)
    bias = jnp.asarray(compute_box_bias(cfg.vision.grid, cfg.vision.grid))
    cxcywh = jax.nn.sigmoid(pred + bias)
    return box_ops.cxcywh_to_xyxy(cxcywh)


def class_embeds(params: dict, image_feats: jnp.ndarray) -> jnp.ndarray:
    """dense0 projection of image feats: [B, P, D] -> [B, P, proj]."""
    return linear(params["class_head"]["dense0"], image_feats)


def class_predictor_querybank(
    params: dict,
    cfg: OwlViTConfig,
    image_feats: jnp.ndarray,
    queries: Optional[jnp.ndarray] = None,
    prompts_per_class: int = 3,
) -> jnp.ndarray:
    """Query-bank cosine-similarity head: [B, P, D] -> sims [B, P, C].

    Reference models.py:24-38: project, L2-normalize both sides (the query
    side keeps the reference's `q/||q|| + 1e-6` parenthesization unless
    cfg.fix_query_norm), cosine matmul, then max over each class's
    `prompts_per_class` consecutive prompt variants (the MaxPool1d(3,3)).
    """
    if queries is None:
        queries = params["queries"]
    img = class_embeds(params, image_feats).astype(jnp.float32)
    img = img / (jnp.linalg.norm(img, axis=-1, keepdims=True) + 1e-6)

    q = queries.astype(jnp.float32)
    qn = jnp.linalg.norm(q, axis=-1, keepdims=True)
    q = q / (qn + 1e-6) if cfg.fix_query_norm else q / qn + 1e-6

    sims = jnp.einsum("bpd,qd->bpq", img, q, preferred_element_type=jnp.float32)
    B, P, Q = sims.shape
    C = Q // prompts_per_class
    return jnp.max(sims.reshape(B, P, C, prompts_per_class), axis=-1)


def class_predictor(
    params: dict,
    cfg: OwlViTConfig,
    image_feats: jnp.ndarray,
    query_embeds: jnp.ndarray,
    query_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """HF-style class head with learnable logit shift/scale (zero-shot path).

    image_feats [B, P, D], query_embeds [B, Q, proj] -> logits [B, P, Q].
    Matches modeling_owlvit.py:1144-1177.
    """
    img = class_embeds(params, image_feats).astype(jnp.float32)
    img = img / (jnp.linalg.norm(img, axis=-1, keepdims=True) + 1e-6)
    q = query_embeds.astype(jnp.float32)
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-6)

    logits = jnp.einsum("bpd,bqd->bpq", img, q, preferred_element_type=jnp.float32)
    shift = linear(params["class_head"]["logit_shift"], image_feats).astype(jnp.float32)
    scale = linear(params["class_head"]["logit_scale"], image_feats).astype(jnp.float32)
    scale = jax.nn.elu(scale) + 1.0
    logits = (logits + shift) * scale

    if query_mask is not None:
        logits = jnp.where(
            query_mask[:, None, :] > 0, logits, jnp.finfo(jnp.float32).min
        )
    return logits


# --------------------------------------------------------------------------
# Forward passes
# --------------------------------------------------------------------------


def forward_train(
    params: dict, cfg: OwlViTConfig, pixel_values: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fine-tuning forward (reference models.py:98-119).

    [B, H, W, 3] -> (pred_boxes xyxy [B, P, 4], sims [B, P, C]).
    """
    feats = image_embedder(params, cfg, pixel_values)
    return box_predictor(params, cfg, feats), class_predictor_querybank(
        params, cfg, feats
    )


def embed_prefix(
    params: dict, cfg: OwlViTConfig, pixel_values: jnp.ndarray
) -> jnp.ndarray:
    """Frozen-backbone prefix activations [B, S_pad, D].

    A pure function of (frozen params, pixels) when cfg.trainable_last_k is
    set — the trainer caches it across epochs (training.cache_backbone) so
    epochs >= 2 skip the frozen 11-layer scan entirely. The reference
    recomputes its frozen backbone every step (main.py:64-96, the
    requires_grad=False set of models.py:173-184 still runs forward).
    """
    if cfg.trainable_last_k is None:
        raise ValueError(
            "embed_prefix requires trainable_last_k (a frozen prefix); "
            "with full fine-tuning there is nothing constant to cache"
        )
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    return vit.forward_prefix(
        params["vision"], cfg.vision, pixel_values,
        dtype=dtype, attention_impl=_attn_impl(cfg),
        trainable_last_k=cfg.trainable_last_k,
        quant_backbone=cfg.quant_backbone,
        static_softmax=cfg.static_softmax,
    )


def forward_train_from_prefix(
    params: dict, cfg: OwlViTConfig, acts: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """forward_train continued from cached embed_prefix activations.

    Bit-identical to forward_train on the same inputs: the tail consumes the
    exact tensor the in-graph split hands over (vit.forward is itself
    forward_prefix + forward_tail).
    """
    last_hidden = vit.forward_tail(
        params["vision"], cfg.vision, acts,
        attention_impl=_attn_impl(cfg), remat=cfg.remat,
        trainable_last_k=cfg.trainable_last_k,
    )
    feats = _merge_feats(params, cfg, last_hidden)
    return box_predictor(params, cfg, feats), class_predictor_querybank(
        params, cfg, feats
    )


def forward_zero_shot(
    params: dict,
    cfg: OwlViTConfig,
    pixel_values: jnp.ndarray,
    input_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Text-conditioned open-vocabulary detection (HF forward, :1560-1650).

    input_ids: [Q, S] — one shared query set for the whole batch.
    Returns (pred_boxes xyxy [B, P, 4], logits [B, P, Q]).
    """
    feats = image_embedder(params, cfg, pixel_values)
    pred_boxes = box_predictor(params, cfg, feats)

    text_embeds = text_model.forward(
        params["text"], cfg.text, input_ids, attention_mask
    )
    text_embeds = text_embeds / jnp.linalg.norm(
        text_embeds, axis=-1, keepdims=True
    )  # OwlViTModel.forward normalizes text_embeds (modeling_owlvit.py:1084)
    query_embeds = jnp.broadcast_to(
        text_embeds[None], (feats.shape[0],) + text_embeds.shape
    )
    query_mask = (input_ids[:, 0] > 0)[None].astype(jnp.int32)
    query_mask = jnp.broadcast_to(query_mask, (feats.shape[0], input_ids.shape[0]))
    logits = class_predictor(params, cfg, feats, query_embeds, query_mask)
    return pred_boxes, logits


def build_query_bank(
    params: dict,
    cfg: OwlViTConfig,
    input_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Encode class-prompt token ids -> normalized query bank [Q, proj].

    The reference builds this once at model load (models.py:162-171) by
    running the full HF detection model; the quantity actually consumed is
    the normalized projected text embedding, which is what we compute.
    """
    t = text_model.forward(params["text"], cfg.text, input_ids, attention_mask)
    return t / jnp.linalg.norm(t, axis=-1, keepdims=True)


def embed_image_query(
    params: dict,
    cfg: OwlViTConfig,
    query_pixel_values: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One-shot (image-conditioned) queries, OWLv2 style.

    For each query image: pick the predicted box that best covers the whole
    image ([0,0,1,1]) within 80% of the best IoU, then among those candidates
    the embedding LEAST similar to the mean patch embedding (most distinctive
    object). Branch-free rewrite of HF embed_image_query
    (modeling_owlvit.py:1382-1418) — the fallback-to-GIoU and empty-selection
    branches become masked selects so the whole thing jits.

    Returns (query_embeds [B, proj], best_box_idx [B], pred_boxes [B, P, 4]).
    """
    feats = image_embedder(params, cfg, query_pixel_values)
    embeds = class_embeds(params, feats)  # [B, P, proj]
    pred_boxes = box_predictor(params, cfg, feats)  # xyxy [B, P, 4]

    full = jnp.array([0.0, 0.0, 1.0, 1.0])
    full_b = jnp.broadcast_to(full, pred_boxes.shape)
    iou = box_ops.elementwise_iou(full_b, pred_boxes)  # [B, P]
    giou = box_ops.elementwise_giou(full_b, pred_boxes)
    # Fall back to GIoU when nothing overlaps (HF's torch.all(ious == 0)).
    use_giou = jnp.all(iou == 0.0, axis=-1, keepdims=True)
    score = jnp.where(use_giou, giou, iou)

    thresh = jnp.max(score, axis=-1, keepdims=True) * 0.8
    selected = score >= thresh  # [B, P]

    mean_embed = jnp.mean(embeds, axis=1, keepdims=True)  # [B, 1, proj]
    mean_sim = jnp.einsum("bpd,bqd->bp", embeds, mean_embed)
    # argmin of mean_sim among selected
    masked = jnp.where(selected, mean_sim, jnp.inf)
    best = jnp.argmin(masked, axis=-1)  # [B]
    query_embeds = jnp.take_along_axis(embeds, best[:, None, None], axis=1)[:, 0]
    return query_embeds, best, pred_boxes


def forward_one_shot(
    params: dict,
    cfg: OwlViTConfig,
    pixel_values: jnp.ndarray,
    query_pixel_values: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Image-guided detection (HF image_guided_detection, :1425+).

    Returns (target pred_boxes xyxy [B, P, 4], logits [B, P, 1]).
    """
    query_embeds, _, _ = embed_image_query(params, cfg, query_pixel_values)
    feats = image_embedder(params, cfg, pixel_values)
    pred_boxes = box_predictor(params, cfg, feats)
    logits = class_predictor(params, cfg, feats, query_embeds[:, None, :])
    return pred_boxes, logits
