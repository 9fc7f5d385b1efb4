"""CLIP vision transformer, TPU-first.

Functional parity with HF `OwlViTVisionTransformer`
(modeling_owlvit.py:271-345, 807-860): conv patch embedding + CLS token +
learned position embedding, pre-layernorm, N pre-LN encoder blocks
(quick_gelu), post-layernorm.

TPU-first choices:
  * patch embedding as reshape + one large matmul (MXU-friendly; a strided
    conv lowers to the same thing but the reshape form guarantees it)
  * NHWC image layout
  * encoder layers scanned over stacked params (single trace, fast compiles)
  * attention pluggable: XLA einsum or Pallas flash kernel
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .configs import VisionConfig
from .layers import encoder, init_encoder, init_layer_norm, layer_norm


def init(key, cfg: VisionConfig) -> dict:
    k_embed, k_cls, k_pos, k_enc = jax.random.split(key, 4)
    patch_dim = cfg.patch_size * cfg.patch_size * 3
    return {
        "patch_embedding": {
            # [ps*ps*3, D], flattened in (py, px, channel) order
            "kernel": jax.random.normal(k_embed, (patch_dim, cfg.hidden_size)) * 0.02,
        },
        "class_embedding": jax.random.normal(k_cls, (cfg.hidden_size,)) * 0.02,
        "position_embedding": (
            jax.random.normal(k_pos, (cfg.num_patches + 1, cfg.hidden_size)) * 0.02
        ),
        "pre_ln": init_layer_norm(cfg.hidden_size),
        "layers": init_encoder(k_enc, cfg.num_layers, cfg.hidden_size, cfg.mlp_dim),
        "post_ln": init_layer_norm(cfg.hidden_size),
    }


def patchify(pixel_values: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """[B, H, W, 3] -> [B, gh*gw, ps*ps*3] with (py, px, c) inner order."""
    B, H, W, C = pixel_values.shape
    gh, gw = H // patch_size, W // patch_size
    x = pixel_values.reshape(B, gh, patch_size, gw, patch_size, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, gh, gw, ps, ps, C]
    return x.reshape(B, gh * gw, patch_size * patch_size * C)


def _embed_tokens(params: dict, cfg: VisionConfig, pixel_values, dtype):
    """Patch embed + CLS + position embed + pre-LN -> [B, 1+P, D]."""
    x = patchify(pixel_values.astype(dtype), cfg.patch_size)
    x = x @ params["patch_embedding"]["kernel"].astype(dtype)

    cls = jnp.broadcast_to(
        params["class_embedding"].astype(dtype), (x.shape[0], 1, cfg.hidden_size)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["position_embedding"].astype(dtype)

    return layer_norm(params["pre_ln"], x, cfg.layer_norm_eps)


def _pad_for_flash(x, attention_impl: str):
    """Flash path: pad the token axis to the kernel's block multiple ONCE,
    outside the layer scan — padded rows are row-local garbage everywhere
    (LN/MLP/residual) and masked as attention KEYS via valid_len, so real
    rows are exact; sliced off after the stack. This removes per-layer
    pad/slice traffic (profiled at ~15% of the train step).

    Returns (x, valid_len): valid_len is None when no padding happened.
    """
    S_real = x.shape[1]
    if attention_impl != "flash":
        return x, None
    from owlvit_tpu.ops.flash_attention import BLOCK_Q

    S_pad = ((S_real + BLOCK_Q - 1) // BLOCK_Q) * BLOCK_Q
    if S_pad == S_real:
        return x, None
    return jnp.pad(x, ((0, 0), (0, S_pad - S_real), (0, 0))), S_real


def forward_prefix(
    params: dict,
    cfg: VisionConfig,
    pixel_values: jnp.ndarray,
    *,
    dtype=jnp.float32,
    attention_impl: str = "xla",
    trainable_last_k: int,
    quant_backbone: bool = False,
    static_softmax: bool = False,
) -> jnp.ndarray:
    """Embeddings + the FROZEN layers[0 : L-k] under stop_gradient.

    Returns the (flash-padded) hidden state [B, S_pad, D] — exactly the
    tensor forward() hands to the trainable tail. It is a pure function of
    (frozen params, pixels), so trainers may compute it once per image and
    cache it across epochs (training.cache_backbone): the reference recomputes
    the full frozen backbone every step of every epoch (main.py:64-96).
    """
    import os

    x = _embed_tokens(params, cfg, pixel_values, dtype)
    x, valid_len = _pad_for_flash(x, attention_impl)

    fast = os.environ.get("OWLVIT_FAST_SOFTMAX", "0") == "1"  # measured -2% on chip (r2)
    quant = quant_backbone or os.environ.get("OWLVIT_QUANT_BACKBONE") == "1"
    split = cfg.num_layers - trainable_last_k
    head = jax.tree.map(lambda a: a[:split], params["layers"])
    # Frozen prefix runs under stop_gradient: no backward exists to stay
    # consistent with, so its flash kernels may use the input-dtype softmax
    # (2x VPU exp rate in bf16). The fixed-shift (static-max) softmax
    # (+10.9% serving / +8.4% uncached fwd on chip, BENCH.md r4) is threaded
    # from OwlViTConfig.static_softmax and must stay OFF in any process that
    # builds grad graphs: static-max kernels fault the relay 5/6 there even
    # from a separate fwd-only executable (r4c/r4d fault matrix) — only
    # pure-inference processes (serve.py, cli infer) turn it on.
    return jax.lax.stop_gradient(
        encoder(
            head, x, cfg.num_heads, eps=cfg.layer_norm_eps,
            impl=attention_impl, valid_len=valid_len,
            fast_softmax=fast, quantized=quant, static_softmax=static_softmax,
        )
    )


def forward_tail(
    params: dict,
    cfg: VisionConfig,
    acts: jnp.ndarray,
    *,
    attention_impl: str = "xla",
    remat: bool = False,
    trainable_last_k: int,
) -> jnp.ndarray:
    """The trainable layers[L-k :] over a forward_prefix output (possibly
    flash-padded); slices back to the real token count."""
    S_real = cfg.num_patches + 1
    valid_len = S_real if acts.shape[1] != S_real else None
    k = trainable_last_k
    if k > 0:
        split = cfg.num_layers - k
        tail = jax.tree.map(lambda a: a[split:], params["layers"])
        acts = encoder(
            tail, acts, cfg.num_heads, eps=cfg.layer_norm_eps,
            impl=attention_impl, remat=remat, valid_len=valid_len,
        )
    return acts[:, :S_real]


def forward(
    params: dict,
    cfg: VisionConfig,
    pixel_values: jnp.ndarray,
    *,
    dtype=jnp.float32,
    attention_impl: str = "xla",
    remat: bool = False,
    trainable_last_k: int | None = None,
    quant_backbone: bool = False,
    static_softmax: bool = False,
) -> jnp.ndarray:
    """[B, H, W, 3] -> last_hidden_state [B, 1+P, D] (pre post-LN, like HF's
    encoder output; callers apply post_ln where the pipeline requires it —
    the detection path applies it to ALL tokens, see owlvit.image_embedder).

    trainable_last_k: if set (fine-tuning; the reference trains only
    `layers.11`, models.py:173-184), the first L-k layers run inside a
    stop_gradient so AD never builds their backward pass — the frozen
    backbone costs forward-only FLOPs instead of a full backward sweep.
    """
    k = trainable_last_k
    if k is None or k >= cfg.num_layers:
        x = _embed_tokens(params, cfg, pixel_values, dtype)
        S_real = x.shape[1]
        x, valid_len = _pad_for_flash(x, attention_impl)
        x = encoder(
            params["layers"], x, cfg.num_heads, eps=cfg.layer_norm_eps,
            impl=attention_impl, remat=remat, valid_len=valid_len,
        )
        return x[:, :S_real]

    acts = forward_prefix(
        params, cfg, pixel_values,
        dtype=dtype, attention_impl=attention_impl,
        trainable_last_k=k, quant_backbone=quant_backbone,
        static_softmax=static_softmax,
    )
    return forward_tail(
        params, cfg, acts,
        attention_impl=attention_impl, remat=remat, trainable_last_k=k,
    )
