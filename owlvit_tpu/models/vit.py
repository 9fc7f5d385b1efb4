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
) -> jnp.ndarray:
    """[B, H, W, 3] -> last_hidden_state [B, 1+P, D] (pre post-LN, like HF's
    encoder output; callers apply post_ln where the pipeline requires it —
    the detection path applies it to ALL tokens, see owlvit.image_embedder).

    trainable_last_k: if set (fine-tuning; the reference trains only
    `layers.11`, models.py:173-184), the first L-k layers run inside a
    stop_gradient so AD never builds their backward pass — the frozen
    backbone costs forward-only FLOPs instead of a full backward sweep.
    """
    x = patchify(pixel_values.astype(dtype), cfg.patch_size)
    x = x @ params["patch_embedding"]["kernel"].astype(dtype)

    cls = jnp.broadcast_to(
        params["class_embedding"].astype(dtype), (x.shape[0], 1, cfg.hidden_size)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["position_embedding"].astype(dtype)

    x = layer_norm(params["pre_ln"], x, cfg.layer_norm_eps)

    # Flash path: pad the token axis to the kernel's block multiple ONCE,
    # outside the layer scan — padded rows are row-local garbage everywhere
    # (LN/MLP/residual) and masked as attention KEYS via valid_len, so real
    # rows are exact; sliced off after the stack. This removes per-layer
    # pad/slice traffic (profiled at ~15% of the train step).
    S_real = x.shape[1]
    valid_len = None
    if attention_impl == "flash":
        from owlvit_tpu.ops.flash_attention import BLOCK_Q

        S_pad = ((S_real + BLOCK_Q - 1) // BLOCK_Q) * BLOCK_Q
        if S_pad != S_real:
            x = jnp.pad(x, ((0, 0), (0, S_pad - S_real), (0, 0)))
            valid_len = S_real

    kwargs = dict(
        eps=cfg.layer_norm_eps, impl=attention_impl, remat=remat,
        valid_len=valid_len,
    )
    import os

    fast = os.environ.get("OWLVIT_FAST_SOFTMAX", "0") == "1"  # measured -2% on chip (r2): cast pass outweighs bf16 exp
    quant = quant_backbone or os.environ.get("OWLVIT_QUANT_BACKBONE") == "1"
    k = trainable_last_k
    if k is None or k >= cfg.num_layers:
        x = encoder(params["layers"], x, cfg.num_heads, **kwargs)
        return x[:, :S_real]

    split = cfg.num_layers - k
    head = jax.tree.map(lambda a: a[:split], params["layers"])
    # Frozen prefix runs under stop_gradient: no backward exists to stay
    # consistent with, so its flash kernels may use the input-dtype softmax
    # (2x VPU exp rate in bf16). The trainable tail keeps fp32 softmax.
    x = jax.lax.stop_gradient(
        encoder(head, x, cfg.num_heads, fast_softmax=fast, quantized=quant,
                **kwargs)
    )
    if k > 0:
        tail = jax.tree.map(lambda a: a[split:], params["layers"])
        x = encoder(tail, x, cfg.num_heads, **kwargs)
    return x[:, :S_real]
