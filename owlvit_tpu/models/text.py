"""CLIP text transformer (query-bank initialization + zero-shot conditioning).

Functional parity with HF `OwlViTTextTransformer` (modeling_owlvit.py:677-750):
token + position embeddings, causal pre-LN encoder (quick_gelu), final
layernorm, EOT pooling (argmax of token ids — EOT is the highest id in the
CLIP vocab), then the no-bias text projection from `OwlViTModel`
(modeling_owlvit.py:941, applied at :1077).

Not in the train/infer hot path for the fine-tuning recipe (the query bank is
built once at init — reference models.py:162-169), but required for zero-shot
detection and query-bank construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .configs import TextConfig
from .layers import encoder, init_encoder, init_layer_norm, layer_norm


def init(key, cfg: TextConfig, projection_dim: int) -> dict:
    k_tok, k_pos, k_enc, k_proj = jax.random.split(key, 4)
    return {
        "token_embedding": jax.random.normal(k_tok, (cfg.vocab_size, cfg.hidden_size))
        * 0.02,
        "position_embedding": jax.random.normal(k_pos, (cfg.max_len, cfg.hidden_size))
        * 0.02,
        "layers": init_encoder(k_enc, cfg.num_layers, cfg.hidden_size, cfg.mlp_dim),
        "final_ln": init_layer_norm(cfg.hidden_size),
        "projection": {
            "kernel": jax.random.normal(k_proj, (cfg.hidden_size, projection_dim))
            * cfg.hidden_size**-0.5
        },
    }


def forward(
    params: dict,
    cfg: TextConfig,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray | None = None,
    *,
    dtype=jnp.float32,
    attention_impl: str = "xla",
) -> jnp.ndarray:
    """input_ids [N, S] int32 -> projected pooled text embeds [N, proj_dim].

    Output is UNNORMALIZED (the projection of the EOT token state); callers
    normalize per their protocol (OwlViTModel.forward L2-normalizes before
    returning text_embeds, modeling_owlvit.py:1084).
    """
    N, S = input_ids.shape
    x = params["token_embedding"].astype(dtype)[input_ids]
    x = x + params["position_embedding"].astype(dtype)[:S]

    bias = None
    if attention_mask is not None:
        # additive [N, 1, 1, S] padding bias (large negative on pad positions)
        bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9).astype(
            jnp.float32
        )

    x = encoder(
        params["layers"],
        x,
        cfg.num_heads,
        cfg.layer_norm_eps,
        bias=bias,
        causal=True,
        impl=attention_impl,
    )
    x = layer_norm(params["final_ln"], x, cfg.layer_norm_eps)

    # EOT pooling: highest token id marks the end-of-text position.
    eot = jnp.argmax(input_ids, axis=-1)
    pooled = x[jnp.arange(N), eot]
    return pooled @ params["projection"]["kernel"].astype(pooled.dtype)
