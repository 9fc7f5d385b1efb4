"""Functional NN primitives: params are plain pytrees (nested dicts).

Design: every module is (init_fn -> params, apply_fn(params, x) -> y). No
module classes, no framework — this keeps params trivially shardable with
`jax.sharding` rules and converters trivially writable.

Numerics match the CLIP/OWL-ViT encoder stack (HF modeling_owlvit.py:375-560):
pre-LN transformer blocks, quick_gelu MLPs, LN eps 1e-5, attention scale
applied to Q before the QK product.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# --------------------------------------------------------------------------
# Elementary ops
# --------------------------------------------------------------------------


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """CLIP's activation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU — used by the box head (HF modeling_owlvit.py:1121)."""
    return jax.nn.gelu(x, approximate=False)


def linear(p: dict, x: jnp.ndarray, quantized: bool = False) -> jnp.ndarray:
    if quantized:
        from owlvit_tpu.ops.quant import linear_q

        return linear_q(p, x)
    y = x @ p["kernel"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def layer_norm(p: dict, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    # Always reduce in fp32 for bf16 stability, cast back to input dtype.
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def l2_normalize(x: jnp.ndarray, eps_in_denom: float = 0.0) -> jnp.ndarray:
    n = jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)
    return (x.astype(jnp.float32) / (n + eps_in_denom)).astype(x.dtype)


# --------------------------------------------------------------------------
# Initializers
# --------------------------------------------------------------------------


def init_linear(key, d_in: int, d_out: int, *, bias: bool = True, std=None) -> dict:
    std = std if std is not None else d_in**-0.5
    p = {"kernel": jax.random.normal(key, (d_in, d_out), jnp.float32) * std}
    if bias:
        p["bias"] = jnp.zeros((d_out,), jnp.float32)
    return p


def init_layer_norm(dim: int) -> dict:
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


# --------------------------------------------------------------------------
# Attention
# --------------------------------------------------------------------------


def init_attention(key, dim: int) -> dict:
    ks = jax.random.split(key, 4)
    return {
        "q": init_linear(ks[0], dim, dim),
        "k": init_linear(ks[1], dim, dim),
        "v": init_linear(ks[2], dim, dim),
        "out": init_linear(ks[3], dim, dim),
    }


def attention(
    p: dict,
    x: jnp.ndarray,
    num_heads: int,
    *,
    bias: Optional[jnp.ndarray] = None,
    causal: bool = False,
    impl: str = "xla",
    valid_len: Optional[int] = None,
    fast_softmax: bool = False,
    quantized: bool = False,
    bwd_hint: Optional[str] = None,
    static_softmax: bool = False,
) -> jnp.ndarray:
    """Multi-head self-attention. x: [B, S, D]; bias: additive [B, 1|H, S, S].

    impl="flash" routes to the Pallas TPU kernel (ops/flash_attention.py);
    "xla" uses a plain einsum softmax that XLA fuses well on any backend.
    valid_len: real token count when x is pre-padded — masked in BOTH
    the flash kernels and the XLA softmax (padded keys never attend).
    """
    B, S, D = x.shape
    head_dim = D // num_heads
    scale = head_dim**-0.5

    if impl == "flash" and (bias is not None or causal):
        impl = "xla"  # flash kernel covers the ViT path (no mask/bias)

    if impl == "flash":
        from owlvit_tpu.ops.flash_attention import (
            flash_attention,
            flash_attention_hybrid,
            flash_attention_packed,
            hybrid_supported,
            packed_supported,
        )

        q2 = linear(p["q"], x, quantized)
        k2 = linear(p["k"], x, quantized)
        v2 = linear(p["v"], x, quantized)
        if packed_supported(num_heads, head_dim, D):
            # fully transpose-free; bwd_hint picks the backward kernel set
            o2 = flash_attention_packed(
                q2, k2, v2, scale=scale, num_heads=num_heads,
                valid_len=valid_len, fast_softmax=fast_softmax,
                bwd_hint=bwd_hint, static_softmax=static_softmax,
            )
            return linear(p["out"], o2, quantized)
        if hybrid_supported(num_heads, head_dim, D):
            # packed forward (no layout copies), transposed backward
            o2 = flash_attention_hybrid(
                q2, k2, v2, scale=scale, num_heads=num_heads,
                valid_len=valid_len, fast_softmax=fast_softmax,
                static_softmax=static_softmax,
            )
            return linear(p["out"], o2, quantized)
        o = flash_attention(
            q2.reshape(B, S, num_heads, head_dim),
            k2.reshape(B, S, num_heads, head_dim),
            v2.reshape(B, S, num_heads, head_dim),
            scale=scale,
            valid_len=valid_len,
        )
        return linear(p["out"], o.reshape(B, S, D), quantized)

    # XLA path: same projection treatment as the flash paths — quantized
    # must quantize here too (or CPU runs of the int8 path would silently
    # skip projection quantization and diverge structurally from TPU)
    q = linear(p["q"], x, quantized).reshape(B, S, num_heads, head_dim)
    k = linear(p["k"], x, quantized).reshape(B, S, num_heads, head_dim)
    v = linear(p["v"], x, quantized).reshape(B, S, num_heads, head_dim)

    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q * scale, k, preferred_element_type=jnp.float32
    )
    if causal:
        mask = jnp.tril(jnp.ones((S, S), bool))
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    if valid_len is not None and valid_len < S:
        # pre-padded inputs (flash-padded activations run through the XLA
        # path, e.g. a TPU-built activation cache consumed on CPU): padded
        # rows must not participate as softmax KEYS — the flash kernels
        # mask them, and silently attending to garbage here corrupted
        # nothing only by luck of which impl resolved
        key_ok = jnp.arange(S) < valid_len
        logits = jnp.where(
            key_ok[None, None, None, :], logits, jnp.finfo(jnp.float32).min
        )
    if bias is not None:
        logits = logits + bias.astype(logits.dtype)
    w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", w, v)

    return linear(p["out"], o.reshape(B, S, D), quantized)


# --------------------------------------------------------------------------
# Transformer encoder (CLIP pre-LN block), scanned over stacked layer params
# --------------------------------------------------------------------------


def init_mlp(key, dim: int, hidden: int) -> dict:
    k1, k2 = jax.random.split(key)
    return {"fc1": init_linear(k1, dim, hidden), "fc2": init_linear(k2, hidden, dim)}


def mlp(p: dict, x: jnp.ndarray, quantized: bool = False) -> jnp.ndarray:
    return linear(p["fc2"], quick_gelu(linear(p["fc1"], x, quantized)), quantized)


def init_encoder_layer(key, dim: int, hidden: int) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "ln1": init_layer_norm(dim),
        "attn": init_attention(k1, dim),
        "ln2": init_layer_norm(dim),
        "mlp": init_mlp(k2, dim, hidden),
    }


def init_encoder(key, num_layers: int, dim: int, hidden: int) -> dict:
    """Stacked layer params: every leaf has a leading [num_layers] axis."""
    layers = [
        init_encoder_layer(k, dim, hidden) for k in jax.random.split(key, num_layers)
    ]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def encoder_block(
    p: dict,
    x: jnp.ndarray,
    num_heads: int,
    eps: float,
    *,
    bias=None,
    causal: bool = False,
    impl: str = "xla",
    valid_len: Optional[int] = None,
    fast_softmax: bool = False,
    quantized: bool = False,
    bwd_hint: Optional[str] = None,
    static_softmax: bool = False,
) -> jnp.ndarray:
    h = layer_norm(p["ln1"], x, eps)
    h = attention(
        p["attn"], h, num_heads, bias=bias, causal=causal, impl=impl,
        valid_len=valid_len, fast_softmax=fast_softmax, quantized=quantized,
        bwd_hint=bwd_hint, static_softmax=static_softmax,
    )
    x = x + h
    h = layer_norm(p["ln2"], x, eps)
    h = mlp(p["mlp"], h, quantized)
    return x + h


def _scan_unroll() -> int:
    """lax.scan unroll factor for the stacked encoder (OWLVIT_SCAN_UNROLL,
    default 1 = rolled). Unrolling the frozen prefix lets XLA schedule
    across layer boundaries (the 11-layer scan is ~60% of the uncached
    step); numerics identical. A/B knob — flip the default only after an
    on-chip win."""
    import os

    return max(1, int(os.environ.get("OWLVIT_SCAN_UNROLL", "1")))


def _fused_ln_enabled() -> bool:
    """Default OFF: measured on-chip (r2 session A2/A3) the fused add+LN
    kernel is perf-neutral vs XLA's own fusions at B/16 b32 (109.3 vs
    109.8 img/s) — XLA already keeps the chain fused. Kept as opt-in
    infrastructure (OWLVIT_FUSED_LN=1); numerics are identical."""
    import os

    return os.environ.get("OWLVIT_FUSED_LN", "0") == "1"


def encoder(
    stacked: dict,
    x: jnp.ndarray,
    num_heads: int,
    eps: float,
    *,
    bias=None,
    causal: bool = False,
    impl: str = "xla",
    remat: bool = False,
    valid_len: Optional[int] = None,
    fast_softmax: bool = False,
    quantized: bool = False,
    static_softmax: bool = False,
) -> jnp.ndarray:
    """Run the stacked encoder with lax.scan (one trace for all layers).

    On the flash (TPU) path the residual adds and LayerNorms run through the
    fused add_ln Pallas kernel (ops/fused_ln.py): the scan carries the
    residual stream as a pending (res, branch) pair so every layer boundary
    is one fused read instead of separate add/LN HBM passes. The XLA path
    keeps plain ops (same numerics; what CPU parity tests pin).
    """
    if impl == "flash" and bias is None and not causal and _fused_ln_enabled():
        from owlvit_tpu.ops.fused_ln import add_ln

        def body(carry, layer_p):
            res, br = carry
            xi, y1 = add_ln(res, br, layer_p["ln1"], eps)
            a = attention(
                layer_p["attn"], y1, num_heads, impl=impl, valid_len=valid_len,
                fast_softmax=fast_softmax, quantized=quantized,
                bwd_hint="both",  # scanned context: see the note below
                static_softmax=static_softmax,
            )
            x2, y2 = add_ln(xi, a, layer_p["ln2"], eps)
            m = mlp(layer_p["mlp"], y2, quantized)
            return (x2, m), None

        if remat:
            body = jax.checkpoint(body)
        (res, br), _ = jax.lax.scan(
            body, (x, jnp.zeros_like(x)), stacked, unroll=_scan_unroll()
        )
        return res + br

    n_layers = jax.tree.leaves(stacked)[0].shape[0]
    # Packed-backward kernel choice (r3, measured on chip): the fused
    # dq+dk+dv kernel is +23% on the unrolled tail step but reproducibly
    # faults the device inside a full layer-in-scan backward (4/4; a bare
    # scan repro runs clean, so the trigger is the composed layer graph).
    # Unrolled stacks hint 'fused', scanned stacks hint 'both';
    # OWLVIT_PACKED_BWD overrides either.
    unrolled = n_layers <= 2

    def body(h, layer_p):
        return (
            encoder_block(
                layer_p, h, num_heads, eps, bias=bias, causal=causal, impl=impl,
                valid_len=valid_len, fast_softmax=fast_softmax,
                quantized=quantized,
                bwd_hint="fused" if unrolled else "both",
                static_softmax=static_softmax,
            ),
            None,
        )

    if unrolled:
        # Unroll tiny stacks (the trainable TAIL is usually one layer):
        # scan buys nothing at this length, and unrolling unlocks the
        # fused backward kernel (numerics identical either way).
        for i in range(n_layers):
            layer_p = jax.tree.map(lambda a: a[i], stacked)
            x, _ = body(x, layer_p) if not remat else jax.checkpoint(body)(x, layer_p)
        return x

    if remat:
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, stacked, unroll=_scan_unroll())
    return x
