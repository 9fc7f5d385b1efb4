"""Dynamic int8 quantized linear for the FROZEN backbone (opt-in).

The frozen encoder prefix is inference-only (vit.forward runs it under
stop_gradient), so its projection/MLP matmuls — which already run at bf16
MXU peak — can use the int8 MXU path at 2x the peak rate:

    y = (x_int8 @ w_int8) * (x_scale * w_scale[c]) + bias

  * weights: per-output-channel symmetric scales (error <= 0.4%)
  * activations: per-TOKEN (row-wise) dynamic symmetric scales — one
    rowwise abs-max reduce per call (cheap on the VPU, far cheaper than
    the matmul saved). r2 shipped per-TENSOR scales; CLIP ViTs carry huge
    per-token activation outliers in late layers, so one shared scale
    washed out small tokens (the r2 drift A/B measured the synthetic
    probe's mAP@0.5 HALVED). Per-token scales give every row its own
    dynamic range — the standard fix (LLM.int8's rowwise scheme).
  * accumulation in int32, rescale in fp32, output in the input dtype

Quantization happens ON THE FLY inside the jitted step: frozen weights are
function inputs (not constants), and the per-step quantize cost over all
frozen weights is ~0.2 ms — this avoids any parameter-pytree surgery and
keeps checkpoints/sharding unchanged.

CAVEAT — EXPERIMENTAL, fails its drift gate (r3 measured, BENCH.md):
even with per-token scales, the deterministic agreement probe shows int8
detections diverging from bf16 far beyond the bf16-vs-fp32 noise floor
(agreement mAP 0.367 vs floor 0.746 at B/16 b32; sims drift 3.1× the
bf16 floor). The 90-epoch training A/B is INCONCLUSIVE at 3 seeds (one
seed strongly favors off, one favors on, one silent — the synthetic
probe's mAP is too high-variance to resolve the effect). Keep
`OWLVIT_QUANT_BACKBONE` OFF unless you have validated mAP on your own
data. Gradients are undefined through the rounding — the frozen prefix
is the only sanctioned call site (mirrors fast_softmax's contract).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _per_token_scale(x: jnp.ndarray) -> jnp.ndarray:
    """x [..., D_in] -> [..., 1] rowwise symmetric scales."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return jnp.maximum(amax, 1e-12) / 127.0


def _per_channel_scale(w: jnp.ndarray) -> jnp.ndarray:
    """w [D_in, D_out] -> [D_out] symmetric scales."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    return jnp.maximum(amax, 1e-12) / 127.0


def _quantize(x: jnp.ndarray, scale) -> jnp.ndarray:
    q = jnp.round(x.astype(jnp.float32) / scale)
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def quantize_rows(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-token symmetric int8 storage quantization.

    x [..., D] -> (q int8 [..., D], scale f32 [...]). Unlike `linear_q`
    (int8 MATMULS through 11 layers, which fails the drift gate above),
    this quantizes ONE tensor once for storage — the activation-cache pool
    (trainer device store) — and dequantizes back to the compute dtype
    before any math. Worst-case per-element error is scale/2 = rowmax/254;
    the pool shrinks 2x vs bf16, which is what lets recipe-scale L/14 sets
    stay device-resident (BENCH.md: a 2500-image L/14 pool is 19 GB at
    bf16 — over HBM — and 9.5 GB at int8).
    """
    scale = _per_token_scale(x)  # [..., 1]
    return _quantize(x, scale), scale[..., 0]


def dequantize_rows(q: jnp.ndarray, scale: jnp.ndarray, dtype) -> jnp.ndarray:
    """Inverse of quantize_rows: (int8 [..., D], f32 [...]) -> dtype [..., D]."""
    return (q.astype(jnp.float32) * scale[..., None]).astype(dtype)


def linear_q(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """int8 x int8 -> int32 linear with dynamic scales; y in x.dtype."""
    w = p["kernel"]
    w_scale = _per_channel_scale(w)  # [D_out]
    x_scale = _per_token_scale(x)  # [..., 1]
    xq = _quantize(x, x_scale)
    wq = _quantize(w, w_scale[None, :])
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (x_scale * w_scale)  # [..., 1]*[D_out] bcast
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)
