"""Fused residual-add + LayerNorm Pallas kernel (custom VJP).

Round-1 profiling showed the pre-LN block's elementwise chain (ln1, +res,
ln2, +res) as the #2 step cost after attention: ~17% of the train step as
XLA add/reduce fusions, each a separate HBM round trip over the [B, S, D]
activation. This kernel computes

    r = x + h          (the residual stream, in the input dtype)
    y = LN(r) * scale + bias      (fp32 statistics, cast back)

in ONE pass: x and h are read once, r and y written once — halving the
chain's HBM traffic. The backward recomputes the statistics from r (which
the graph keeps alive anyway as the residual), so nothing extra is stashed.

Used by models.layers.encoder_block on the flash (TPU) path via the
restructured scan carry (res, branch); the XLA path keeps the plain
layer_norm so CPU parity tests pin the reference math. Numerics are
identical by construction: the add in the input dtype, fp32 stats, eps
inside rsqrt — the same operations ops.layers.layer_norm performs.

Reference equivalent: torch LayerNorm inside HF OwlViTEncoderLayer
(HF modeling_owlvit.py:375-420) — eager separate ops there.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

BLOCK_ROWS = int(_os.environ.get("OWLVIT_LN_BLOCK_ROWS", "256"))

INTERPRET = False


def _interpret() -> bool:
    return INTERPRET or jax.default_backend() != "tpu"


# --------------------------------------------------------------------------
# Kernels
# --------------------------------------------------------------------------


def _fwd_kernel(x_ref, h_ref, scale_ref, bias_ref, r_ref, y_ref, *, eps):
    r = x_ref[...] + h_ref[...]  # input dtype, same as the XLA residual add
    r_ref[...] = r
    rf = r.astype(jnp.float32)
    mean = jnp.mean(rf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(rf - mean), axis=-1, keepdims=True)
    xhat = (rf - mean) * jax.lax.rsqrt(var + eps)
    y = xhat * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(
        jnp.float32
    )
    y_ref[...] = y.astype(y_ref.dtype)


def _bwd_kernel(
    r_ref, dy_ref, dr_ref, scale_ref, g_ref, dscale_ref, dbias_ref, *, eps
):
    rf = r_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    mean = jnp.mean(rf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(rf - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (rf - mean) * rstd

    dyh = dy * scale_ref[...].astype(jnp.float32)
    m1 = jnp.mean(dyh, axis=-1, keepdims=True)
    m2 = jnp.mean(dyh * xhat, axis=-1, keepdims=True)
    dx_ln = rstd * (dyh - m1 - xhat * m2)

    g = dr_ref[...].astype(jnp.float32) + dx_ln
    g_ref[...] = g.astype(g_ref.dtype)
    # Per-program partial reductions, summed over the grid axis outside.
    # Mosaic requires >=8 sublanes per block, so each partial occupies an
    # (8, D) block with the value in row 0 and zeros below — the outer
    # sum-over-rows then yields the exact total.
    pad = ((0, 7), (0, 0))
    dscale_ref[...] = jnp.pad(jnp.sum(dy * xhat, axis=0, keepdims=True), pad)
    dbias_ref[...] = jnp.pad(jnp.sum(dy, axis=0, keepdims=True), pad)


# --------------------------------------------------------------------------
# pallas_call wrappers over [N, D]
# --------------------------------------------------------------------------


def _fwd2(x2, h2, scale, bias, eps):
    N, D = x2.shape
    grid = (N // BLOCK_ROWS,)
    row = pl.BlockSpec((BLOCK_ROWS, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=grid,
        in_specs=[row, row, vec, vec],
        out_specs=[row, row],
        out_shape=[
            jax.ShapeDtypeStruct((N, D), x2.dtype),
            jax.ShapeDtypeStruct((N, D), x2.dtype),
        ],
        interpret=_interpret(),
    )(x2, h2, scale.reshape(1, D), bias.reshape(1, D))


def _bwd2(r2, dy2, dr2, scale, eps):
    N, D = r2.shape
    G = N // BLOCK_ROWS
    grid = (G,)
    row = pl.BlockSpec((BLOCK_ROWS, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    part = pl.BlockSpec((8, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    g, dscale_p, dbias_p = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        grid=grid,
        in_specs=[row, row, row, vec],
        out_specs=[row, part, part],
        out_shape=[
            jax.ShapeDtypeStruct((N, D), r2.dtype),
            jax.ShapeDtypeStruct((G * 8, D), jnp.float32),
            jax.ShapeDtypeStruct((G * 8, D), jnp.float32),
        ],
        interpret=_interpret(),
    )(r2, dy2, dr2, scale.reshape(1, D))
    return g, dscale_p.sum(axis=0), dbias_p.sum(axis=0)


# --------------------------------------------------------------------------
# Public op with custom VJP
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _add_ln(x2, h2, scale, bias, eps):
    r, y = _fwd2(x2, h2, scale, bias, eps)
    return r, y


def _add_ln_fwd(x2, h2, scale, bias, eps):
    r, y = _fwd2(x2, h2, scale, bias, eps)
    return (r, y), (r, scale)


def _add_ln_bwd(eps, res, cts):
    r, scale = res
    dr_in, dy = cts
    g, dscale, dbias = _bwd2(r, dy, dr_in, scale, eps)
    return g, g, dscale.astype(scale.dtype), dbias.astype(scale.dtype)


_add_ln.defvjp(_add_ln_fwd, _add_ln_bwd)


def add_ln(x, h, p: dict, eps: float = 1e-5):
    """(x + h, LN(x + h)) over [..., D] in one HBM pass. p: {scale, bias}."""
    D = x.shape[-1]
    lead = x.shape[:-1]
    n = 1
    for s in lead:
        n *= s
    x2 = x.reshape(n, D)
    h2 = h.reshape(n, D)
    pad = (-n) % BLOCK_ROWS
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
        h2 = jnp.pad(h2, ((0, pad), (0, 0)))
    r2, y2 = _add_ln(x2, h2, p["scale"], p["bias"], float(eps))
    if pad:
        r2, y2 = r2[:n], y2[:n]
    return r2.reshape(*lead, D), y2.reshape(*lead, D)


def add_ln_reference(x, h, p: dict, eps: float = 1e-5):
    """Plain-XLA reference with the same numerics (tests only)."""
    from owlvit_tpu.models.layers import layer_norm

    r = x + h
    return r, layer_norm(p, r, eps)
