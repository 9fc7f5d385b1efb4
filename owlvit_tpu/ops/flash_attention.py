"""Pallas TPU fused attention for the ViT encoder, with custom VJP.

The ViT is the entire hot path (SURVEY §3.1/§3.3): 12-24 pre-LN blocks over
577 (B/32), 2305 (B/16) or 3601 (L/14) tokens. A naive attention materializes
the [B, H, S, S] score tensor in HBM (for B/16 at batch 32 that is ~4-8 GB per
direction); this kernel keeps scores in VMEM per query block and never writes
them out.

Shape strategy (TPU-first):
  * sequences padded to a multiple of the 128-row query block; padded KEYS are
    masked to -inf inside the kernel (padded QUERY rows compute garbage that
    is sliced off outside — cheaper than masking)
  * K/V for one (batch, head) fit comfortably in VMEM at these sequence
    lengths (<= 3712 x 64 x 4B ~ 1 MB), so each query block does one full-row
    softmax — numerically identical to exact attention, no online rescaling
  * grid (B*H, S/BQ); MXU matmuls with fp32 accumulation
  * backward = two Pallas kernels (dQ by query block, dK/dV by key block)
    using the stashed logsumexp, the standard flash-attention recompute

Non-causal, no-bias attention only (the vision tower); the text encoder
(16 tokens, init-time only) uses the XLA path via layers.attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

# Query/key block rows. 128 is the measured default; OWLVIT_BLOCK_Q=256
# halves the program count at ~5% extra padded rows (read at import so the
# pad-once in vit.forward and the kernels always agree).
BLOCK_Q = int(_os.environ.get("OWLVIT_BLOCK_Q", "128"))
_NEG = -1e30

# Longest padded sequence the FUSED backward kernel fits in VMEM for:
# its full-row K/V blocks + fp32 dk/dv scratch + [BQ, S] intermediates
# scale with S_pad — 18.16 MB at S_pad=3712 (L/14) vs the 16 MB scoped
# limit (compile-time OOM, measured r3). 2432 (B/16) compiles and runs.
_FUSED_MAX_S = int(_os.environ.get("OWLVIT_FUSED_MAX_S", "3072"))

# Interpret mode runs the kernels in the Pallas interpreter (CPU tests).
INTERPRET = False


def _interpret() -> bool:
    return INTERPRET or jax.default_backend() != "tpu"


def flash_supported() -> bool:
    return True


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


# --------------------------------------------------------------------------
# Forward
# --------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, s_real):
    # Matmul operands stay in the input dtype (bf16 on the train path) with
    # fp32 MXU accumulation — an fp32 multiply pass runs at ~1/8 the bf16
    # rate on v5e and was the round-1 "MXU ~12%" smoking gun. For bf16
    # inputs the products are identical; only softmax weights are rounded
    # to bf16 before the p@v matmul (standard flash practice).
    q = q_ref[0]  # [BQ, hd]
    k = k_ref[0]  # [S_pad, hd]
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [BQ, S_pad] fp32
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < s_real, s, _NEG)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / l).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l)  # [BQ, 1]


def _fwd(q3, k3, v3, scale, s_real):
    """q3/k3/v3: [BH, S_pad, hd] -> (o [BH, S_pad, hd], lse [BH, S_pad])."""
    BH, S_pad, hd = q3.shape
    grid = (BH, S_pad // BLOCK_Q)
    kernel = functools.partial(_fwd_kernel, scale=scale, s_real=s_real)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, hd), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_pad, hd), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_pad, hd), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BLOCK_Q, hd), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, S_pad, hd), q3.dtype),
            jax.ShapeDtypeStruct((BH, S_pad, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(q3, k3, v3)


# --------------------------------------------------------------------------
# Backward
# --------------------------------------------------------------------------


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
               *, scale, s_real):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]  # [BQ, 1]
    delta = delta_ref[0]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < s_real, s, _NEG)
    p = jnp.exp(s - lse)  # [BQ, S_pad] fp32

    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = (p * (dp - delta) * scale).astype(k.dtype)
    dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, *, scale, s_real):
    # one (batch*head, key-block) program; K block vs ALL queries
    q = q_ref[0]  # [S_pad, hd] (all queries)
    k = k_ref[0]  # [BK, hd]
    v = v_ref[0]
    do = do_ref[0]  # [S_pad, hd]
    lse = lse_ref[0]  # [S_pad, 1]
    delta = delta_ref[0]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    kcol = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + (
        pl.program_id(1) * k.shape[0]
    )
    s = jnp.where(kcol < s_real, s, _NEG)
    # padded query rows have lse=0 from masked fwd? they were computed on
    # garbage; kill their contribution explicitly:
    qrow = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    p = jnp.where(qrow < s_real, jnp.exp(s - lse), 0.0)  # [S_pad, BK] fp32
    pc = p.astype(do.dtype)

    dv = jax.lax.dot_general(pc, do, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [BK, hd]
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [S_pad, BK]
    ds = (p * (dp - delta) * scale).astype(q.dtype)
    dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [BK, hd]
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd(scale, s_real, res, g):
    q3, k3, v3, o3, lse = res
    BH, S_pad, hd = q3.shape
    do3 = g
    delta = jnp.sum(
        do3.astype(jnp.float32) * o3.astype(jnp.float32), axis=-1, keepdims=True
    )  # [BH, S_pad, 1]

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, s_real=s_real),
        grid=(BH, S_pad // BLOCK_Q),
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, hd), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_pad, hd), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_pad, hd), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q, hd), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_Q, hd), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, S_pad, hd), q3.dtype),
        interpret=_interpret(),
    )(q3, k3, v3, do3, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, s_real=s_real),
        grid=(BH, S_pad // BLOCK_Q),
        in_specs=[
            pl.BlockSpec((1, S_pad, hd), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q, hd), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q, hd), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_pad, hd), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_pad, 1), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_pad, 1), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BLOCK_Q, hd), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q, hd), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, S_pad, hd), k3.dtype),
            jax.ShapeDtypeStruct((BH, S_pad, hd), v3.dtype),
        ],
        interpret=_interpret(),
    )(q3, k3, v3, do3, lse, delta)
    return dq, dk, dv


# --------------------------------------------------------------------------
# Public API with custom VJP
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash3(q3, k3, v3, scale, s_real):
    o, _ = _fwd(q3, k3, v3, scale, s_real)
    return o


def _flash3_fwd(q3, k3, v3, scale, s_real):
    o, lse = _fwd(q3, k3, v3, scale, s_real)
    return o, (q3, k3, v3, o, lse)


_flash3.defvjp(_flash3_fwd, _bwd)


def flash_attention(q, k, v, *, scale, bias=None, causal=False, valid_len=None):
    """q/k/v: [B, S, H, hd] -> [B, S, H, hd]. Non-causal, no bias.

    valid_len: number of real tokens (keys beyond it are masked). When the
    caller pre-pads S to a BLOCK_Q multiple (vit.forward does this ONCE
    outside the layer scan), no per-call padding happens here.
    """
    if bias is not None or causal:
        raise NotImplementedError("flash path is for the ViT (no mask/bias)")
    B, S, H, hd = q.shape
    s_real = int(valid_len) if valid_len is not None else S
    S_pad = ((S + BLOCK_Q - 1) // BLOCK_Q) * BLOCK_Q

    def to3(x):
        x = x.transpose(0, 2, 1, 3).reshape(B * H, S, hd)
        return _pad_to(x, S_pad, axis=1)

    o = _flash3(to3(q), to3(k), to3(v), float(scale), s_real)
    o = o[:, :S].reshape(B, H, S, hd).transpose(0, 2, 1, 3)
    return o


# --------------------------------------------------------------------------
# Packed (transpose-free) path: q/k/v stay [B, S, D]; the grid tiles
# (batch, head-group, query-block) and each program sees only its group's
# lane slice of K/V, so VMEM holds a few MB even for L/14. Eliminates the
# [B,S,H,hd]<->[B*H,S,hd] layout copies that profiling showed at ~10% of the
# train step.
# --------------------------------------------------------------------------

GROUP_LANES = 128  # lanes (features) per head-group block; 2 heads at hd=64


def _group_heads(num_heads: int, head_dim: int) -> int:
    """Heads per group such that group lanes <= GROUP_LANES (>=1)."""
    return max(1, min(num_heads, GROUP_LANES // head_dim))


# NOTE: a batched-heads fwd kernel variant (one [hg, BQ, hd] x [hg, S, hd]
# dot_general per program instead of a python loop over lane slices) was
# built and measured in r2: bit-exact in interpret mode, but Mosaic rejects
# the in-kernel lane-dim reshape/transposes on real TPU (remote-compile 500,
# CLAUDE.md invariants). Deleted in r3 per VERDICT §Weak-5 — per-head lane
# slicing below is the only Mosaic-legal shape for this kernel.


# Default fixed softmax shift for non-fp32 kernels. Any C is mathematically
# exact (softmax shift invariance; the stashed lse = C + log(sum) is
# C-invariant, so the backward recomputation stays consistent); fp-wise it
# is safe while max-row logits stay within ~C±88 (fp32 exp range; ViT
# attention logits are O(±30), r2 trace). Measured on chip: serving fwd
# 154.4 -> 171.2 img/s at C=0 and 170.8 at C=20 (+10.9%, within noise of
# each other); grads agree with the dynamic-max and pure-XLA paths at
# bf16 eps (tools/tpu_kernel_parity.py, BENCH.md r4). C=20 is the default:
# it restores overflow headroom to logits ~+108 for arbitrary post-finetune
# serving inputs (ADVICE r4: at C=0, any logit >+88 overflows exp to inf ->
# inf/inf NaN, where the per-row-max path is robust). OWLVIT_STATIC_MAX=off
# is the escape hatch if a deployment ever sees hotter logits.
#
# GATED to pure-inference PROCESSES (static_softmax is threaded from
# OwlViTConfig.static_softmax, set only by serve.py / cli infer / serving
# tools): static-max kernels in any process that also runs grad executables
# faulted the relay 5/6 across r4b-r4d — including from a SEPARATE fwd-only
# executable under stop_gradient (r4d: the gated cache-build prefix + a
# dynamic tail grad faulted 2/2, and bench r4d died the same way), while
# every all-fwd process passed 13+/13+ (serving floods + direct loops +
# warmups). The r1/r3 Mosaic lesson again: composition faults that never
# show standalone (kernel-parity grads at static were clean and bf16-eps
# correct).
_STATIC_MAX_DEFAULT = 20.0


def _static_max_env(dtype=None):
    """Fixed-shift softmax constant for the packed fwd kernel: it computes
    exp(s - C) with a compile-time C instead of the per-row max — dropping
    the [BQ, S] max reduction and its broadcast subtract (two of the
    softmax's five VPU passes; the fwd trace shows the kernel exp/mask-bound
    at ~3x matmul-only SoL).

    OWLVIT_STATIC_MAX=<float> forces that C; =off (or =dynamic) restores the
    per-row max; unset -> C=_STATIC_MAX_DEFAULT for non-fp32 kernels (the
    fp32 path keeps the max-shifted form: it exists for strict-parity runs).
    Parity is checked on chip by tools/tpu_kernel_parity.py. See the
    _STATIC_MAX_DEFAULT comment before changing C."""
    v = _os.environ.get("OWLVIT_STATIC_MAX", "")
    if v.lower() in ("off", "dynamic"):
        return None
    if v:
        return float(v)
    if dtype is not None and jnp.dtype(dtype) != jnp.float32:
        return _STATIC_MAX_DEFAULT
    return None


def _pk_fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref,
                   *, scale, hg, hd, fast_softmax, static_max=None):
    q = q_ref[0]  # [BQ, hg*hd]
    k = k_ref[0]  # [S_pad, hg*hd]
    v = v_ref[0]
    outs, lses = [], []
    for h in range(hg):
        sl = slice(h * hd, (h + 1) * hd)
        # scale on the small [BQ, hd] q tile (exact: hd=64 -> scale=2^-3),
        # NOT on the [BQ, S] scores — that would be a full extra VPU pass.
        qh = (q[:, sl] * jnp.asarray(scale, q.dtype)).astype(q.dtype)
        kh = k[:, sl]
        vh = v[:, sl]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # key-pad masking as ONE broadcast add of a precomputed [1, S] bias
        # row (0 real / -1e30 pad) instead of iota+compare+select passes
        s = s + bias_ref[0]
        if static_max is not None:
            # shift-invariant softmax with a fixed shift: no max pass (see
            # _static_max_env). Pad columns hold -1e30 -> exp underflows to
            # exactly 0, same as the max-shifted form.
            c = jnp.float32(static_max)
            p = jnp.exp(s - c)
            l = jnp.sum(p, axis=-1, keepdims=True)
            oh = jax.lax.dot_general(
                p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) / l
            outs.append(oh)
            lses.append(c + jnp.log(l))
            continue
        m = jnp.max(s, axis=-1, keepdims=True)
        if fast_softmax and v.dtype != jnp.float32:
            # exp in the input dtype (2x VPU rate, half the VMEM traffic on
            # the [BQ, S] weights; and no final cast before the p@v matmul).
            # Only used for STOP-GRADIENT (frozen) layers, where there is no
            # backward to stay consistent with; ~0.5% attention-weight noise
            # on activations that already carry bf16 rounding.
            p = jnp.exp((s - m).astype(v.dtype))
            l = jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32)
            oh = jax.lax.dot_general(
                p, vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) / l
        else:
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            oh = jax.lax.dot_general(
                p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) / l
        outs.append(oh)
        lses.append(m + jnp.log(l))
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)
    lse_ref[0, 0] = jnp.concatenate(lses, axis=-1)  # [BQ, hg]


def _pk_compiler_params():
    """Optional Mosaic hints for the packed kernels (A/B via env):
    OWLVIT_DIMSEM=1 marks the (B, G) grid dims parallel (the q/k-block dim
    stays arbitrary so full-row K/V block residency is preserved)."""
    import os

    if os.environ.get("OWLVIT_DIMSEM") != "1":
        return None
    return pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary")
    )


def _key_bias_row(S_pad: int, s_real: int):
    """[1, S_pad] fp32 additive mask row: 0 for real keys, -1e30 for pad.
    One broadcast ADD inside the kernels replaces iota+compare+select."""
    return jnp.where(
        jnp.arange(S_pad)[None, :] < s_real, jnp.float32(0), jnp.float32(_NEG)
    )


def _pk_specs(S_pad, D, BQ, lanes):
    """(q-block, kv-block, o-block) BlockSpecs over [B, S_pad, D] with grid
    (B, G, S_pad//BQ)."""
    qspec = pl.BlockSpec((1, BQ, lanes), lambda b, g, i: (b, i, g),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, S_pad, lanes), lambda b, g, i: (b, 0, g),
                          memory_space=pltpu.VMEM)
    return qspec, kvspec


# --------------------------------------------------------------------------
# GSPMD batch partitioning for the pallas calls.
#
# Without this, the partitioner has no rule for a pallas_call and falls back
# to FULL REPLICATION: measured on the 8-device CPU mesh, a dp-sharded batch
# hit 15 all-gathers around the flash kernels — on real multi-chip every
# chip would receive the whole batch. custom_partitioning declares the
# obvious rule: everything (inputs, outputs) is sharded on the leading
# batch dim, and each shard runs the same kernel locally.
# --------------------------------------------------------------------------


def _batch_sharded(fn, sharding_rule: str, need_replication=()):
    """Wrap fn(*arrays) -> tuple(arrays), ALL with a leading batch dim, so
    GSPMD shards it along whatever mesh axis the first input's batch dim
    uses (replicated when none). sharding_rule is the Shardy einsum-like
    rule (e.g. "b s d, b s d -> b s d"); non-batch factors are declared
    need-replication so sharding S/D would insert gathers instead of
    silently computing block-local attention."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    cp = custom_partitioning(fn)

    def _batch_axis(arg_shapes):
        for a in arg_shapes:
            sh = getattr(a, "sharding", None)
            spec = getattr(sh, "spec", None)
            if spec and len(spec) and spec[0] is not None:
                return spec[0]
        return None

    def _shardings(mesh, axis, shapes):
        return tuple(
            NamedSharding(mesh, PartitionSpec(axis, *([None] * (len(x.shape) - 1))))
            for x in shapes
        )

    def infer(mesh, arg_shapes, result_shape):
        axis = _batch_axis(arg_shapes)
        res = result_shape if isinstance(result_shape, (list, tuple)) else (result_shape,)
        out = _shardings(mesh, axis, res)
        return out if isinstance(result_shape, (list, tuple)) else out[0]

    def partition(mesh, arg_shapes, result_shape):
        axis = _batch_axis(arg_shapes)
        res = result_shape if isinstance(result_shape, (list, tuple)) else (result_shape,)
        res_sh = _shardings(mesh, axis, res)
        if not isinstance(result_shape, (list, tuple)):
            res_sh = res_sh[0]
        return (
            mesh,
            fn,
            res_sh,
            _shardings(mesh, axis, arg_shapes),
        )

    cp.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule=sharding_rule,
        need_replication_factors=tuple(need_replication),
    )
    return cp


def _pk_fwd(q2, k2, v2, scale, s_real, H, hd, fast_softmax=False,
            static_softmax=False):
    S_pad = q2.shape[1]

    def core(q2, k2, v2):
        B, S_pad, D = q2.shape
        hg = _group_heads(H, hd)
        G = H // hg
        lanes = hg * hd
        qspec, kvspec = _pk_specs(S_pad, D, BLOCK_Q, lanes)
        bias = _key_bias_row(S_pad, s_real)
        bspec = pl.BlockSpec((1, S_pad), lambda b, g, i: (0, 0),
                             memory_space=pltpu.VMEM)
        kern = functools.partial(
            _pk_fwd_kernel, scale=scale, hg=hg, hd=hd,
            fast_softmax=fast_softmax,
            static_max=_static_max_env(q2.dtype) if static_softmax else None,
        )
        return pl.pallas_call(
            kern,
            grid=(B, G, S_pad // BLOCK_Q),
            compiler_params=_pk_compiler_params(),
            in_specs=[qspec, kvspec, kvspec, bspec],
            out_specs=[
                qspec,
                pl.BlockSpec((1, 1, BLOCK_Q, hg), lambda b, g, i: (b, g, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, S_pad, D), q2.dtype),
                jax.ShapeDtypeStruct((B, G, S_pad, hg), jnp.float32),
            ],
            interpret=_interpret(),
        )(q2, k2, v2, bias)

    return _batch_sharded(
        core,
        "b s d, b s d, b s d -> b s d, b g s h",
        need_replication=("s", "d", "g", "h"),
    )(q2, k2, v2)


def _pk_dq_kernel(q_ref, k_ref, v_ref, do_ref, o_ref, bias_ref, dq_ref,
                  *, scale, hg, hd):
    """dQ by query block. lse and delta are RECOMPUTED inline from the score
    row / (do, o) block — the round-1 version plumbed them in through
    [.., BQ, hg] blocks whose 2-wide lane dimension was the prime suspect in
    the on-device fault (NOTES_NEXT_ROUND r1); recomputing costs one row max
    + sum on an s matrix the kernel computes anyway and removes the narrow
    blocks entirely."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    o = o_ref[0]
    dqs = []
    for h in range(hg):
        sl = slice(h * hd, (h + 1) * hd)
        qh = q[:, sl]
        # ONE scale application on the small [S, hd] k tile covers both the
        # score product and the chain-rule factor (dq = scale * ds' @ k).
        kh = (k[:, sl] * jnp.asarray(scale, k.dtype)).astype(k.dtype)
        vh = v[:, sl]
        doh = do[:, sl]
        oh = o[:, sl]
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s + bias_ref[0]  # pad keys -> -1e30
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)  # softmax == exp(s - lse)
        delta = jnp.sum(
            doh.astype(jnp.float32) * oh.astype(jnp.float32),
            axis=-1, keepdims=True,
        )  # [BQ, 1]
        dp = jax.lax.dot_general(doh, vh, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - delta)).astype(kh.dtype)
        dqs.append(jax.lax.dot_general(ds, kh, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32))
    dq_ref[0] = jnp.concatenate(dqs, axis=-1).astype(dq_ref.dtype)


def _pk_dkv_kernel(k_ref, v_ref, q_ref, do_ref, lse_ref, delta_ref, bias_ref,
                   dk_ref, dv_ref, *, scale, s_real, hg, hd):
    """dK/dV by key block, TRANSPOSED: scores are [BK keys, S queries], so
    the per-query lse/delta broadcast as [1, S] ROWS (lane dim = S_pad,
    128-aligned) instead of the round-1 [S, 1] columns fed through 2-lane
    blocks. All matmuls contract cleanly on the MXU."""
    k = k_ref[0]       # [BK, lanes]
    v = v_ref[0]
    q = q_ref[0]       # [S_pad, lanes] (all queries, this group's lanes)
    do = do_ref[0]     # [S_pad, lanes]
    dks, dvs = [], []
    for h in range(hg):
        sl = slice(h * hd, (h + 1) * hd)
        kh = k[:, sl]
        vh = v[:, sl]
        # scaled q tile serves the score product AND the chain-rule factor
        # in dk = scale * ds' @ q.
        qh = (q[:, sl] * jnp.asarray(scale, q.dtype)).astype(q.dtype)
        doh = do[:, sl]
        lse = lse_ref[0, 0][h : h + 1, :]      # [1, S_pad]
        delta = delta_ref[0, 0][h : h + 1, :]  # [1, S_pad]
        st = jax.lax.dot_general(kh, qh, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # Padded QUERY columns: the -1e30 bias row drives exp(st - lse) to
        # exactly 0 (their lse is finite garbage). Padded KEY rows must also
        # be zeroed: their dk/dv would otherwise leak into shared projection
        # weight grads (the pad lives outside the layer scan, so pad-row
        # cotangents are never sliced off inside a layer) — one multiply by
        # a 0/1 column.
        pt = jnp.exp(st + bias_ref[0] - lse)
        krow = jax.lax.broadcasted_iota(
            jnp.int32, (st.shape[0], 1), 0
        ) + pl.program_id(2) * k.shape[0]
        pt = pt * (krow < s_real).astype(jnp.float32)
        dvs.append(jax.lax.dot_general(pt.astype(doh.dtype), doh,
                                       (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32))
        dpt = jax.lax.dot_general(vh, doh, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)  # [BK, S]
        dst = (pt * (dpt - delta)).astype(qh.dtype)
        dks.append(jax.lax.dot_general(dst, qh, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32))
    dk_ref[0] = jnp.concatenate(dks, axis=-1).astype(dk_ref.dtype)
    dv_ref[0] = jnp.concatenate(dvs, axis=-1).astype(dv_ref.dtype)


def _pk_fused_bwd_kernel(q_ref, k_ref, v_ref, do_ref, o_ref, bias_ref,
                         dq_ref, dk_ref, dv_ref, dk_acc, dv_acc,
                         *, scale, s_real, hg, hd):
    """Fused dQ+dK+dV in ONE kernel (r3, VERDICT next #4a).

    The split backward runs two kernels that each rebuild the [BQ, S] score
    matrix: dq by query block (4 matmuls/program) and dkv by key block
    (4 matmuls + an extra transposed score product). Fusing shares ONE
    recomputed p and ONE dp between all three grads: 5 matmuls/program
    total vs 9 across the two kernels — near-halving the backward's MXU
    and VMEM traffic.

    dk/dv are ACCUMULATED across the (sequential, innermost) query-block
    grid dim in fp32 VMEM SCRATCH and written to the HBM output blocks
    ONCE, on the last query block — the canonical pallas reduction idiom.
    (A first version accumulated directly into revisited fp32 output
    blocks: it ran standalone but reproducibly faulted the device inside
    the full train-step graph — r3 sessions, 3/3 — echoing the r1 lesson
    that Mosaic block patterns can pass lowering and standalone runs yet
    fault in composition. Scratch also lets the outputs be bf16 directly:
    one cast at the end instead of 2x239 MB fp32 HBM writes + a cast
    pass.) fp32 accumulation keeps the partial sums exact enough that the
    final bf16 cast matches the single-matmul split kernels to ~1 ulp.
    Padded KEY columns contribute nothing (bias row drives p to 0 ->
    their dk/dv rows stay 0); padded QUERY rows are masked explicitly
    (their p is garbage — the pad lives outside the layer scan, so their
    cotangents would leak into shared weight grads).
    """
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = q_ref[0]    # [BQ, lanes]
    k = k_ref[0]    # [S_pad, lanes]
    v = v_ref[0]
    do = do_ref[0]  # [BQ, lanes]
    o = o_ref[0]
    BQ = q.shape[0]
    # padded-query-row mask [BQ, 1]: global row index >= s_real -> 0
    qrow = jax.lax.broadcasted_iota(jnp.int32, (BQ, 1), 0) + i * BQ
    qmask = (qrow < s_real).astype(jnp.float32)
    dqs, dks, dvs = [], [], []
    for h in range(hg):
        sl = slice(h * hd, (h + 1) * hd)
        qh = q[:, sl]
        # ONE scale application on each small [*, hd] tile: kh_s serves the
        # score product AND dq = ds @ (scale*k); qh_s serves
        # dk = ds^T @ (scale*q). Scaling both full operands of s would
        # square the scale.
        kh_s = (k[:, sl] * jnp.asarray(scale, k.dtype)).astype(k.dtype)
        qh_s = (qh * jnp.asarray(scale, q.dtype)).astype(q.dtype)
        vh = v[:, sl]
        doh = do[:, sl]
        oh = o[:, sl]
        s = jax.lax.dot_general(qh, kh_s, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s + bias_ref[0]  # pad keys -> -1e30
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)  # softmax == exp(s - lse)
        if s_real < k.shape[0]:  # static: skip the pass when nothing is padded
            p = p * qmask  # padded query rows contribute nothing anywhere
        delta = jnp.sum(
            doh.astype(jnp.float32) * oh.astype(jnp.float32),
            axis=-1, keepdims=True,
        )  # [BQ, 1]
        dp = jax.lax.dot_general(doh, vh, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - delta)).astype(kh_s.dtype)  # [BQ, S_pad]
        dqs.append(jax.lax.dot_general(ds, kh_s, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32))
        # contraction over the BQ query rows of this block:
        dks.append(jax.lax.dot_general(ds, qh_s, (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32))
        dvs.append(jax.lax.dot_general(p.astype(doh.dtype), doh,
                                       (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32))
    dq_ref[0] = jnp.concatenate(dqs, axis=-1).astype(dq_ref.dtype)
    dk_acc[...] += jnp.concatenate(dks, axis=-1)
    dv_acc[...] += jnp.concatenate(dvs, axis=-1)

    @pl.when(i == pl.num_programs(2) - 1)
    def _flush():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _transposed_bwd_from_packed(scale, s_real, H, hd, res, g):  # noqa: D401
    """Compute (dq, dk, dv) for packed [B, S, D] tensors via the transposed
    [B*H, S, hd] kernels (layout copies included) — the hybrid fallback."""
    q2, k2, v2, o2, lse_pk = res
    B, S_pad, D = q2.shape
    hg = _group_heads(H, hd)

    def to3(x):
        return (
            x.reshape(B, S_pad, H, hd).transpose(0, 2, 1, 3).reshape(B * H, S_pad, hd)
        )

    def from3(x):
        return (
            x.reshape(B, H, S_pad, hd).transpose(0, 2, 1, 3).reshape(B, S_pad, D)
        )

    lse3 = lse_pk.transpose(0, 1, 3, 2).reshape(B * H, S_pad)[..., None]
    dq3, dk3, dv3 = _bwd(
        scale, s_real, (to3(q2), to3(k2), to3(v2), to3(o2), lse3), to3(g)
    )
    return from3(dq3), from3(dk3), from3(dv3)


def _pk_bwd_mode(hint: str | None = None) -> str:
    """Which packed-backward variant runs:
    'fused' — ONE dq+dk+dv kernel sharing the recomputed p (5 matmuls/
    program vs 9 across the split pair). +23% on the cached tail step
    (428 vs 347 img/s with the unrolled tail, r3 on-chip A/B);
    'both' — the r2 split pair (dq kernel + transposed dkv kernel);
    'dq'/'dkv' — diagnostic halves (isolating the r1 device fault).

    Mode resolution: the OWLVIT_PACKED_BWD env var wins when set (A/B
    knob); otherwise the caller's `hint` (layers.encoder passes 'both'
    for SCANNED stacks — the fused kernel reproducibly faulted the
    device inside the full layer-in-scan backward, 4/4 r3 sessions,
    while a bare scan repro and every unrolled composition run clean);
    otherwise 'fused'."""
    import os

    env = os.environ.get("OWLVIT_PACKED_BWD")
    if env:
        return env
    return hint or "fused"


def _check_differentiable(fast_softmax: bool) -> None:
    if fast_softmax:
        raise NotImplementedError(
            "fast_softmax=True has no consistent backward (the forward "
            "computed softmax weights in the input dtype; the backward "
            "recomputes them in fp32). It is only for layers under "
            "stop_gradient — vit.forward applies it to the frozen prefix "
            "exactly so. Pass fast_softmax=False on differentiated calls."
        )


def _pk_bwd(scale, s_real, H, hd, fast_softmax, bwd_hint, static_softmax,
            res, g):
    # static_softmax only shapes the FORWARD kernel (the bwd recompute is
    # lse-based and shift-invariant); it rides the nondiff args for the vjp
    # signature only. Differentiated calls should pass it False anyway:
    # static-max inside grad compositions faulted the device 4/5 on the
    # relay while every fwd-only composition passed (BENCH.md r4c).
    _check_differentiable(fast_softmax)
    mode = _pk_bwd_mode(bwd_hint)

    def core(q2, k2, v2, o2, lse, do2):
        B, S_pad, D = q2.shape
        hg = _group_heads(H, hd)
        G = H // hg
        lanes = hg * hd
        mode_eff = mode
        # Fused-kernel query-block rows: [BQ, S] fp32 intermediates scale
        # with BQ, so a smaller BQ trades grid steps for VMEM headroom at
        # long sequences. OWLVIT_FUSED_BQ forces a value (e.g. 64 to try
        # fused at L/14); default keeps BLOCK_Q.
        bq = int(_os.environ.get("OWLVIT_FUSED_BQ", "0")) or BLOCK_Q
        # fp32 inputs double the full-row K/V/do/o block footprint: bf16
        # S_pad=2432 fits (measured) but f32 at the same S needs 17.84 MB
        # (> the 16 MB scoped limit, r3 bench fp32-baseline compile OOM)
        max_s = _FUSED_MAX_S if q2.dtype.itemsize <= 2 else _FUSED_MAX_S * 2 // 3
        if mode == "fused" and S_pad > max_s and bq >= BLOCK_Q:
            # The fused kernel holds full-row K/V + fp32 dk/dv scratch +
            # [BQ, S] fp32 intermediates in VMEM: at L/14 (S_pad 3712 bf16)
            # that is 18.16 MB against the 16 MB scoped-vmem limit at
            # BQ=128 (compile-time OOM, r3 measured). For bf16 inputs,
            # HALVING the query block halves the [BQ, S] terms and fits:
            # measured at L/14 — kernel parity clean (max-rel ≤ bf16 eps),
            # standalone fastest (fused 39.2 ms vs split 43.1 b2), cached
            # tail step +1.5% resident / neutral gather vs the split pair,
            # loss bit-identical (r3 A/B r3_l14_tail_{ctrl,fused64}). fp32
            # keeps the split fallback: its full-row K/V/do/o blocks
            # dominate the budget and BQ=64 there is unmeasured.
            if q2.dtype.itemsize <= 2 and S_pad <= 2 * _FUSED_MAX_S:
                bq = BLOCK_Q // 2
            else:
                mode_eff = "both"
        if mode_eff == "fused":
            qspec, kvspec = _pk_specs(S_pad, D, bq, lanes)
            bias = _key_bias_row(S_pad, s_real)
            bspec = pl.BlockSpec((1, S_pad), lambda b, g, i: (0, 0),
                                 memory_space=pltpu.VMEM)
            # dk/dv accumulate in fp32 VMEM scratch across the sequential
            # query-block dim; the output block (index constant in i) is
            # written once, on the last i
            accspec = pl.BlockSpec((1, S_pad, lanes), lambda b, g, i: (b, 0, g),
                                   memory_space=pltpu.VMEM)
            dq, dk, dv = pl.pallas_call(
                functools.partial(
                    _pk_fused_bwd_kernel, scale=scale, s_real=s_real,
                    hg=hg, hd=hd,
                ),
                grid=(B, G, S_pad // bq),
                compiler_params=_pk_compiler_params(),
                in_specs=[qspec, kvspec, kvspec, qspec, qspec, bspec],
                out_specs=[qspec, accspec, accspec],
                out_shape=[
                    jax.ShapeDtypeStruct((B, S_pad, D), q2.dtype),
                    jax.ShapeDtypeStruct((B, S_pad, D), k2.dtype),
                    jax.ShapeDtypeStruct((B, S_pad, D), v2.dtype),
                ],
                scratch_shapes=[
                    pltpu.VMEM((S_pad, lanes), jnp.float32),
                    pltpu.VMEM((S_pad, lanes), jnp.float32),
                ],
                interpret=_interpret(),
            )(q2, k2, v2, do2, o2, bias)
            return dq, dk, dv
        if mode_eff != "both":
            dq_t, dk_t, dv_t = _transposed_bwd_from_packed(
                scale, s_real, H, hd, (q2, k2, v2, o2, lse), do2
            )
        # dkv wants per-query rows: lse/delta as [B, G, hg, S_pad] (S in
        # lanes). The hg (=2) dim is PADDED to 8 sublanes: full-model grads
        # faulted on device with 2-sublane full-row blocks (isolated via
        # OWLVIT_PACKED_BWD — packed dq alone ran, packed dkv alone
        # faulted); 8-sublane blocks are the canonical tile shape.
        hs = 8
        lse_t = jnp.pad(
            lse.transpose(0, 1, 3, 2), ((0, 0), (0, 0), (0, hs - hg), (0, 0))
        )  # [B, G, 8, S_pad]
        delta_t = jnp.pad(
            jnp.sum(
                (do2.astype(jnp.float32) * o2.astype(jnp.float32)).reshape(
                    B, S_pad, G, hg, hd
                ),
                axis=-1,
            ).transpose(0, 2, 3, 1),
            ((0, 0), (0, 0), (0, hs - hg), (0, 0)),
        )  # [B, G, 8, S_pad]

        qspec, kvspec = _pk_specs(S_pad, D, BLOCK_Q, lanes)
        rows_full = pl.BlockSpec(
            (1, 1, hs, S_pad), lambda b, g, i: (b, g, 0, 0),
            memory_space=pltpu.VMEM,
        )
        bias = _key_bias_row(S_pad, s_real)
        bspec2 = pl.BlockSpec((1, S_pad), lambda b, g, i: (0, 0),
                              memory_space=pltpu.VMEM)
        if mode_eff in ("both", "dq"):
            dq = pl.pallas_call(
                functools.partial(_pk_dq_kernel, scale=scale, hg=hg, hd=hd),
                grid=(B, G, S_pad // BLOCK_Q),
                compiler_params=_pk_compiler_params(),
                in_specs=[qspec, kvspec, kvspec, qspec, qspec, bspec2],
                out_specs=qspec,
                out_shape=jax.ShapeDtypeStruct((B, S_pad, D), q2.dtype),
                interpret=_interpret(),
            )(q2, k2, v2, do2, o2, bias)
        else:
            dq = dq_t

        if mode_eff in ("both", "dkv"):
            dk, dv = pl.pallas_call(
                functools.partial(
                    _pk_dkv_kernel, scale=scale, s_real=s_real, hg=hg, hd=hd
                ),
                grid=(B, G, S_pad // BLOCK_Q),
                compiler_params=_pk_compiler_params(),
                in_specs=[qspec, qspec, kvspec, kvspec, rows_full, rows_full,
                          bspec2],
                out_specs=[qspec, qspec],
                out_shape=[
                    jax.ShapeDtypeStruct((B, S_pad, D), k2.dtype),
                    jax.ShapeDtypeStruct((B, S_pad, D), v2.dtype),
                ],
                interpret=_interpret(),
            )(k2, v2, q2, do2, lse_t, delta_t, bias)
        else:
            dk, dv = dk_t, dv_t
        return dq, dk, dv

    q2, k2, v2, o2, lse = res
    return _batch_sharded(
        core,
        "b s d, b s d, b s d, b s d, b g s h, b s d -> b s d, b s d, b s d",
        need_replication=("s", "d", "g", "h"),
    )(q2, k2, v2, o2, lse, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def _flash_packed(q2, k2, v2, scale, s_real, H, hd, fast_softmax=False,
                  bwd_hint=None, static_softmax=False):
    o, _ = _pk_fwd(q2, k2, v2, scale, s_real, H, hd, fast_softmax,
                   static_softmax)
    return o


def _flash_packed_fwd(q2, k2, v2, scale, s_real, H, hd, fast_softmax=False,
                      bwd_hint=None, static_softmax=False):
    o, lse = _pk_fwd(q2, k2, v2, scale, s_real, H, hd, fast_softmax,
                     static_softmax)
    return o, (q2, k2, v2, o, lse)


_flash_packed.defvjp(_flash_packed_fwd, _pk_bwd)


def packed_supported(num_heads: int, head_dim: int, D: int) -> bool:
    """Default ON since r2: the transpose-free packed fwd+bwd is validated
    on-chip at B/16 b32 (grads match the transposed path to 1 bf16 ulp;
    115.1 vs 109.5 img/s full train step). The round-1 device fault was
    root-caused to 2-sublane lse/delta full-row blocks in the dK/dV kernel
    (now padded to the canonical 8 sublanes). OWLVIT_PACKED_FLASH=0 falls
    back to the hybrid (packed-fwd / transposed-bwd) path."""
    import os

    if os.environ.get("OWLVIT_PACKED_FLASH", "1") == "0":
        return False
    hg = _group_heads(num_heads, head_dim)
    return num_heads % hg == 0 and hg * head_dim <= D


def flash_attention_packed(q2, k2, v2, *, scale, num_heads, valid_len=None,
                           fast_softmax=False, bwd_hint=None,
                           static_softmax=False):
    """q2/k2/v2: [B, S, D] (D = H*hd), no layout change. S should already be
    a BLOCK_Q multiple (vit.forward pads once); pads here otherwise.

    bwd_hint: caller's packed-backward preference ('fused'/'both'); the
    OWLVIT_PACKED_BWD env var overrides it (see _pk_bwd_mode).
    static_softmax: allow the fixed-shift softmax (no per-row max pass;
    _static_max_env). Pass True ONLY on stop-gradient / pure-inference
    calls — grad compositions with it faulted the relay (BENCH.md r4c)."""
    B, S, D = q2.shape
    hd = D // num_heads
    s_real = int(valid_len) if valid_len is not None else S
    S_pad = ((S + BLOCK_Q - 1) // BLOCK_Q) * BLOCK_Q
    q2 = _pad_to(q2, S_pad, axis=1)
    k2 = _pad_to(k2, S_pad, axis=1)
    v2 = _pad_to(v2, S_pad, axis=1)
    o = _flash_packed(
        q2, k2, v2, float(scale), s_real, int(num_heads), hd,
        bool(fast_softmax), bwd_hint, bool(static_softmax),
    )
    return o[:, :S]


# --------------------------------------------------------------------------
# Hybrid path: packed (transpose-free) FORWARD + transposed BACKWARD.
# The packed forward is stable on hardware (full-model fwd verified); the
# packed backward is what trips the remote compiler (see NOTES_NEXT_ROUND).
# With the reference freeze set only ONE layer runs backward, so paying the
# layout copies there while removing them from all forward layers keeps
# nearly all of the win at none of the risk.
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _flash_hybrid(q2, k2, v2, scale, s_real, H, hd, fast_softmax=False,
                  static_softmax=False):
    o, _ = _pk_fwd(q2, k2, v2, scale, s_real, H, hd, fast_softmax,
                   static_softmax)
    return o


def _flash_hybrid_fwd(q2, k2, v2, scale, s_real, H, hd, fast_softmax=False,
                      static_softmax=False):
    o, lse = _pk_fwd(q2, k2, v2, scale, s_real, H, hd, fast_softmax,
                     static_softmax)
    return o, (q2, k2, v2, o, lse)


def _hybrid_bwd(scale, s_real, H, hd, fast_softmax, static_softmax, res, g):
    _check_differentiable(fast_softmax)
    return _transposed_bwd_from_packed(scale, s_real, H, hd, res, g)


_flash_hybrid.defvjp(_flash_hybrid_fwd, _hybrid_bwd)


def hybrid_supported(num_heads: int, head_dim: int, D: int) -> bool:
    hg = _group_heads(num_heads, head_dim)
    return num_heads % hg == 0 and hg * head_dim <= D


def flash_attention_hybrid(q2, k2, v2, *, scale, num_heads, valid_len=None,
                           fast_softmax=False, static_softmax=False):
    """[B, S, D] in/out; packed fwd, transposed bwd."""
    B, S, D = q2.shape
    hd = D // num_heads
    s_real = int(valid_len) if valid_len is not None else S
    S_pad = ((S + BLOCK_Q - 1) // BLOCK_Q) * BLOCK_Q
    q2 = _pad_to(q2, S_pad, axis=1)
    k2 = _pad_to(k2, S_pad, axis=1)
    v2 = _pad_to(v2, S_pad, axis=1)
    o = _flash_hybrid(
        q2, k2, v2, float(scale), s_real, int(num_heads), hd,
        bool(fast_softmax), bool(static_softmax),
    )
    return o[:, :S]
