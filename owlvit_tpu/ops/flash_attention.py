"""Pallas TPU flash attention for the ViT encoder (placeholder gate).

The fused kernel lands in ops/flash_attention (milestone: performance layer);
until then `flash_supported()` returns False and the model layer routes to the
XLA einsum-softmax path, which XLA fuses well on TPU for these sequence
lengths (577/2305/3601 tokens).
"""

from __future__ import annotations


def flash_supported() -> bool:
    return False


def flash_attention(q, k, v, *, scale: float, bias=None, causal: bool = False):
    raise NotImplementedError("Pallas flash attention not yet wired in")
