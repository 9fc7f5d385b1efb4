"""Serving export: serialize the inference function as portable StableHLO.

The reference has no deployment story at all (the model dies with the
process, SURVEY §5.4). Here the fused inference step (normalize -> ViT ->
heads -> query-bank sims) is exported with jax.export into a
self-describing artifact that any JAX runtime (or IFRT-based server) can
load and call without this package's Python code.

    from owlvit_tpu.train.export import export_detector, load_exported
    blob = export_detector(params, cfg, batch_size=1)
    fn = load_exported(blob)
    boxes, sims = fn(images_uint8)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from owlvit_tpu.models import owlvit
from owlvit_tpu.ops.preprocess import normalize_image


def make_infer_fn(params: dict, cfg):
    """Closure over params: uint8 images [B, S, S, 3] -> (boxes, sims)."""

    def infer(images):
        px = normalize_image(images)
        return owlvit.forward_train(params, cfg, px)

    return infer


def export_detector(params: dict, cfg, batch_size: int = 1) -> bytes:
    """Serialize the jitted inference step to a portable artifact.

    Weights are baked in as constants: one self-contained file, but the
    artifact is as big as the model (and this environment's remote-compile
    relay rejects large artifacts with HTTP 413 — use the weightless
    variant below for that)."""
    cfg = cfg.replace(trainable_last_k=None)
    size = cfg.vision.image_size
    spec = jax.ShapeDtypeStruct((batch_size, size, size, 3), jnp.uint8)
    exported = jax_export.export(jax.jit(make_infer_fn(params, cfg)))(spec)
    return bytes(exported.serialize())


def export_detector_weightless(params: dict, cfg, batch_size: int = 1) -> bytes:
    """Serialize the inference GRAPH with params as call-time inputs.

    The artifact holds only the program (a few MB vs the full model size);
    weights ship separately — `cli export --weightless` writes the CURRENT
    (fine-tuned) params to <out>.npz alongside the artifact. Pair with
    load_exported_weightless(blob, convert.load_params(npz))."""
    cfg = cfg.replace(trainable_last_k=None)
    size = cfg.vision.image_size

    def infer(params, images):
        px = normalize_image(images)
        return owlvit.forward_train(params, cfg, px)

    p_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype), params
    )
    img_spec = jax.ShapeDtypeStruct((batch_size, size, size, 3), jnp.uint8)
    exported = jax_export.export(jax.jit(infer))(p_spec, img_spec)
    return bytes(exported.serialize())


def save_exported(path: str, blob: bytes) -> None:
    with open(path, "wb") as f:
        f.write(blob)


def _read_blob(blob_or_path) -> bytes:
    if isinstance(blob_or_path, str):
        with open(blob_or_path, "rb") as f:
            return f.read()
    return bytes(blob_or_path)


def load_exported(blob_or_path):
    """Deserialize an exported detector; returns a callable."""
    exported = jax_export.deserialize(_read_blob(blob_or_path))

    def call(images):
        return exported.call(jnp.asarray(images, jnp.uint8))

    return call


def load_exported_weightless(blob_or_path, params: dict):
    """Deserialize a weightless artifact and bind a weight pytree (e.g.
    loaded from the converter's npz); returns a callable."""
    exported = jax_export.deserialize(_read_blob(blob_or_path))

    def call(images):
        return exported.call(params, jnp.asarray(images, jnp.uint8))

    return call
