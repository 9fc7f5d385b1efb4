"""Opt-in int8 frozen-backbone path (ops/quant.py)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from owlvit_tpu.models import get_config, owlvit
from owlvit_tpu.models.layers import linear
from owlvit_tpu.ops.quant import linear_q


def test_linear_q_close_to_fp():
    rng = np.random.default_rng(0)
    p = {
        "kernel": jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32)),
        "bias": jnp.asarray(rng.normal(size=(128,)).astype(np.float32)),
    }
    x = jnp.asarray(rng.normal(size=(4, 32, 64)).astype(np.float32))
    y = linear(p, x)
    yq = linear_q(p, x)
    # int8 per-tensor activations + per-channel weights on gaussian data:
    # relative error well under 2%
    rel = float(jnp.linalg.norm(yq - y) / jnp.linalg.norm(y))
    assert rel < 0.02, rel


def test_quant_backbone_model_forward_close():
    """OWLVIT_QUANT_BACKBONE=1 quantizes ONLY the frozen prefix; outputs
    stay close to the fp path and the trainable tail still gets exact,
    finite gradients."""
    os.environ["OWLVIT_QUANT_BACKBONE"] = "1"
    try:
        cfg = get_config("tiny", attention_impl="flash", trainable_last_k=1)
        params = owlvit.init(jax.random.PRNGKey(0), cfg, num_queries=6)
        img = jnp.asarray(
            np.random.default_rng(1).normal(size=(1, 96, 96, 3)), jnp.float32
        )
        bq, sq = owlvit.forward_train(params, cfg, img)
    finally:
        os.environ.pop("OWLVIT_QUANT_BACKBONE", None)
    b, s = owlvit.forward_train(params, cfg, img)
    assert np.isfinite(np.asarray(bq)).all()
    # boxes are sigmoids (0..1): absolute tolerance; sims are cosine-ish
    np.testing.assert_allclose(np.asarray(bq), np.asarray(b), atol=0.1)
    np.testing.assert_allclose(np.asarray(sq), np.asarray(s), atol=0.1)

    os.environ["OWLVIT_QUANT_BACKBONE"] = "1"
    try:
        def loss(p):
            bb, ss = owlvit.forward_train(p, cfg, img)
            return jnp.sum(bb * bb) + jnp.sum(ss * ss)

        g = jax.grad(loss)(params)
        assert all(
            bool(jnp.isfinite(x).all()) for x in jax.tree_util.tree_leaves(g)
        )
    finally:
        os.environ.pop("OWLVIT_QUANT_BACKBONE", None)
