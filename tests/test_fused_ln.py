"""Interpret-mode parity for the fused add+LayerNorm kernel (ops/fused_ln)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from owlvit_tpu.ops import fused_ln
from owlvit_tpu.ops.fused_ln import add_ln, add_ln_reference


@pytest.fixture(autouse=True)
def _interpret():
    old = fused_ln.INTERPRET
    fused_ln.INTERPRET = True
    yield
    fused_ln.INTERPRET = old


def _rand(shape, seed, dtype=np.float32):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32)
    ).astype(dtype)


@pytest.mark.parametrize("shape", [(2, 256, 256), (1, 300, 128)])  # 300: pad path
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_matches_reference(shape, dtype):
    D = shape[-1]
    x = _rand(shape, 0, dtype)
    h = _rand(shape, 1, dtype)
    p = {"scale": _rand((D,), 2) + 1.0, "bias": _rand((D,), 3)}
    r, y = add_ln(x, h, p)
    r_ref, y_ref = add_ln_reference(x, h, p)
    # bf16: interpret-mode rounding differs from XLA's by a couple ulps
    tol = dict(atol=1e-6, rtol=1e-6) if dtype == jnp.float32 else dict(
        atol=2e-2, rtol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(r, np.float32), np.asarray(r_ref, np.float32), **tol
    )
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref, np.float32), **tol
    )


def test_gradients_match_reference():
    shape, D = (2, 256, 128), 128
    x = _rand(shape, 0)
    h = _rand(shape, 1)
    p = {"scale": _rand((D,), 2) + 1.0, "bias": _rand((D,), 3)}
    # cotangents hit BOTH outputs (r feeds the residual stream, y the branch)
    wr = _rand(shape, 4)
    wy = _rand(shape, 5)

    def loss(fn):
        def f(x, h, p):
            r, y = fn(x, h, p)
            return jnp.sum(r * wr) + jnp.sum(y * wy)

        return f

    g = jax.grad(loss(add_ln), argnums=(0, 1, 2))(x, h, p)
    g_ref = jax.grad(loss(add_ln_reference), argnums=(0, 1, 2))(x, h, p)
    np.testing.assert_allclose(np.asarray(g[0]), np.asarray(g_ref[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g[1]), np.asarray(g_ref[1]), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g[2]["scale"]), np.asarray(g_ref[2]["scale"]), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(g[2]["bias"]), np.asarray(g_ref[2]["bias"]), atol=1e-4
    )


def test_encoder_fused_equals_unfused():
    """encoder(impl=flash) value+grad must be identical with the fused-LN
    scan carry vs the plain path (OWLVIT_FUSED_LN=0)."""
    from owlvit_tpu.models import layers
    from owlvit_tpu.ops import flash_attention

    old_fa = flash_attention.INTERPRET
    flash_attention.INTERPRET = True
    try:
        key = jax.random.PRNGKey(0)
        stacked = layers.init_encoder(key, num_layers=2, dim=128, hidden=256)
        x = _rand((1, 128, 128), 7)

        def run(x, stacked):
            return layers.encoder(
                stacked, x, num_heads=2, eps=1e-5, impl="flash"
            )

        def loss(x, stacked):
            return jnp.sum(run(x, stacked) ** 2)

        os.environ["OWLVIT_FUSED_LN"] = "1"
        y_fused = run(x, stacked)
        g_fused = jax.grad(loss, argnums=(0, 1))(x, stacked)
        os.environ["OWLVIT_FUSED_LN"] = "0"
        y_plain = run(x, stacked)
        g_plain = jax.grad(loss, argnums=(0, 1))(x, stacked)
    finally:
        flash_attention.INTERPRET = old_fa
        os.environ.pop("OWLVIT_FUSED_LN", None)

    np.testing.assert_allclose(
        np.asarray(y_fused), np.asarray(y_plain), rtol=1e-6, atol=1e-6
    )
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_fused),
        jax.tree_util.tree_leaves_with_path(g_plain),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=3e-5,
            err_msg=jax.tree_util.keystr(ka),
        )
