"""Pallas flash attention vs the XLA einsum reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from owlvit_tpu.ops.flash_attention import flash_attention


def ref_attention(q, k, v, scale):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", w.astype(q.dtype), v)


@pytest.mark.parametrize("S", [64, 128, 130, 577])
def test_forward_matches_reference(rng, S):
    B, H, hd = 2, 3, 64
    q, k, v = (
        rng.normal(size=(B, S, H, hd)).astype(np.float32) for _ in range(3)
    )
    scale = hd**-0.5
    out = flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale=scale
    )
    ref = ref_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_gradients_match_reference(rng):
    B, S, H, hd = 1, 130, 2, 64
    q, k, v = (
        rng.normal(size=(B, S, H, hd)).astype(np.float32) for _ in range(3)
    )
    scale = hd**-0.5
    co = rng.normal(size=(B, S, H, hd)).astype(np.float32)

    def f_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale=scale) * co)

    def f_ref(q, k, v):
        return jnp.sum(ref_attention(q, k, v, scale) * co)

    g_flash = jax.grad(f_flash, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    )
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    )
    for a, b, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5, err_msg=name
        )


def test_bf16_forward_close(rng):
    B, S, H, hd = 1, 128, 2, 64
    q, k, v = (
        rng.normal(size=(B, S, H, hd)).astype(np.float32) for _ in range(3)
    )
    scale = hd**-0.5
    out = flash_attention(
        jnp.asarray(q, jnp.bfloat16),
        jnp.asarray(k, jnp.bfloat16),
        jnp.asarray(v, jnp.bfloat16),
        scale=scale,
    )
    ref = ref_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=2e-2, atol=2e-2
    )


def test_model_integration_flash_vs_xla(rng):
    """tiny model forward with attention_impl='flash' == 'xla' numerics."""
    from owlvit_tpu.models import get_config, owlvit

    cfg_x = get_config("tiny", attention_impl="xla")
    cfg_f = get_config("tiny", attention_impl="flash")
    params = owlvit.init(jax.random.PRNGKey(0), cfg_x, num_queries=6)
    img = rng.normal(size=(1, 96, 96, 3)).astype(np.float32)
    bx, sx = owlvit.forward_train(params, cfg_x, jnp.asarray(img))
    bf, sf = owlvit.forward_train(params, cfg_f, jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(bf), np.asarray(bx), rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(sf), np.asarray(sx), rtol=3e-4, atol=3e-5)


def test_packed_matches_reference_fwd_bwd(rng, monkeypatch):
    monkeypatch.setenv("OWLVIT_PACKED_FLASH", "1")
    from owlvit_tpu.ops.flash_attention import flash_attention_packed

    B, S, H, hd = 2, 130, 4, 64
    D = H * hd
    q2, k2, v2 = (rng.normal(size=(B, S, D)).astype(np.float32) for _ in range(3))
    scale = hd**-0.5
    co = rng.normal(size=(B, S, D)).astype(np.float32)

    def split(x):
        return x.reshape(B, S, H, hd)

    def f_packed(q, k, v):
        return jnp.sum(
            flash_attention_packed(q, k, v, scale=scale, num_heads=H) * co
        )

    def f_ref(q, k, v):
        o = ref_attention(split(q), split(k), split(v), scale)
        return jnp.sum(o.reshape(B, S, D) * co)

    o_p = flash_attention_packed(
        jnp.asarray(q2), jnp.asarray(k2), jnp.asarray(v2), scale=scale, num_heads=H
    )
    o_r = ref_attention(
        jnp.asarray(split(q2)), jnp.asarray(split(k2)), jnp.asarray(split(v2)), scale
    ).reshape(B, S, D)
    np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_r), rtol=2e-4, atol=2e-5)

    g_p = jax.grad(f_packed, argnums=(0, 1, 2))(
        jnp.asarray(q2), jnp.asarray(k2), jnp.asarray(v2)
    )
    g_r = jax.grad(f_ref, argnums=(0, 1, 2))(
        jnp.asarray(q2), jnp.asarray(k2), jnp.asarray(v2)
    )
    for a, b, n in zip(g_p, g_r, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5, err_msg=n
        )


def test_fused_bwd_matches_reference(rng, monkeypatch):
    """OWLVIT_PACKED_BWD=fused: the single dq+dk+dv kernel (r3) against the
    XLA reference, fp32, at a shape that pads (query+key masks exercised)."""
    monkeypatch.setenv("OWLVIT_PACKED_FLASH", "1")
    monkeypatch.setenv("OWLVIT_PACKED_BWD", "fused")
    from owlvit_tpu.ops.flash_attention import flash_attention_packed

    B, S, H, hd = 2, 130, 4, 64
    D = H * hd
    q2, k2, v2 = (rng.normal(size=(B, S, D)).astype(np.float32) for _ in range(3))
    scale = hd**-0.5
    co = rng.normal(size=(B, S, D)).astype(np.float32)

    def split(x):
        return x.reshape(B, S, H, hd)

    def f_packed(q, k, v):
        return jnp.sum(
            flash_attention_packed(q, k, v, scale=scale, num_heads=H) * co
        )

    def f_ref(q, k, v):
        o = ref_attention(split(q), split(k), split(v), scale)
        return jnp.sum(o.reshape(B, S, D) * co)

    g_p = jax.grad(f_packed, argnums=(0, 1, 2))(
        jnp.asarray(q2), jnp.asarray(k2), jnp.asarray(v2)
    )
    g_r = jax.grad(f_ref, argnums=(0, 1, 2))(
        jnp.asarray(q2), jnp.asarray(k2), jnp.asarray(v2)
    )
    for a, b, n in zip(g_p, g_r, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5, err_msg=n
        )


def test_hybrid_matches_reference_fwd_bwd(rng):
    from owlvit_tpu.ops.flash_attention import flash_attention_hybrid

    B, S, H, hd = 2, 130, 4, 64
    D = H * hd
    q2, k2, v2 = (rng.normal(size=(B, S, D)).astype(np.float32) for _ in range(3))
    scale = hd**-0.5
    co = rng.normal(size=(B, S, D)).astype(np.float32)

    def split(x):
        return x.reshape(B, S, H, hd)

    o_h = flash_attention_hybrid(
        jnp.asarray(q2), jnp.asarray(k2), jnp.asarray(v2), scale=scale, num_heads=H
    )
    o_r = ref_attention(
        jnp.asarray(split(q2)), jnp.asarray(split(k2)), jnp.asarray(split(v2)), scale
    ).reshape(B, S, D)
    np.testing.assert_allclose(np.asarray(o_h), np.asarray(o_r), rtol=2e-4, atol=2e-5)

    def f_h(q, k, v):
        return jnp.sum(flash_attention_hybrid(q, k, v, scale=scale, num_heads=H) * co)

    def f_r(q, k, v):
        return jnp.sum(ref_attention(split(q), split(k), split(v), scale).reshape(B, S, D) * co)

    g_h = jax.grad(f_h, argnums=(0, 1, 2))(jnp.asarray(q2), jnp.asarray(k2), jnp.asarray(v2))
    g_r = jax.grad(f_r, argnums=(0, 1, 2))(jnp.asarray(q2), jnp.asarray(k2), jnp.asarray(v2))
    for a, b, n in zip(g_h, g_r, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5, err_msg=n
        )


def test_model_grads_flash_packed_vs_xla(rng, monkeypatch):
    """Model-LEVEL grad parity with the packed kernels + fused-LN scan.

    Kernel-level differential tests slice off padded rows before comparing,
    so they CANNOT see pad-row grad leakage into shared projection weights
    (the pad happens once outside the layer scan — caught live in r2: the
    transposed dkv kernel initially left padded key rows unmasked and
    corrupted every weight grad)."""
    monkeypatch.setenv("OWLVIT_PACKED_FLASH", "1")
    import jax
    import jax.numpy as jnp

    from owlvit_tpu.models import get_config, owlvit

    cfg_flash = get_config("tiny", attention_impl="flash")
    cfg_xla = get_config("tiny", attention_impl="xla")
    params = owlvit.init(jax.random.PRNGKey(0), cfg_flash, num_queries=6)
    img = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 96, 96, 3)), jnp.float32
    )

    def loss(p, cfg):
        b, s = owlvit.forward_train(p, cfg, img)
        return jnp.sum(b * b) + jnp.sum(s * s)

    gf = jax.grad(loss)(params, cfg_flash)
    gx = jax.grad(loss)(params, cfg_xla)
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(gf),
        jax.tree_util.tree_leaves_with_path(gx),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4,
            err_msg=jax.tree_util.keystr(kp),
        )
    # k bias must cancel in softmax: its grad is exactly ~0
    assert float(jnp.max(jnp.abs(gf["vision"]["layers"]["attn"]["k"]["bias"]))) < 1e-4


def test_fast_softmax_refuses_differentiation(rng):
    """fast_softmax=True is only valid under stop_gradient (frozen layers):
    its forward has no consistent backward, so grad must raise."""
    from owlvit_tpu.ops.flash_attention import flash_attention_packed

    B, S, H, hd = 1, 128, 2, 64
    D = H * hd
    q, k, v = (jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32))
               for _ in range(3))

    def f(q, k, v):
        o = flash_attention_packed(
            q, k, v, scale=hd**-0.5, num_heads=H, fast_softmax=True
        )
        return jnp.sum(o)

    assert np.isfinite(float(f(q, k, v)))  # plain forward is fine
    with pytest.raises(NotImplementedError, match="stop_gradient"):
        jax.grad(f)(q, k, v)

    # and the intended use keeps working: frozen prefix + grad of the tail
    import os

    from owlvit_tpu.models import get_config, owlvit

    os.environ["OWLVIT_FAST_SOFTMAX"] = "1"
    try:
        cfg = get_config("tiny", attention_impl="flash", trainable_last_k=1)
        params = owlvit.init(jax.random.PRNGKey(0), cfg, num_queries=6)
        img = jnp.asarray(
            np.random.default_rng(0).normal(size=(1, 96, 96, 3)), jnp.float32
        )

        def loss(p):
            b, s = owlvit.forward_train(p, cfg, img)
            return jnp.sum(b * b) + jnp.sum(s * s)

        g = jax.grad(loss)(params)
        assert all(
            bool(jnp.isfinite(x).all())
            for x in jax.tree_util.tree_leaves(g)
        )
    finally:
        os.environ.pop("OWLVIT_FAST_SOFTMAX", None)


def test_fused_bq_halving_gate(rng, monkeypatch):
    """r3 gate: at bf16 with S_pad beyond the fused VMEM ceiling the packed
    backward HALVES the query block and stays fused (validated on chip at
    L/14, BENCH.md r3); fp32 at the same length falls back to the split
    pair. Ceiling monkeypatched down so tiny shapes exercise both branches;
    a spy on the fused kernel observes which path traced."""
    import owlvit_tpu.ops.flash_attention as fa

    monkeypatch.setenv("OWLVIT_PACKED_FLASH", "1")
    monkeypatch.setenv("OWLVIT_PACKED_BWD", "fused")
    monkeypatch.setattr(fa, "_FUSED_MAX_S", 128)
    B, S, H, hd = 1, 256, 2, 64  # S_pad 256 > 128 (gate), <= 2*128 (halve)
    D = H * hd
    scale = hd**-0.5
    q2, k2, v2 = (rng.normal(size=(B, S, D)).astype(np.float32) for _ in range(3))
    co = rng.normal(size=(B, S, D)).astype(np.float32)

    def loss(q, k, v):
        o = fa.flash_attention_packed(q, k, v, scale=scale, num_heads=H)
        return jnp.sum(o.astype(jnp.float32) * jnp.asarray(co))

    def ref_loss(q, k, v):
        o = ref_attention(
            q.reshape(B, S, H, hd), k.reshape(B, S, H, hd),
            v.reshape(B, S, H, hd), scale,
        )
        return jnp.sum(o.reshape(B, S, D).astype(jnp.float32) * jnp.asarray(co))

    called = {}
    real_kernel = fa._pk_fused_bwd_kernel

    def spy(*a, **kw):
        called["fused"] = True
        return real_kernel(*a, **kw)

    monkeypatch.setattr(fa, "_pk_fused_bwd_kernel", spy)

    bf = [jnp.asarray(x, jnp.bfloat16) for x in (q2, k2, v2)]
    g_b = jax.grad(loss, argnums=(0, 1, 2))(*bf)
    assert called.get("fused"), "bf16 long-S must stay on the fused kernel"
    g_r = jax.grad(ref_loss, argnums=(0, 1, 2))(*bf)
    for a, b, n in zip(g_b, g_r, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=5e-2, atol=5e-2, err_msg=n,
        )

    called.clear()
    f32 = [jnp.asarray(x) for x in (q2, k2, v2)]
    jax.grad(loss, argnums=(0, 1, 2))(*f32)
    assert "fused" not in called, "fp32 long-S must fall back to the split pair"


def test_static_max_softmax_matches_standard(rng, monkeypatch):
    """OWLVIT_STATIC_MAX: exp(s - C) with a compile-time constant instead of
    the per-row max (the packed fwd's VPU-pass-reduction A/B). Softmax is
    shift-invariant, so the output AND the stashed lse must match the
    standard kernel to fp tolerance for any sane C."""
    monkeypatch.setenv("OWLVIT_PACKED_FLASH", "1")
    import owlvit_tpu.ops.flash_attention as fa

    B, S, H, hd = 2, 130, 4, 64
    D = H * hd
    q2, k2, v2 = (
        jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32) for _ in range(3)
    )
    scale = hd**-0.5
    base_o, base_lse = fa._pk_fwd(q2, k2, v2, scale, S, H, hd)
    for c in ("0", "5.0"):
        monkeypatch.setenv("OWLVIT_STATIC_MAX", c)
        o, lse = fa._pk_fwd(q2, k2, v2, scale, S, H, hd,
                            static_softmax=True)
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(base_o), rtol=2e-5, atol=2e-6
        )
        np.testing.assert_allclose(
            np.asarray(lse), np.asarray(base_lse), rtol=2e-5, atol=2e-6
        )
    monkeypatch.delenv("OWLVIT_STATIC_MAX")
    # and the full custom-vjp path still differentiates (lse-based recompute
    # is shift-independent, so grads stay consistent)
    monkeypatch.setenv("OWLVIT_STATIC_MAX", "3.0")
    co = jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32)

    def f(q, k, v):
        return jnp.sum(
            fa.flash_attention_packed(q, k, v, scale=scale, num_heads=H,
                                      static_softmax=True) * co
        )

    g = jax.grad(f, argnums=(0, 1, 2))(q2, k2, v2)
    monkeypatch.delenv("OWLVIT_STATIC_MAX")
    g_ref = jax.grad(f, argnums=(0, 1, 2))(q2, k2, v2)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-6
        )


def test_static_max_default_resolution(monkeypatch):
    """Since r4 the fixed-shift softmax is the DEFAULT for non-fp32 kernels
    (+10.9% serving / +8.4% uncached train on chip, grads at bf16 eps vs the
    dynamic path — BENCH.md r4). fp32 keeps the per-row max (strict-parity
    path); OWLVIT_STATIC_MAX=off restores it everywhere, =<float> forces C."""
    import owlvit_tpu.ops.flash_attention as fa

    monkeypatch.delenv("OWLVIT_STATIC_MAX", raising=False)
    assert fa._static_max_env(jnp.bfloat16) == fa._STATIC_MAX_DEFAULT
    assert fa._static_max_env(jnp.float32) is None
    assert fa._static_max_env() is None  # no dtype context -> conservative
    monkeypatch.setenv("OWLVIT_STATIC_MAX", "off")
    assert fa._static_max_env(jnp.bfloat16) is None
    monkeypatch.setenv("OWLVIT_STATIC_MAX", "dynamic")
    assert fa._static_max_env(jnp.bfloat16) is None
    monkeypatch.setenv("OWLVIT_STATIC_MAX", "7.5")
    assert fa._static_max_env(jnp.float32) == 7.5
    assert fa._static_max_env(jnp.bfloat16) == 7.5
    monkeypatch.setenv("OWLVIT_STATIC_MAX", "0")
    assert fa._static_max_env(jnp.bfloat16) == 0.0

    # the bf16 default must track the dynamic-max form at bf16 tolerance
    monkeypatch.delenv("OWLVIT_STATIC_MAX", raising=False)
    rng = np.random.default_rng(3)
    B, S, H, hd = 1, 130, 2, 64
    D = H * hd
    q2, k2, v2 = (
        jnp.asarray(rng.normal(size=(B, S, D)), jnp.bfloat16) for _ in range(3)
    )
    scale = hd**-0.5
    o_def, lse_def = fa._pk_fwd(q2, k2, v2, scale, S, H, hd,
                                static_softmax=True)
    monkeypatch.setenv("OWLVIT_STATIC_MAX", "off")
    o_dyn, lse_dyn = fa._pk_fwd(q2, k2, v2, scale, S, H, hd,
                                static_softmax=True)
    np.testing.assert_allclose(
        np.asarray(o_def, np.float32), np.asarray(o_dyn, np.float32),
        rtol=2e-2, atol=2e-2,
    )
    np.testing.assert_allclose(
        np.asarray(lse_def), np.asarray(lse_dyn), rtol=1e-5, atol=1e-5
    )


def test_static_softmax_routing(rng, monkeypatch):
    """The fixed-shift softmax must reach ONLY pure-inference-process
    configs: trainers run FULLY dynamic (static-max kernels fault any
    grad-bearing process, even from a separate fwd-only executable —
    BENCH.md r4c/r4d), while serving's config (trainable_last_k=0,
    static_softmax=True, as serve.py sets) is static throughout."""
    import owlvit_tpu.ops.flash_attention as fa
    from owlvit_tpu.models import get_config, owlvit

    calls = []
    real = fa._pk_fwd

    def spy(q2, k2, v2, scale, s_real, H, hd, fast_softmax=False,
            static_softmax=False):
        calls.append(bool(static_softmax))
        return real(q2, k2, v2, scale, s_real, H, hd, fast_softmax,
                    static_softmax)

    monkeypatch.setattr(fa, "_pk_fwd", spy)
    # trainer config: static_softmax defaults False -> every layer dynamic,
    # frozen prefix included
    cfg = get_config("tiny", attention_impl="flash", trainable_last_k=1)
    params = owlvit.init(jax.random.PRNGKey(0), cfg, num_queries=6)
    img = jnp.asarray(rng.normal(size=(1, 96, 96, 3)), jnp.float32)
    owlvit.forward_train(params, cfg, img)
    n_layers = cfg.vision.num_layers
    assert calls == [False] * n_layers, calls

    calls.clear()
    # serving config (what DetectorServer/cli-infer construct): all frozen
    # AND static
    cfg0 = cfg.replace(trainable_last_k=0, static_softmax=True)
    owlvit.forward_train(params, cfg0, img)
    assert calls == [True] * n_layers, calls

    calls.clear()
    # the prefix honors static_softmax=True only via the config; a cache
    # build in a trainer process stays dynamic
    owlvit.embed_prefix(params, cfg, img)
    assert calls == [False] * (n_layers - 1), calls

    # all-frozen static output must equal the k=None (fully differentiable,
    # dynamic) branch
    calls.clear()
    b0, s0 = owlvit.forward_train(params, cfg0, img)
    bn, sn = owlvit.forward_train(params, cfg.replace(trainable_last_k=None),
                                  img)
    assert calls == [True] * n_layers + [False] * n_layers, calls
    np.testing.assert_allclose(np.asarray(s0), np.asarray(sn),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(b0), np.asarray(bn),
                               rtol=2e-5, atol=2e-6)
