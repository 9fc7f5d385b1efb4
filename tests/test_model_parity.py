"""Golden numerical parity vs HF OwlViTForObjectDetection (random weights).

No network/checkpoint in this environment, so parity is established against a
randomly-initialized HF torch model on a small config: the exact same
architecture math must produce the same outputs after weight conversion.
This pins down every numerics detail (LN placement/eps, quick_gelu, CLS
fusion, box bias, logit shift/scale, normalization epsilons).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from owlvit_tpu.models import configs as C  # noqa: E402
from owlvit_tpu.models import convert, owlvit, text as text_model, vit  # noqa: E402
from owlvit_tpu.ops import boxes as box_ops  # noqa: E402

TOL = dict(rtol=2e-4, atol=2e-5)


@pytest.fixture(scope="module")
def hf_and_ours():
    from transformers.models.owlvit.configuration_owlvit import (
        OwlViTConfig,
        OwlViTTextConfig,
        OwlViTVisionConfig,
    )
    from transformers.models.owlvit.modeling_owlvit import OwlViTForObjectDetection

    cfg = C.get_config("tiny")
    hf_cfg = OwlViTConfig(
        text_config=dict(
            vocab_size=cfg.text.vocab_size,
            hidden_size=cfg.text.hidden_size,
            intermediate_size=cfg.text.mlp_dim,
            num_hidden_layers=cfg.text.num_layers,
            num_attention_heads=cfg.text.num_heads,
            max_position_embeddings=cfg.text.max_len,
        ),
        vision_config=dict(
            hidden_size=cfg.vision.hidden_size,
            intermediate_size=cfg.vision.mlp_dim,
            num_hidden_layers=cfg.vision.num_layers,
            num_attention_heads=cfg.vision.num_heads,
            image_size=cfg.vision.image_size,
            patch_size=cfg.vision.patch_size,
        ),
        projection_dim=cfg.projection_dim,
    )
    torch.manual_seed(0)
    hf = OwlViTForObjectDetection(hf_cfg).eval()
    params = convert.convert_state_dict(
        {k: v for k, v in hf.state_dict().items()}, cfg
    )
    return hf, params, cfg


@pytest.fixture(scope="module")
def pixels(hf_and_ours):
    _, _, cfg = hf_and_ours
    rng = np.random.default_rng(1)
    s = cfg.vision.image_size
    return rng.normal(size=(2, s, s, 3)).astype(np.float32)


def test_vision_last_hidden(hf_and_ours, pixels):
    hf, params, cfg = hf_and_ours
    with torch.no_grad():
        ref = hf.owlvit.vision_model(
            pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2))
        ).last_hidden_state.numpy()
    ours = np.asarray(vit.forward(params["vision"], cfg.vision, jnp.asarray(pixels)))
    np.testing.assert_allclose(ours, ref, **TOL)


def test_image_embedder(hf_and_ours, pixels):
    hf, params, cfg = hf_and_ours
    with torch.no_grad():
        fm, _ = hf.image_embedder(torch.from_numpy(pixels.transpose(0, 3, 1, 2)))
        ref = fm.numpy().reshape(fm.shape[0], -1, fm.shape[-1])
    ours = np.asarray(owlvit.image_embedder(params, cfg, jnp.asarray(pixels)))
    np.testing.assert_allclose(ours, ref, **TOL)


def test_box_predictor(hf_and_ours, pixels):
    hf, params, cfg = hf_and_ours
    from transformers.image_transforms import center_to_corners_format

    with torch.no_grad():
        fm, _ = hf.image_embedder(torch.from_numpy(pixels.transpose(0, 3, 1, 2)))
        feats = torch.reshape(fm, (fm.shape[0], -1, fm.shape[-1]))
        ref_cxcywh = hf.box_predictor(feats, fm)
        ref = center_to_corners_format(ref_cxcywh).numpy()
    feats_j = owlvit.image_embedder(params, cfg, jnp.asarray(pixels))
    ours = np.asarray(owlvit.box_predictor(params, cfg, feats_j))
    np.testing.assert_allclose(ours, ref, **TOL)


def test_class_predictor_hf_head(hf_and_ours, pixels):
    hf, params, cfg = hf_and_ours
    rng = np.random.default_rng(2)
    q = rng.normal(size=(2, 5, cfg.projection_dim)).astype(np.float32)
    qmask = np.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], dtype=np.int64)

    with torch.no_grad():
        fm, _ = hf.image_embedder(torch.from_numpy(pixels.transpose(0, 3, 1, 2)))
        feats = torch.reshape(fm, (fm.shape[0], -1, fm.shape[-1]))
        ref_logits, _ = hf.class_predictor(
            feats, torch.from_numpy(q), torch.from_numpy(qmask)
        )
        ref = ref_logits.numpy()
    feats_j = owlvit.image_embedder(params, cfg, jnp.asarray(pixels))
    ours = np.asarray(
        owlvit.class_predictor(params, cfg, feats_j, jnp.asarray(q), jnp.asarray(qmask))
    )
    # Masked entries are a large negative sentinel on both sides; compare at
    # the unmasked positions exactly and check mask semantics separately.
    unmasked = np.broadcast_to(qmask[:, None, :] > 0, ours.shape)
    np.testing.assert_allclose(ours[unmasked], ref[unmasked], **TOL)
    assert (ours[~unmasked] < -1e30).all() and (ref[~unmasked] < -1e30).all()


def test_text_encoder(hf_and_ours):
    hf, params, cfg = hf_and_ours
    rng = np.random.default_rng(3)
    S = cfg.text.max_len
    # CLIP-style: token 0 pad is excluded; EOT (highest id) at a random pos.
    ids = rng.integers(1, cfg.text.vocab_size - 1, size=(4, S))
    mask = np.ones((4, S), dtype=np.int64)
    for i, L in enumerate([S, S - 3, 5, 2]):
        ids[i, L - 1] = cfg.text.vocab_size - 1  # EOT
        ids[i, L:] = 0
        mask[i, L:] = 0

    with torch.no_grad():
        out = hf.owlvit.text_model(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        )
        ref = hf.owlvit.text_projection(out.pooler_output).numpy()
    ours = np.asarray(
        text_model.forward(
            params["text"], cfg.text, jnp.asarray(ids, jnp.int32), jnp.asarray(mask)
        )
    )
    np.testing.assert_allclose(ours, ref, **TOL)


def test_querybank_head_reference_semantics(hf_and_ours, pixels):
    """The fine-tuning class head must reproduce the reference's exact math
    (models.py:24-38), including the query-normalization parenthesization
    quirk and the MaxPool1d(3,3) over prompt variants."""
    hf, params, cfg = hf_and_ours
    rng = np.random.default_rng(4)
    n_classes = 4
    qbank = rng.normal(size=(3 * n_classes, cfg.projection_dim)).astype(np.float32)

    with torch.no_grad():
        fm, _ = hf.image_embedder(torch.from_numpy(pixels.transpose(0, 3, 1, 2)))
        feats = torch.reshape(fm, (fm.shape[0], -1, fm.shape[-1]))
        img = hf.class_head.dense0(feats)
        img = img / (torch.linalg.norm(img, dim=-1, keepdim=True) + 1e-6)
        q = torch.from_numpy(qbank)[None]
        q = q / torch.linalg.norm(q, dim=-1, keepdim=True) + 1e-6  # quirk
        sims = img @ q.transpose(1, 2)
        ref = torch.nn.MaxPool1d(kernel_size=3, stride=3)(sims).numpy()

    feats_j = owlvit.image_embedder(params, cfg, jnp.asarray(pixels))
    ours = np.asarray(
        owlvit.class_predictor_querybank(params, cfg, feats_j, jnp.asarray(qbank))
    )
    np.testing.assert_allclose(ours, ref, **TOL)


def test_zero_shot_forward(hf_and_ours, pixels):
    hf, params, cfg = hf_and_ours
    from transformers.image_transforms import center_to_corners_format

    rng = np.random.default_rng(5)
    S = cfg.text.max_len
    Q = 3
    ids = rng.integers(1, cfg.text.vocab_size - 1, size=(Q, S))
    mask = np.ones((Q, S), dtype=np.int64)
    for i, L in enumerate([S, 7, 4]):
        ids[i, L - 1] = cfg.text.vocab_size - 1
        ids[i, L:] = 0
        mask[i, L:] = 0
    # HF expects input_ids [B*Q, S]; batch=2 shares the same query set
    ids2 = np.concatenate([ids, ids], axis=0)
    mask2 = np.concatenate([mask, mask], axis=0)

    with torch.no_grad():
        out = hf(
            input_ids=torch.from_numpy(ids2),
            attention_mask=torch.from_numpy(mask2),
            pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2)),
        )
        ref_logits = out.logits.numpy()
        ref_boxes = center_to_corners_format(out.pred_boxes).numpy()

    boxes_j, logits_j = owlvit.forward_zero_shot(
        params, cfg, jnp.asarray(pixels), jnp.asarray(ids, jnp.int32), jnp.asarray(mask)
    )
    np.testing.assert_allclose(np.asarray(boxes_j), ref_boxes, **TOL)
    np.testing.assert_allclose(np.asarray(logits_j), ref_logits, rtol=2e-4, atol=2e-4)


def test_one_shot_embed_image_query(hf_and_ours, pixels):
    hf, params, cfg = hf_and_ours
    with torch.no_grad():
        fm, _ = hf.image_embedder(torch.from_numpy(pixels.transpose(0, 3, 1, 2)))
        feats = torch.reshape(fm, (fm.shape[0], -1, fm.shape[-1]))
        ref_q, ref_idx, _ = hf.embed_image_query(feats, fm)
        ref_q = ref_q.numpy().reshape(pixels.shape[0], -1)
        ref_idx = ref_idx.numpy().reshape(-1)

    q, idx, _ = owlvit.embed_image_query(params, cfg, jnp.asarray(pixels))
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_allclose(np.asarray(q), ref_q, **TOL)


def test_npz_roundtrip(hf_and_ours, tmp_path, pixels):
    _, params, cfg = hf_and_ours
    p = str(tmp_path / "params.npz")
    convert.save_params(p, params)
    loaded = convert.load_params(p)
    a = np.asarray(owlvit.image_embedder(params, cfg, jnp.asarray(pixels[:1])))
    b = np.asarray(owlvit.image_embedder(loaded, cfg, jnp.asarray(pixels[:1])))
    np.testing.assert_array_equal(a, b)


def test_bf16_forward_close_to_fp32(hf_and_ours, pixels):
    """bf16 compute policy must track fp32 within bf16 tolerance."""
    _, params, cfg = hf_and_ours
    import jax.numpy as jnp

    params = dict(params)
    params["queries"] = np.random.default_rng(9).normal(
        size=(6, cfg.projection_dim)
    ).astype(np.float32)
    b32, s32 = owlvit.forward_train(params, cfg, jnp.asarray(pixels))
    cfg16 = cfg.replace(dtype="bfloat16")
    b16, s16 = owlvit.forward_train(params, cfg16, jnp.asarray(pixels))
    assert b16.dtype == jnp.float32  # boxes decoded in fp32
    np.testing.assert_allclose(np.asarray(b16), np.asarray(b32), atol=0.05)
    np.testing.assert_allclose(np.asarray(s16), np.asarray(s32), atol=0.05)
