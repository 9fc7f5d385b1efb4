"""Box geometry vs hand values and torchvision (CPU torch is test-only)."""

import jax.numpy as jnp
import numpy as np
import pytest

from owlvit_tpu.ops import boxes as B
from owlvit_tpu.ops.box_bias import compute_box_bias


def rand_xyxy(rng, n):
    pts = rng.uniform(0, 1, size=(n, 2, 2))
    lo = pts.min(axis=1)
    hi = pts.max(axis=1) + 0.01
    return np.concatenate([lo, hi], axis=-1).astype(np.float32)


def test_convert_roundtrip(rng):
    b = rand_xyxy(rng, 32)
    for fmt in ["xywh", "cxcywh"]:
        out = B.convert(B.convert(jnp.asarray(b), "xyxy", fmt), fmt, "xyxy")
        np.testing.assert_allclose(np.asarray(out), b, rtol=1e-5, atol=1e-6)


def test_convert_hand_values():
    b = jnp.array([[1.0, 2.0, 5.0, 8.0]])
    np.testing.assert_allclose(
        np.asarray(B.convert(b, "xyxy", "xywh")), [[1, 2, 4, 6]]
    )
    np.testing.assert_allclose(
        np.asarray(B.convert(b, "xyxy", "cxcywh")), [[3, 5, 4, 6]]
    )
    np.testing.assert_allclose(
        np.asarray(B.convert(jnp.array([[3.0, 5.0, 4.0, 6.0]]), "cxcywh", "xyxy")),
        [[1, 2, 5, 8]],
    )


def test_iou_hand_values():
    a = jnp.array([[0.0, 0.0, 2.0, 2.0]])
    b = jnp.array([[1.0, 1.0, 3.0, 3.0], [0.0, 0.0, 2.0, 2.0], [5.0, 5.0, 6.0, 6.0]])
    iou, union = B.pairwise_iou(a, b)
    np.testing.assert_allclose(np.asarray(iou), [[1 / 7, 1.0, 0.0]], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(union), [[7.0, 4.0, 5.0]], rtol=1e-6)


def test_giou_hand_values():
    # Disjoint unit boxes sharing a corner hull of 2x2: giou = 0 - (4-2)/4 = -0.5
    a = jnp.array([[0.0, 0.0, 1.0, 1.0]])
    b = jnp.array([[1.0, 1.0, 2.0, 2.0]])
    g = B.pairwise_giou(a, b)
    np.testing.assert_allclose(np.asarray(g), [[-0.5]], rtol=1e-6)
    # Identical boxes: giou = 1
    g2 = B.pairwise_giou(a, a)
    np.testing.assert_allclose(np.asarray(g2), [[1.0]], rtol=1e-6)


def test_vs_torchvision(rng):
    torchvision = pytest.importorskip("torchvision")
    if getattr(torchvision, "__version__", "").endswith("+shim"):
        # reference_bridge installs an import-only torchvision stand-in
        # (box_area only) so the literal reference code imports; it has no
        # box_iou/giou oracle — same situation as "torchvision absent"
        pytest.skip("only the reference-bridge torchvision shim is present")
    import torch
    from torchvision.ops import box_iou as tv_iou
    from torchvision.ops import generalized_box_iou as tv_giou

    a = rand_xyxy(rng, 17)
    b = rand_xyxy(rng, 23)
    iou, _ = B.pairwise_iou(jnp.asarray(a), jnp.asarray(b))
    ref = tv_iou(torch.from_numpy(a), torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(np.asarray(iou), ref, rtol=1e-4, atol=1e-5)

    g = B.pairwise_giou(jnp.asarray(a), jnp.asarray(b))
    refg = tv_giou(torch.from_numpy(a), torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(np.asarray(g), refg, rtol=1e-4, atol=1e-5)


def test_elementwise_matches_pairwise_diag(rng):
    a = rand_xyxy(rng, 11)
    b = rand_xyxy(rng, 11)
    g_pair = np.asarray(B.pairwise_giou(jnp.asarray(a), jnp.asarray(b)))
    g_elem = np.asarray(B.elementwise_giou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(g_elem, np.diag(g_pair), rtol=1e-5, atol=1e-6)
    i_pair, _ = B.pairwise_iou(jnp.asarray(a), jnp.asarray(b))
    i_elem = np.asarray(B.elementwise_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(i_elem, np.diag(np.asarray(i_pair)), rtol=1e-5, atol=1e-6)


def test_scale(rng):
    b = rand_xyxy(rng, 5) * 100
    down = np.asarray(B.scale(jnp.asarray(b), 200, 100, "down"))
    np.testing.assert_allclose(down[:, 0], b[:, 0] / 200, rtol=1e-6)
    np.testing.assert_allclose(down[:, 1], b[:, 1] / 100, rtol=1e-6)
    up = np.asarray(B.scale(jnp.asarray(down), 200, 100, "up"))
    np.testing.assert_allclose(up, b, rtol=1e-5)


def test_box_bias_vs_hf():
    transformers = pytest.importorskip("transformers")
    import torch
    from transformers.models.owlvit.modeling_owlvit import OwlViTForObjectDetection

    # Call the static math directly without instantiating the full model.
    coords = OwlViTForObjectDetection.normalize_grid_corner_coordinates(24, 24)
    coords = torch.clip(coords, 0.0, 1.0)
    coord_bias = torch.log(coords + 1e-4) - torch.log1p(-coords + 1e-4)
    size = torch.full_like(coord_bias, 1.0) / 24.0
    size_bias = torch.log(size + 1e-4) - torch.log1p(-size + 1e-4)
    ref = torch.cat([coord_bias, size_bias], dim=-1).numpy()

    ours = compute_box_bias(24, 24)
    assert ours.shape == (576, 4)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
