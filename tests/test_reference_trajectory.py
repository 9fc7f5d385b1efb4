"""Multi-step loss-trajectory differential vs the reference's literal code.

A minimal port of the reference's train loop (main.py:64-96: forward →
PushPullLoss → AdamW step) is run with the reference's OWN model class
(src/models.py::OwlViT wrapping a random-init HF OwlViTForObjectDetection)
and loss (src/losses.py::PushPullLoss), against owlvit_tpu's forward_train +
push_pull_loss + optax.adamw on the SAME converted weights, same query bank,
same batch=1 data. The per-step loss values must track.

This exercises the full gradient path end-to-end: any divergence in the
model numerics, loss semantics, or optimizer math shows up as trajectory
drift within a few steps.

API-drift shim (documented): the reference calls
``compute_box_bias(feature_map)`` — the transformers 4.30.2 signature
(SURVEY §2.2). Installed transformers 4.57.6 changed it to
``compute_box_bias(nph, npw)`` and precomputes ``self.box_bias`` at init
with identical math (modeling_owlvit.py:1195,1215-1235). We point the
reference module's ``compute_box_bias`` attribute at that precomputed
buffer; the reference's own code is otherwise unchanged.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from owlvit_tpu.models import configs as C  # noqa: E402
from owlvit_tpu.models import convert, owlvit  # noqa: E402
from owlvit_tpu.ops import losses as our_losses  # noqa: E402

from reference_bridge import load_reference  # noqa: E402

_, REF_LOSSES, REF_MODELS = load_reference()

N_CLASSES = 3
PROMPTS = 3  # reference uses 3 prompt variants per class (models.py:156-159)
LR, WD = 1e-4, 0.1
STEPS = 4


@pytest.fixture(scope="module")
def setup():
    from transformers.models.owlvit.configuration_owlvit import OwlViTConfig
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
    hf = OwlViTForObjectDetection(hf_cfg)

    rng = np.random.default_rng(42)
    # modest query norms keep |sims| safely below 1.0 (the reference's
    # query-norm quirk can push |sims| to 1+2e-5, where torch's BCELoss
    # *raises*; real checkpoints never sit at the bound and neither should
    # the test data)
    qb = rng.normal(size=(N_CLASSES * PROMPTS, cfg.projection_dim)).astype(
        np.float32
    )

    ref = REF_MODELS.OwlViT(hf, torch.from_numpy(qb)[None])
    # 4.30.2→4.57.6 API-drift shim, see module docstring
    ref.compute_box_bias = lambda feature_map: hf.box_bias

    # convert_state_dict returns zero-copy numpy VIEWS of the torch storage;
    # the reference trajectory's AdamW mutates those tensors in place, so
    # materialize device copies before any torch training runs
    params = jax.tree.map(
        jnp.array, convert.convert_state_dict(dict(hf.state_dict()), cfg)
    )
    params["queries"] = jnp.asarray(qb)

    s = cfg.vision.image_size
    pixels = rng.normal(size=(1, s, s, 3)).astype(np.float32) * 0.5
    gt_boxes = np.array(
        [[[0.1, 0.1, 0.45, 0.5], [0.5, 0.55, 0.9, 0.95]]], np.float32
    )
    gt_labels = np.array([[0, 2]], np.int32)
    scales = np.array([1.0, 2.0, 0.7], np.float32)
    return cfg, ref, params, pixels, gt_boxes, gt_labels, scales


def _ref_trajectory(ref, pixels, gt_boxes, gt_labels, scales):
    """Reference train loop, minimally ported from main.py:64-96."""
    criterion = REF_LOSSES.PushPullLoss(N_CLASSES, torch.from_numpy(scales))
    opt = torch.optim.AdamW(ref.parameters(), lr=LR, weight_decay=WD)
    image = torch.from_numpy(pixels.transpose(0, 3, 1, 2))
    tb = torch.from_numpy(gt_boxes)
    tl = torch.from_numpy(gt_labels).long()
    traj = []
    for _ in range(STEPS):
        opt.zero_grad()
        pred_boxes, _, pred_sims, _ = ref(image)
        losses = criterion(pred_sims, tl, pred_boxes, tb)
        loss = (
            losses["loss_ce"]
            + losses["loss_bg"]
            + losses["loss_bbox"]
            + losses["loss_giou"]
        )
        loss.backward()
        opt.step()
        traj.append({k: float(v) for k, v in losses.items()})
    return traj


def _our_trajectory(cfg, params, pixels, gt_boxes, gt_labels, scales):
    weights = jnp.asarray(scales)
    mask = jnp.ones(gt_labels.shape, bool)

    def loss_fn(p):
        boxes, sims = owlvit.forward_train(p, cfg, jnp.asarray(pixels))
        losses = our_losses.push_pull_loss(
            sims, boxes, jnp.asarray(gt_labels), jnp.asarray(gt_boxes),
            mask, N_CLASSES, class_weights=weights,
        )
        return our_losses.total_loss(losses), losses

    tx = optax.adamw(LR, weight_decay=WD)
    opt_state = tx.init(params)

    @jax.jit
    def step(p, s):
        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, losses

    traj = []
    for _ in range(STEPS):
        params, opt_state, losses = step(params, opt_state)
        traj.append({k: float(v) for k, v in losses.items()})
    return traj


def test_loss_trajectory_matches_reference(setup):
    cfg, ref, params, pixels, gt_boxes, gt_labels, scales = setup
    ref_traj = _ref_trajectory(ref, pixels, gt_boxes, gt_labels, scales)
    our_traj = _our_trajectory(cfg, params, pixels, gt_boxes, gt_labels, scales)

    # step 0 is pure forward parity; later steps accumulate optimizer drift
    # (fp32 reassociation through two frameworks), so the tolerance widens
    for step_i, (r, o) in enumerate(zip(ref_traj, our_traj)):
        rtol = 2e-4 * (4 ** step_i)
        for k in ("loss_ce", "loss_bg", "loss_bbox", "loss_giou"):
            np.testing.assert_allclose(
                o[k], r[k], rtol=rtol, atol=1e-5,
                err_msg=f"step {step_i} {k}: ref={r[k]} ours={o[k]}",
            )

    # the trajectory must actually move (training is happening, not frozen)
    assert ref_traj[0]["loss_bbox"] != ref_traj[-1]["loss_bbox"]
