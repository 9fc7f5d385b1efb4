"""Zero-shot sanity experiment (reference experiments/check_zero_shot_results.ipynb).

Runs the zero-shot detector on an image, then verifies that per-patch class
embeddings organize into object clusters: dimensionality-reduce the [P, proj]
class embeddings (PCA — numpy SVD; the reference used UMAP, unavailable
offline) and k-means them, then report how detected boxes distribute across
clusters. Writes a JSON report + (if matplotlib exists) a scatter PNG.

Usage:
    python experiments/check_zero_shot.py --config config.yaml \
        --image path.png --queries "a photo of a cat" "a photo of a dog"
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def pca(x: np.ndarray, dims: int = 2) -> np.ndarray:
    x = x - x.mean(0)
    _, _, vt = np.linalg.svd(x, full_matrices=False)
    return x @ vt[:dims].T


def reduce_embed(x: np.ndarray, dims: int = 2, seed: int = 0) -> tuple:
    """Nonlinear manifold embedding like the reference's UMAP: sklearn
    t-SNE when available (init='pca' for determinism up to solver), PCA
    otherwise. Returns (embedding [N, dims], method_name)."""
    try:
        from sklearn.manifold import TSNE

        perp = min(30.0, max(2.0, (len(x) - 1) / 4))
        emb = TSNE(
            n_components=dims, init="pca", perplexity=perp,
            random_state=seed,
        ).fit_transform(x)
        return emb, f"t-SNE-{dims}"
    except Exception:  # noqa: BLE001 — no sklearn, or too few samples
        return pca(x, dims), f"PCA-{dims}"


def kmeans(x: np.ndarray, k: int, iters: int = 50, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    centers = x[rng.choice(len(x), k, replace=False)]
    for _ in range(iters):
        d = ((x[:, None] - centers[None]) ** 2).sum(-1)
        assign = d.argmin(1)
        for j in range(k):
            pts = x[assign == j]
            if len(pts):
                centers[j] = pts.mean(0)
    return assign


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--image", required=True)
    ap.add_argument("--queries", nargs="+", required=True)
    ap.add_argument("--clusters", type=int, default=5)
    ap.add_argument("--out", default="experiments/zero_shot_report.json")
    args = ap.parse_args()

    import jax.numpy as jnp
    from PIL import Image

    from owlvit_tpu.data.tokenizer import CLIPTokenizer, HashTokenizer
    from owlvit_tpu.models import get_config, owlvit
    from owlvit_tpu.models.convert import load_params
    from owlvit_tpu.ops import nms as nms_ops
    from owlvit_tpu.ops.preprocess import normalize_image
    from owlvit_tpu.utils.config import load_config

    cfg = load_config(args.config)
    mcfg = get_config(cfg.model.name, dtype="float32")
    if cfg.model.params_npz:
        params = load_params(cfg.model.params_npz)
    else:
        import jax

        print("NOTE: no params_npz — using random weights (structure demo only)")
        params = owlvit.init(jax.random.PRNGKey(0), mcfg)

    size = mcfg.vision.image_size
    img = Image.open(args.image).convert("RGB")
    arr = np.asarray(img.resize((size, size), Image.BICUBIC), np.uint8)

    if cfg.model.clip_vocab:
        tok = CLIPTokenizer(cfg.model.clip_vocab, cfg.model.clip_merges,
                            max_len=mcfg.text.max_len)
    else:
        tok = HashTokenizer(mcfg.text.vocab_size, max_len=mcfg.text.max_len)
    enc = tok(args.queries)

    px = normalize_image(jnp.asarray(arr[None]))
    feats = owlvit.image_embedder(params, mcfg, px)
    boxes = owlvit.box_predictor(params, mcfg, feats)
    embeds = np.asarray(owlvit.class_embeds(params, feats))[0]  # [P, proj]

    pred_boxes, logits = owlvit.forward_zero_shot(
        params, mcfg, px, jnp.asarray(enc["input_ids"]),
        jnp.asarray(enc["attention_mask"]),
    )
    probs = 1.0 / (1.0 + np.exp(-np.asarray(logits)[0]))  # sigmoid, HF decode
    out = nms_ops.postprocess(
        pred_boxes, jnp.asarray(probs[None]),
        confidence_threshold=0.1, iou_threshold=0.5, top_k=32,
    )

    proj, method2 = reduce_embed(embeds, 2)
    assign = kmeans(proj, args.clusters)
    det_patches = np.asarray(out["classes"][0]) >= 0

    report = {
        "n_patches": int(embeds.shape[0]),
        "cluster_sizes": np.bincount(assign, minlength=args.clusters).tolist(),
        "detections": int(np.asarray(out["valid"][0]).sum()),
        "queries": args.queries,
        "top_scores": np.asarray(out["scores"][0])[:5].tolist(),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        # Three panels, mirroring the reference notebook's visual story
        # (UMAP 3-D scatter + detections): 2-D embedding scatter, 3-D
        # embedding scatter (t-SNE stands in for UMAP offline; PCA if
        # sklearn is absent), and the input image with detected boxes.
        proj3, method3 = reduce_embed(embeds, 3)
        fig = plt.figure(figsize=(16, 5))
        ax = fig.add_subplot(1, 3, 1)
        ax.scatter(proj[:, 0], proj[:, 1], c=assign, s=8, cmap="tab10")
        ax.set_title(
            f"per-patch class embeddings ({method2}), k-means colored")
        ax3 = fig.add_subplot(1, 3, 2, projection="3d")
        ax3.scatter(proj3[:, 0], proj3[:, 1], proj3[:, 2],
                    c=assign, s=6, cmap="tab10")
        ax3.set_title(f"{method3} (reference used UMAP-3)")
        axi = fig.add_subplot(1, 3, 3)
        axi.imshow(arr)
        keep = np.asarray(out["valid"][0])
        det_boxes = np.asarray(out["boxes"][0])[keep] * size
        det_scores = np.asarray(out["scores"][0])[keep]
        for bx, sc in zip(det_boxes, det_scores):
            axi.add_patch(plt.Rectangle(
                (bx[0], bx[1]), bx[2] - bx[0], bx[3] - bx[1],
                fill=False, edgecolor="lime", linewidth=1.5,
            ))
            axi.text(bx[0], bx[1] - 2, f"{sc:.2f}", color="lime", fontsize=7)
        axi.set_title(f"{int(keep.sum())} detections")
        axi.axis("off")
        fig.tight_layout()
        fig.savefig(args.out.replace(".json", ".png"), dpi=120)
        print(f"figure: {args.out.replace('.json', '.png')}")
    except ImportError:
        pass


if __name__ == "__main__":
    main()
