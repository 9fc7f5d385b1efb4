"""Text-embeddings-as-priors experiment
(reference experiments/check_text_embeddings_as_priors.ipynb).

Encodes many class-name prompts with the CLIP text tower and checks that the
embedding space is semantically organized (the justification for initializing
the trainable query bank from text embeddings): reduce to 2-3D (t-SNE) and
report nearest-neighbor structure. Writes JSON (+ PNG with matplotlib).

Usage:
    python experiments/check_text_embeddings_as_priors.py --config config.yaml
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from check_zero_shot import reduce_embed  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--labelmap", default=None,
                    help="labelmap.json; defaults to the 80 COCO classes")
    ap.add_argument("--out", default="experiments/text_priors_report.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from owlvit_tpu.data.coco import dense_labelmap
    from owlvit_tpu.data.tokenizer import CLIPTokenizer, HashTokenizer, build_prompts
    from owlvit_tpu.models import get_config, owlvit
    from owlvit_tpu.models.convert import load_params
    from owlvit_tpu.utils.config import load_config

    cfg = load_config(args.config)
    mcfg = get_config(cfg.model.name, dtype="float32")
    if cfg.model.params_npz:
        params = load_params(cfg.model.params_npz)
    else:
        print("NOTE: no params_npz — random text tower (structure demo only)")
        params = owlvit.init(jax.random.PRNGKey(0), mcfg)

    if args.labelmap:
        with open(args.labelmap) as f:
            labelmap = {int(k): v for k, v in json.load(f).items()}
    else:
        labelmap = dense_labelmap()

    if cfg.model.clip_vocab:
        tok = CLIPTokenizer(cfg.model.clip_vocab, cfg.model.clip_merges,
                            max_len=mcfg.text.max_len)
    else:
        tok = HashTokenizer(mcfg.text.vocab_size, max_len=mcfg.text.max_len)

    prompts = build_prompts(labelmap)
    enc = tok(prompts)
    bank = np.asarray(
        owlvit.build_query_bank(
            params, mcfg, jnp.asarray(enc["input_ids"]),
            jnp.asarray(enc["attention_mask"]),
        )
    )  # [3C, proj]

    # prompt variants of the same class should be each other's neighbors
    sims = bank @ bank.T
    np.fill_diagonal(sims, -np.inf)
    nn = sims.argmax(1)
    same_class = (nn // 3) == (np.arange(len(nn)) // 3)

    report = {
        "n_prompts": len(prompts),
        "n_classes": len(labelmap),
        "nn_same_class_frac": float(same_class.mean()),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        # Two panels mirroring the reference notebook's visual story (a
        # labeled 3-D UMAP/plotly scatter): 2-D manifold embedding with
        # class-name labels at each class centroid, and a 3-D scatter
        # (t-SNE stands in for UMAP offline, PCA if sklearn is absent;
        # hover labels become static centroid text).
        classes = np.arange(len(bank)) // 3
        names = list(labelmap.values())
        proj, method2 = reduce_embed(bank, 2)
        proj3, method3 = reduce_embed(bank, 3)
        fig = plt.figure(figsize=(14, 6))
        ax = fig.add_subplot(1, 2, 1)
        ax.scatter(proj[:, 0], proj[:, 1], c=classes, s=10, cmap="hsv")
        label_every = max(1, len(names) // 20)  # keep the panel readable
        for ci in range(0, len(names), label_every):
            cx, cy = proj[classes == ci].mean(0)
            ax.annotate(names[ci], (cx, cy), fontsize=6, alpha=0.8)
        ax.set_title(
            f"class-prompt text embeddings ({method2}), class labels")
        ax3 = fig.add_subplot(1, 2, 2, projection="3d")
        ax3.scatter(proj3[:, 0], proj3[:, 1], proj3[:, 2],
                    c=classes, s=8, cmap="hsv")
        ax3.set_title(f"{method3} (reference used UMAP-3 + plotly hover)")
        fig.tight_layout()
        fig.savefig(args.out.replace(".json", ".png"), dpi=120)
        print(f"figure: {args.out.replace('.json', '.png')}")
    except ImportError:
        pass


if __name__ == "__main__":
    main()
