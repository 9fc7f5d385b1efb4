"""Text-embeddings-as-priors experiment
(reference experiments/check_text_embeddings_as_priors.ipynb).

Encodes many class-name prompts with the CLIP text tower and checks that the
embedding space is semantically organized (the justification for initializing
the trainable query bank from text embeddings): reduce to 2-3D with PCA and
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

from check_zero_shot import pca  # noqa: E402


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

        proj = pca(bank, 2)
        fig, ax = plt.subplots(figsize=(7, 6))
        ax.scatter(proj[:, 0], proj[:, 1],
                   c=np.arange(len(proj)) // 3, s=10, cmap="hsv")
        ax.set_title("class-prompt text embeddings (PCA), colored by class")
        fig.savefig(args.out.replace(".json", ".png"), dpi=120)
    except ImportError:
        pass


if __name__ == "__main__":
    main()
