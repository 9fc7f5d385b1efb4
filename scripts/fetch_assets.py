#!/usr/bin/env python
"""Fetch real OWL-ViT assets (network required) and convert for owlvit_tpu.

One network-enabled command makes REPRODUCE.md executable top-to-bottom:

    python scripts/fetch_assets.py --model b32 --out assets/

Downloads from the HF hub (the reference loads the same checkpoint via
AutoProcessor/from_pretrained, /root/reference/src/models.py:149-191):
  * vocab.json + merges.txt        -> real CLIP BPE for data.tokenizer
  * pytorch_model.bin/safetensors  -> converted to <out>/owlvit-<model>.npz

Then point config.yaml at them:

    model:
      params_npz: assets/owlvit-b32.npz
      clip_vocab: assets/vocab.json
      clip_merges: assets/merges.txt

This environment has ZERO egress, so the script only runs where network
exists; `--check` verifies presence/shapes of already-downloaded assets
offline. No torch/transformers is imported until needed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

HF_NAMES = {
    "b32": "google/owlvit-base-patch32",
    "b16": "google/owlvit-base-patch16",
    "l14": "google/owlvit-large-patch14",
}


def check(out_dir: str, model: str) -> int:
    """Offline validation of previously fetched assets."""
    ok = True
    vocab = os.path.join(out_dir, "vocab.json")
    merges = os.path.join(out_dir, "merges.txt")
    npz = os.path.join(out_dir, f"owlvit-{model}.npz")
    if os.path.exists(vocab):
        n = len(json.load(open(vocab)))
        print(f"vocab.json: {n} entries", "OK" if n == 49408 else "UNEXPECTED")
        ok &= n == 49408
    else:
        print("vocab.json: MISSING")
        ok = False
    if os.path.exists(merges):
        n = sum(1 for line in open(merges) if line.strip() and not line.startswith("#"))
        print(f"merges.txt: {n} merges", "OK" if n > 40000 else "UNEXPECTED")
        ok &= n > 40000
    else:
        print("merges.txt: MISSING")
        ok = False
    if os.path.exists(npz):
        import numpy as np

        from owlvit_tpu.models import get_config
        from owlvit_tpu.models.convert import load_params

        params = load_params(npz)
        cfg = get_config(model)
        d = params["vision"]["layers"]["ln1"]["scale"].shape
        want = (cfg.vision.num_layers, cfg.vision.hidden_size)
        print(f"{npz}: layers ln1 {d}", "OK" if tuple(d) == want else "UNEXPECTED")
        ok &= tuple(d) == want
        emb = params["text"]["token_embedding"].shape
        print(f"  text token_embedding {emb}",
              "OK" if emb[0] == 49408 else "UNEXPECTED")
        ok &= emb[0] == 49408
        del np
    else:
        print(f"{npz}: MISSING")
        ok = False
    return 0 if ok else 1


def fetch(out_dir: str, model: str) -> int:
    os.makedirs(out_dir, exist_ok=True)
    name = HF_NAMES[model]
    print(f"fetching {name} ...")
    try:
        from huggingface_hub import hf_hub_download
    except ImportError:
        print("huggingface_hub not installed; trying transformers fallback")
        hf_hub_download = None

    if hf_hub_download is not None:
        for fname in ("vocab.json", "merges.txt"):
            path = hf_hub_download(repo_id=name, filename=fname)
            dst = os.path.join(out_dir, fname)
            with open(path, "rb") as s, open(dst, "wb") as d:
                d.write(s.read())
            print(f"wrote {dst}")
    else:
        from transformers import AutoProcessor

        proc = AutoProcessor.from_pretrained(name)
        proc.tokenizer.save_vocabulary(out_dir)
        print(f"wrote {out_dir}/vocab.json, merges.txt")

    # checkpoint -> npz (same path as `python -m owlvit_tpu.cli convert`)
    from transformers import OwlViTForObjectDetection

    from owlvit_tpu.models import get_config
    from owlvit_tpu.models.convert import convert_state_dict, save_params

    hf = OwlViTForObjectDetection.from_pretrained(name)
    params = convert_state_dict(dict(hf.state_dict()), get_config(model))
    npz = os.path.join(out_dir, f"owlvit-{model}.npz")
    save_params(npz, params)
    print(f"wrote {npz}")
    return check(out_dir, model)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="b32", choices=sorted(HF_NAMES))
    ap.add_argument("--out", default="assets")
    ap.add_argument("--check", action="store_true",
                    help="offline: validate already-downloaded assets")
    args = ap.parse_args(argv)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if args.check:
        return check(args.out, args.model)
    return fetch(args.out, args.model)


if __name__ == "__main__":
    raise SystemExit(main())
