"""CLIP BPE tokenizer vs HF's reference implementation on the same vocab.

Without the real CLIP vocab files (zero egress), parity is checked by
building a small but nontrivial BPE vocab from scratch and running BOTH
implementations (ours and transformers.CLIPTokenizer) over varied text —
same merges, same normalization, so the token ids must match exactly.
"""

import json

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

from owlvit_tpu.data.tokenizer import CLIPTokenizer  # noqa: E402


@pytest.fixture(scope="module")
def vocab_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("vocab")
    # character vocab over ascii letters/digits + end-of-word variants
    chars = "abcdefghijklmnopqrstuvwxyz0123456789.,!?'- "
    vocab, idx = {}, 0
    for c in chars:
        vocab[c] = idx; idx += 1
        vocab[c + "</w>"] = idx; idx += 1
    merges = []
    # a few real-ish merges incl. multi-stage chains
    for pair in [
        ("t", "h"), ("th", "e</w>"), ("a", "n"), ("an", "d</w>"),
        ("i", "n"), ("in", "g</w>"), ("c", "a"), ("ca", "t</w>"),
        ("d", "o"), ("do", "g</w>"), ("p", "h"), ("ph", "o"),
        ("pho", "t"), ("phot", "o</w>"), ("o", "f</w>"), ("a", "</w>"),
    ]:
        merges.append(f"{pair[0]} {pair[1]}")
        merged = pair[0] + pair[1]
        if merged not in vocab:
            vocab[merged] = idx; idx += 1
    vocab["<|startoftext|>"] = idx; idx += 1
    vocab["<|endoftext|>"] = idx; idx += 1

    vf = d / "vocab.json"
    vf.write_text(json.dumps(vocab))
    mf = d / "merges.txt"
    mf.write_text("#version: 0.2\n" + "\n".join(merges) + "\n")
    return str(vf), str(mf)


TEXTS = [
    "a photo of the cat",
    "the dog and the cat!",
    "thinking, doing, being?",
    "CAT AND DOG",  # lowercasing
    "  a   photo   of  a dog  ",  # whitespace cleanup
    "cat-dog, cat's dog't",  # punctuation + contraction pieces
]


def test_ids_match_hf(vocab_files):
    vf, mf = vocab_files
    from transformers import CLIPTokenizer as HFTok

    ours = CLIPTokenizer(vf, mf, max_len=32)
    hf = HFTok(vocab_file=vf, merges_file=mf)

    for text in TEXTS:
        a = ours.encode(text)
        b = hf.encode(text)
        assert a == b, f"{text!r}: ours={a} hf={b}"


def test_batch_padding_shape(vocab_files):
    vf, mf = vocab_files
    ours = CLIPTokenizer(vf, mf, max_len=16)
    out = ours(TEXTS)
    assert out["input_ids"].shape == (len(TEXTS), 16)
    # EOT last real token, pad id 0, query-mask convention
    for row, mask in zip(out["input_ids"], out["attention_mask"]):
        L = int(mask.sum())
        assert row[L - 1] == ours.eot
        assert (row[L:] == 0).all()
        assert row[0] == ours.sot
