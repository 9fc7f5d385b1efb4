"""CLI surface: make-synthetic, train, eval, infer (bank/zero-shot/one-shot)."""

import json
import os

import pytest

from owlvit_tpu import cli


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cliwork"))
    cfg = f"""
data:
  synthetic_root: {root}/synth
  num_train_images: 8
  num_test_images: 2
  max_gt: 8
  synthetic_classes: 3
training:
  n_epochs: 1
  learning_rate: 1.0e-4
  batch_size: 4
  checkpoint_dir: {root}/ckpt
  top_k: 8
model:
  name: tiny
  trainable_last_k: 1
"""
    cfg_path = os.path.join(root, "config.yaml")
    with open(cfg_path, "w") as f:
        f.write(cfg)
    return root, cfg_path


def test_make_synthetic(workdir, capsys):
    root, _ = workdir
    cli.main(["make-synthetic", "--root", f"{root}/standalone", "--n-train", "3",
              "--n-test", "1", "--n-classes", "2"])
    out = json.loads(capsys.readouterr().out)
    assert os.path.exists(out["train"])


def test_train_and_eval(workdir, capsys):
    root, cfg_path = workdir
    cli.main(["train", "--config", cfg_path, "--workdir", root])
    captured = capsys.readouterr().out
    assert "map" in captured
    assert os.path.isdir(f"{root}/ckpt")

    cli.main(["eval", "--config", cfg_path, "--workdir", root])
    text = capsys.readouterr().out
    out = json.loads(text[text.index("{"):])  # skip the "resumed..." line
    assert "map_50" in out


def test_infer_modes(workdir, capsys):
    root, cfg_path = workdir
    img = None
    for f in os.listdir(f"{root}/synth/images"):
        img = os.path.join(f"{root}/synth/images", f)
        break
    # trained query bank
    cli.main(["infer", "--config", cfg_path, "--workdir", root, "--image", img])
    capsys.readouterr()
    # zero-shot free text
    cli.main(["infer", "--config", cfg_path, "--workdir", root, "--image", img,
              "--queries", "a red rectangle", "a green ellipse"])
    capsys.readouterr()
    # one-shot exemplar
    cli.main(["infer", "--config", cfg_path, "--workdir", root, "--image", img,
              "--query-image", img, "--top", "3"])
    out = capsys.readouterr().out
    assert "query-object" in out or out == ""  # may be empty below threshold


def test_bulk_infer(workdir, capsys):
    """cli bulk-infer: the prestaged offline path (pixels device-staged
    BEFORE the Trainer's query-bank build — the relay put-flip ordering)
    writes {filename: detections} for every image in the dir."""
    root, cfg_path = workdir
    out_path = os.path.join(root, "bulk.json")
    cli.main(["bulk-infer", "--config", cfg_path, "--workdir", root,
              "--input-dir", f"{root}/synth/images", "--out", out_path,
              "--batch-size", "4"])
    text = capsys.readouterr().out
    assert "img/s" in text
    with open(out_path) as f:
        out = json.load(f)
    n_imgs = len(os.listdir(f"{root}/synth/images"))
    assert len(out) == n_imgs
    rec = next(iter(out.values()))
    assert {"boxes", "scores", "classes", "labels"} <= set(rec)


def test_bulk_infer_zero_shot(workdir, capsys):
    root, cfg_path = workdir
    out_path = os.path.join(root, "bulk_zs.json")
    cli.main(["bulk-infer", "--config", cfg_path, "--workdir", root,
              "--input-dir", f"{root}/synth/images", "--out", out_path,
              "--batch-size", "4", "--queries", "a red rectangle"])
    capsys.readouterr()
    with open(out_path) as f:
        out = json.load(f)
    for rec in out.values():
        assert all(lb == "a red rectangle" for lb in rec["labels"])
