"""Command-line interface.

The reference is driven by `python main.py` with zero CLI (config.yaml read
ad-hoc). Here: subcommands for the full lifecycle.

    python -m owlvit_tpu.cli train --config config.yaml
    python -m owlvit_tpu.cli eval --config config.yaml
    python -m owlvit_tpu.cli infer --config config.yaml --image img.png
    python -m owlvit_tpu.cli serve --config config.yaml --port 8750
    python -m owlvit_tpu.cli make-synthetic --root /tmp/synth
    python -m owlvit_tpu.cli make-coco-subset --config config.yaml
    python -m owlvit_tpu.cli convert --model b32 --src <hf-name-or-dir> --out p.npz
"""

from __future__ import annotations

import argparse
import json
import sys


def _build_tokenizer(cfg, mcfg, *, fallback: bool):
    """The one place CLI commands build a text tokenizer: the CLIP BPE from
    `model.clip_vocab/clip_merges` when the assets exist; otherwise either
    None (caller disables free-text queries) or, with fallback=True, the
    deterministic HashTokenizer plus a stderr warning — its embeddings are
    meaningless for a real checkpoint."""
    from owlvit_tpu.data.tokenizer import CLIPTokenizer, HashTokenizer

    if cfg.model.clip_vocab:
        return CLIPTokenizer(cfg.model.clip_vocab, cfg.model.clip_merges,
                             max_len=mcfg.text.max_len)
    if not fallback:
        return None
    print(
        "warning: model.clip_vocab is not set — free-text queries are "
        "encoded by the FALLBACK HashTokenizer, so the text embeddings "
        "(and the resulting detections) are meaningless for a real "
        "checkpoint. Fetch the CLIP BPE assets (scripts/fetch_assets.py) "
        "and set model.clip_vocab/clip_merges.", file=sys.stderr, flush=True,
    )
    return HashTokenizer(mcfg.text.vocab_size, max_len=mcfg.text.max_len)


def _cmd_train(args):
    from owlvit_tpu.train import Trainer
    from owlvit_tpu.utils.config import load_config

    trainer = Trainer(load_config(args.config), workdir=args.workdir)
    metrics = trainer.run()
    print(json.dumps({k: v for k, v in metrics.items()
                      if not hasattr(v, "shape")}, indent=2))


def _cmd_eval(args):
    from owlvit_tpu.train import Trainer
    from owlvit_tpu.utils.config import load_config

    trainer = Trainer(load_config(args.config), workdir=args.workdir)
    infer_fn = None
    if getattr(args, "from_export", None):
        # deployment-parity eval: run the SAME protocol through the loaded
        # serving artifact — its mAP must reproduce the in-package eval
        from owlvit_tpu.train.export import (
            load_exported, load_exported_weightless,
        )

        if getattr(args, "export_params", None):
            from owlvit_tpu.models.convert import load_params

            infer_fn = load_exported_weightless(
                args.from_export, load_params(args.export_params)
            )
        else:
            infer_fn = load_exported(args.from_export)
        print(f"eval through exported artifact: {args.from_export}")
    metrics = trainer.evaluate(
        infer_fn=infer_fn,
        save_detections=getattr(args, "save_detections", None),
    )
    print(json.dumps({k: (v.tolist() if hasattr(v, "tolist") else v)
                      for k, v in metrics.items()}, indent=2))


def _cmd_infer(args):
    """Detect with the trained query bank, free-text queries (zero-shot), or
    a query image (one-shot), selected by --queries / --query-image."""
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from owlvit_tpu.models import owlvit
    from owlvit_tpu.ops import nms as nms_ops
    from owlvit_tpu.ops.preprocess import normalize_image
    from owlvit_tpu.train import Trainer
    from owlvit_tpu.utils.config import load_config

    cfg = load_config(args.config)
    trainer = Trainer(cfg, workdir=args.workdir)
    # pure-inference process: all-frozen (k=0 ≡ k=None numerics, parity
    # pinned by test_static_softmax_routing) + static-max softmax — the
    # fwd-only kernel mode that faults grad-bearing processes (BENCH.md r4d)
    mcfg = trainer.model_cfg.replace(trainable_last_k=0, static_softmax=True)
    size = mcfg.vision.image_size
    img = Image.open(args.image).convert("RGB")
    w, h = img.size
    arr = np.asarray(img.resize((size, size), Image.BICUBIC), np.uint8)

    from owlvit_tpu.train.state import combine_params

    params = combine_params(trainer.state.trainable, trainer.state.frozen)
    px = normalize_image(jnp.asarray(arr[None]))

    if args.queries:  # zero-shot: free-text conditioning
        tok = _build_tokenizer(cfg, mcfg, fallback=True)
        enc = tok(args.queries)
        boxes_j, logits = owlvit.forward_zero_shot(
            params, mcfg, px, jnp.asarray(enc["input_ids"]),
            jnp.asarray(enc["attention_mask"]),
        )
        sims = 1.0 / (1.0 + jnp.exp(-logits))  # sigmoid (HF decode protocol)
        names = {i: q for i, q in enumerate(args.queries)}
    elif args.query_image:  # one-shot: image conditioning
        qimg = Image.open(args.query_image).convert("RGB")
        qarr = np.asarray(qimg.resize((size, size), Image.BICUBIC), np.uint8)
        qpx = normalize_image(jnp.asarray(qarr[None]))
        boxes_j, logits = owlvit.forward_one_shot(params, mcfg, px, qpx)
        sims = 1.0 / (1.0 + jnp.exp(-logits))
        names = {0: "query-object"}
    else:  # trained query bank
        boxes_j, sims = owlvit.forward_train(params, mcfg, px)
        names = trainer.labelmap

    out = nms_ops.postprocess(
        boxes_j, sims,
        confidence_threshold=cfg.training.confidence_threshold,
        iou_threshold=cfg.training.iou_threshold,
        top_k=cfg.training.top_k,
    )
    keep = np.asarray(out["valid"][0])
    boxes = np.asarray(out["boxes"][0])[keep] * np.array([w, h, w, h])
    classes = np.asarray(out["classes"][0])[keep]
    scores = np.asarray(out["scores"][0])[keep]
    for b, c, s in list(zip(boxes, classes, scores))[: args.top]:
        name = names.get(int(c), str(int(c)))
        print(f"{name:24s} {s:.3f}  [{b[0]:.1f}, {b[1]:.1f}, {b[2]:.1f}, {b[3]:.1f}]")


def _cmd_make_synthetic(args):
    from owlvit_tpu.data import synthetic

    paths = synthetic.generate(
        args.root, n_train=args.n_train, n_test=args.n_test,
        n_classes=args.n_classes, seed=args.seed,
    )
    print(json.dumps(paths, indent=2))


def _cmd_make_coco_subset(args):
    from owlvit_tpu.data import coco
    from owlvit_tpu.utils.config import load_config

    cfg = load_config(args.config).data
    out = coco.build_subset(
        cfg.annotations_file, args.out_dir,
        num_train=cfg.num_train_images, num_test=cfg.num_test_images,
        seed=args.seed,
    )
    print(json.dumps({"n_train": out["n_train"], "n_test": out["n_test"],
                      "counts": out["counts"]}, indent=2))


def _cmd_export(args):
    """Export the (optionally fine-tuned) detector as a serving artifact."""
    from owlvit_tpu.train import Trainer
    from owlvit_tpu.train.export import export_detector, save_exported
    from owlvit_tpu.train.state import combine_params
    from owlvit_tpu.utils.config import load_config

    trainer = Trainer(load_config(args.config), workdir=args.workdir)
    trainable = trainer.state.trainable
    if getattr(args, "ema", False):
        if trainer.ema is None:
            raise SystemExit(
                "--ema needs training.ema_decay set in the config (the EMA "
                "tree is restored from the checkpoint next to the TrainState)"
            )
        trainable = trainer.ema
    params = combine_params(trainable, trainer.state.frozen)
    if args.weightless:
        from owlvit_tpu.models.convert import save_params
        from owlvit_tpu.train.export import export_detector_weightless

        blob = export_detector_weightless(
            params, trainer.model_cfg, batch_size=args.batch_size
        )
        # the artifact is graph-only: persist the CURRENT (fine-tuned)
        # weights next to it — binding a stale converter npz would silently
        # serve pre-finetune weights
        save_params(args.out + ".npz", params)
        print(f"wrote {args.out}.npz (weights for load_exported_weightless)")
    else:
        blob = export_detector(
            params, trainer.model_cfg, batch_size=args.batch_size
        )
    save_exported(args.out, blob)
    print(f"wrote {args.out} ({len(blob)} bytes)")


def _cmd_serve(args):
    """Serve detections over HTTP with dynamic request batching (serve.py)."""
    from aiohttp import web

    from owlvit_tpu.serve import DetectorServer, make_app
    from owlvit_tpu.train import Trainer
    from owlvit_tpu.train.state import combine_params
    from owlvit_tpu.utils.config import load_config

    cfg = load_config(args.config)
    trainer = Trainer(cfg, workdir=args.workdir)
    params = combine_params(trainer.state.trainable, trainer.state.frozen)
    buckets = tuple(int(b) for b in args.buckets.split(","))
    # no fallback: without real vocab assets the zero-shot lane is disabled
    # rather than served with meaningless embeddings
    tok = _build_tokenizer(cfg, trainer.model_cfg, fallback=False)
    server = DetectorServer(
        params, trainer.model_cfg, buckets=buckets,
        max_delay_ms=args.max_delay_ms,
        confidence_threshold=cfg.training.confidence_threshold,
        iou_threshold=cfg.training.iou_threshold,
        top_k=cfg.training.top_k,
        tokenizer=tok,
        one_shot=args.one_shot,
    )
    print(f"serving {cfg.model.name} on {args.host}:{args.port} "
          f"buckets={buckets} max_delay_ms={args.max_delay_ms}", flush=True)
    try:
        web.run_app(make_app(server, trainer.labelmap),
                    host=args.host, port=args.port)
    finally:
        server.close()


def _cmd_bulk_infer(args):
    """Offline batch detection over a directory of images via the
    fetch-deferred bulk path (serve.bulk_detect): every batch's packed
    detections stay device-resident until one trailing fetch pass, which
    keeps host->device puts in fast mode on the TPU relay for the whole
    job (online serving's per-batch fetch permanently degrades later puts
    ~50-100x — BENCH.md r5b/r5c). Writes {filename: detections} JSON."""
    import json as _json
    import time
    from pathlib import Path

    import numpy as np
    from PIL import Image

    from owlvit_tpu.serve import DetectorServer
    from owlvit_tpu.train import Trainer
    from owlvit_tpu.train.state import combine_params
    from owlvit_tpu.utils.config import load_config

    cfg = load_config(args.config)

    exts = {".png", ".jpg", ".jpeg", ".bmp", ".webp"}
    paths = sorted(
        p for p in Path(args.input_dir).iterdir()
        if p.suffix.lower() in exts
    )
    if not paths:
        print(f"no images in {args.input_dir}", file=sys.stderr)
        return 1
    # ORDER MATTERS (the relay's put-flip rules, CLAUDE.md): decode AND
    # device-stage every pixel FIRST, while the process is pristine — the
    # Trainer below builds the query bank, whose text-tower remote compile
    # would otherwise drop the staging puts from ~1.4 GB/s to ~90 MB/s.
    # get_config alone gives the image size host-side without touching
    # params or the device.
    from owlvit_tpu.models import get_config
    from owlvit_tpu.serve import stage_bulk_images

    S = get_config(cfg.model.name).vision.image_size
    t0 = time.perf_counter()
    # Threaded native decode straight TO MODEL SIZE (the dataset path's
    # C++ pool, PIL-exact): peak host memory is n × S²×3 model-sized
    # arrays, never n full-resolution decodes, and an offline job over an
    # arbitrary directory skips unreadable files instead of dying on the
    # first truncated JPEG.
    images, whs, kept, failures = [], [], [], {}

    def _pil_one(p):
        with Image.open(p) as im:
            im = im.convert("RGB")
            w, h = im.size
            return (np.asarray(im.resize((S, S), Image.BICUBIC), np.uint8),
                    (w, h))

    from owlvit_tpu import native as native_mod

    res = native_mod.decode_resize_batch([str(p) for p in paths], S)
    for i, p in enumerate(paths):
        try:
            if res is not None and bool(res[2][i]):
                img = res[0][i]
                wh = (int(res[1][i, 0]), int(res[1][i, 1]))
            else:
                img, wh = _pil_one(p)  # unsupported format / native absent
        except Exception as e:  # noqa: BLE001 — per-file skip, job survives
            failures[p.name] = f"{type(e).__name__}: {e}"
            continue
        images.append(img)
        whs.append(wh)
        kept.append(p)
    if failures:
        print(f"warning: skipped {len(failures)} unreadable image(s): "
              + ", ".join(list(failures)[:5])
              + ("..." if len(failures) > 5 else ""),
              file=sys.stderr, flush=True)
    paths = kept
    if not paths:
        print("no decodable images", file=sys.stderr)
        return 1
    pre = stage_bulk_images(images, S, args.batch_size, orig_whs=whs)
    del images, res  # host copies staged; free before the model builds

    trainer = Trainer(cfg, workdir=args.workdir)
    params = combine_params(trainer.state.trainable, trainer.state.frozen)
    tok = (_build_tokenizer(cfg, trainer.model_cfg, fallback=True)
           if args.queries else None)

    # warmup=False + prestaged: every pixel put landed before the serve
    # graph's remote compile / first big exec / first fetch — any of which
    # flips the relay into permanently degraded puts. All job inputs are
    # device-resident at once: ~1.7 MB per 768px image, so size jobs to
    # HBM (<=~4000 images beside B/16).
    srv = DetectorServer(
        params, trainer.model_cfg, buckets=(args.batch_size,),
        confidence_threshold=cfg.training.confidence_threshold,
        iou_threshold=cfg.training.iou_threshold,
        top_k=cfg.training.top_k,
        warmup=False, autostart=False, tokenizer=tok,
        max_queries=max(8, len(args.queries or ())),
    )
    results = srv.bulk_detect(queries=args.queries, prestaged=pre)
    wall = time.perf_counter() - t0
    names = (
        {i: q for i, q in enumerate(args.queries)} if args.queries
        else (trainer.labelmap or {})
    )
    out = {}
    for p, r in zip(paths, results):
        out[p.name] = {
            "boxes": np.round(r["boxes"], 2).tolist(),
            "scores": np.round(r["scores"], 4).tolist(),
            "classes": r["classes"].tolist(),
            "labels": [names.get(int(c), str(int(c)))
                       for c in r["classes"]],
        }
    for name, err in failures.items():  # skipped files are reported, not lost
        out[name] = {"error": err}
    with open(args.out, "w") as f:
        _json.dump(out, f)
    st = srv.stats().get("bulk", {})
    print(f"{len(paths)} images in {wall:.1f}s "
          f"({len(paths) / wall:.1f} img/s; put {st.get('put_secs')}s "
          f"exec {st.get('exec_secs')}s fetch {st.get('fetch_secs')}s) "
          f"-> {args.out}", flush=True)


def _cmd_convert(args):
    """Offline HF -> npz conversion (torch/transformers allowed here only)."""
    from transformers import OwlViTForObjectDetection

    from owlvit_tpu.models import get_config
    from owlvit_tpu.models.convert import convert_state_dict, save_params

    model = OwlViTForObjectDetection.from_pretrained(args.src)
    cfg = get_config(args.model)
    params = convert_state_dict(dict(model.state_dict()), cfg)
    save_params(args.out, params)
    print(f"wrote {args.out}")


def main(argv=None):
    p = argparse.ArgumentParser(prog="owlvit_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    for name, fn in [("train", _cmd_train), ("eval", _cmd_eval)]:
        sp = sub.add_parser(name)
        sp.add_argument("--config", required=True)
        sp.add_argument("--workdir", default=".")
        if name == "eval":
            sp.add_argument("--from-export", default=None,
                            help="serving artifact: eval THROUGH it "
                                 "(deployment parity; batch must match "
                                 "the export batch_size)")
            sp.add_argument("--export-params", default=None,
                            help="npz for a --weightless artifact")
            sp.add_argument("--save-detections", default=None,
                            help="write COCO-results-style JSON of every "
                                 "kept detection (external re-scoring)")
        sp.set_defaults(fn=fn)

    sp = sub.add_parser("infer")
    sp.add_argument("--config", required=True)
    sp.add_argument("--image", required=True)
    sp.add_argument("--workdir", default=".")
    sp.add_argument("--top", type=int, default=10)
    sp.add_argument("--queries", nargs="+", default=None,
                    help="free-text queries -> zero-shot detection")
    sp.add_argument("--query-image", default=None,
                    help="exemplar image -> one-shot detection")
    sp.set_defaults(fn=_cmd_infer)

    sp = sub.add_parser("bulk-infer")
    sp.add_argument("--config", required=True)
    sp.add_argument("--input-dir", required=True)
    sp.add_argument("--out", required=True,
                    help="output JSON: {filename: boxes/scores/classes/labels}")
    sp.add_argument("--workdir", default=".")
    sp.add_argument("--batch-size", type=int, default=32)
    sp.add_argument("--queries", nargs="+", default=None,
                    help="job-shared free-text queries (zero-shot)")
    sp.set_defaults(fn=_cmd_bulk_infer)

    sp = sub.add_parser("make-synthetic")
    sp.add_argument("--root", required=True)
    sp.add_argument("--n-train", type=int, default=64)
    sp.add_argument("--n-test", type=int, default=16)
    sp.add_argument("--n-classes", type=int, default=4)
    sp.add_argument("--seed", type=int, default=0)
    sp.set_defaults(fn=_cmd_make_synthetic)

    sp = sub.add_parser("make-coco-subset")
    sp.add_argument("--config", required=True)
    sp.add_argument("--out-dir", default="data")
    sp.add_argument("--seed", type=int, default=0)
    sp.set_defaults(fn=_cmd_make_coco_subset)

    sp = sub.add_parser("export")
    sp.add_argument("--config", required=True)
    sp.add_argument("--workdir", default=".")
    sp.add_argument("--out", required=True)
    sp.add_argument("--batch-size", type=int, default=1)
    sp.add_argument("--weightless", action="store_true",
                    help="export the graph only; bind weights at load time")
    sp.add_argument("--ema", action="store_true",
                    help="export the EMA weights (training.ema_decay)")
    sp.set_defaults(fn=_cmd_export)

    sp = sub.add_parser("serve")
    sp.add_argument("--config", required=True)
    sp.add_argument("--workdir", default=".")
    sp.add_argument("--host", default="127.0.0.1")
    sp.add_argument("--port", type=int, default=8750)
    sp.add_argument("--buckets", default="1,8,32",
                    help="compiled batch sizes (comma-separated, ascending)")
    sp.add_argument("--max-delay-ms", type=float, default=5.0,
                    help="dynamic-batching window for partial batches")
    sp.add_argument("--one-shot", action="store_true",
                    help="compile the one-shot (query_image) lane too")
    sp.set_defaults(fn=_cmd_serve)

    sp = sub.add_parser("convert")
    sp.add_argument("--model", default="b32")
    sp.add_argument("--src", required=True)
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=_cmd_convert)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
