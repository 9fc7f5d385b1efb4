"""DetectorServer: dynamic batching, padding parity, HTTP frontend."""

import asyncio
import io
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from owlvit_tpu.models import get_config, owlvit
from owlvit_tpu.ops import nms as nms_ops
from owlvit_tpu.ops.preprocess import normalize_image
from owlvit_tpu.serve import DetectorServer, make_app

N_CLASSES = 4


@pytest.fixture(scope="module")
def detector():
    cfg = get_config("tiny")
    params = owlvit.init(jax.random.PRNGKey(3), cfg,
                         num_queries=3 * N_CLASSES)
    return params, cfg


def _rand_images(n, size, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, (n, size, size, 3), dtype=np.uint8)


def _direct(params, cfg, images, top_k=16):
    boxes, sims = owlvit.forward_train(
        params, cfg.replace(trainable_last_k=None),
        normalize_image(jnp.asarray(images)))
    return jax.tree.map(np.asarray, nms_ops.postprocess(
        boxes, sims, confidence_threshold=0.01, iou_threshold=0.6,
        top_k=top_k))


def test_padded_batch_matches_direct(detector):
    """A padded partial batch must return the same detections as a direct
    exact-shape forward — pad rows are per-image independent."""
    params, cfg = detector
    S = cfg.vision.image_size
    images = _rand_images(3, S)
    ref = _direct(params, cfg, images)

    with DetectorServer(params, cfg, buckets=(8,), max_delay_ms=50,
                        top_k=16, warmup=False) as srv:
        futs = [srv.submit(img) for img in images]
        results = [f.result(timeout=120) for f in futs]

    for i, res in enumerate(results):
        keep = ref["valid"][i]
        # server scales boxes by original (w, h) = (S, S)
        np.testing.assert_allclose(
            res["boxes"] / S, ref["boxes"][i][keep], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(res["scores"], ref["scores"][i][keep],
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_array_equal(res["classes"], ref["classes"][i][keep])


def test_bucket_selection_and_stats(detector):
    """Queued-before-start requests drain as ONE batch into the smallest
    bucket that fits; stats record the padding."""
    params, cfg = detector
    S = cfg.vision.image_size
    srv = DetectorServer(params, cfg, buckets=(2, 4, 8), max_delay_ms=20,
                         top_k=8, warmup=False, autostart=False)
    futs = [srv.submit(img) for img in _rand_images(3, S, seed=1)]
    srv.start()
    for f in futs:
        f.result(timeout=120)
    st = srv.stats()
    srv.close()
    assert st["requests"] == 3
    assert st["batches"] == 1
    assert st["bucket_counts"][4] == 1  # 3 rides the 4-bucket
    assert st["padded_rows"] == 1
    assert st["latency_ms"]["n"] == 3


def test_single_request_flushes_after_delay(detector):
    """One lone request must not wait for co-riders beyond max_delay_ms."""
    params, cfg = detector
    S = cfg.vision.image_size
    with DetectorServer(params, cfg, buckets=(4,), max_delay_ms=10,
                        top_k=8, warmup=True) as srv:
        t0 = time.perf_counter()
        srv.detect(_rand_images(1, S, seed=2)[0], timeout=120)
        elapsed = time.perf_counter() - t0
    # generous bound: warmup means no compile in the timed path
    assert elapsed < 30


def test_client_resolution_rescale(detector):
    """A non-model-size image is resized for the model but boxes come back
    in ORIGINAL pixel coordinates."""
    from PIL import Image

    params, cfg = detector
    S = cfg.vision.image_size
    w, h = 200, 120
    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    with DetectorServer(params, cfg, buckets=(1,), max_delay_ms=1,
                        top_k=8, warmup=False) as srv:
        res = srv.detect(img, timeout=120)

    resized = np.asarray(Image.fromarray(img).resize((S, S), Image.BICUBIC))
    ref = _direct(params, cfg, resized[None], top_k=8)
    keep = ref["valid"][0]
    np.testing.assert_allclose(
        res["boxes"],
        ref["boxes"][0][keep] * np.array([w, h, w, h], np.float32),
        rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(res["classes"], ref["classes"][0][keep])


def test_submit_rejects_bad_shapes(detector):
    params, cfg = detector
    srv = DetectorServer(params, cfg, buckets=(1,), warmup=False,
                         autostart=False)
    with pytest.raises(ValueError):
        srv.submit(np.zeros((4, 4), np.uint8))
    with pytest.raises(ValueError):
        DetectorServer(params, cfg, buckets=(4, 2), warmup=False,
                       autostart=False)
    srv.close()


def test_http_frontend(detector):
    """POST /detect with PNG bytes -> JSON detections; /stats, /healthz."""
    from aiohttp.test_utils import TestClient, TestServer
    from PIL import Image

    params, cfg = detector
    S = cfg.vision.image_size
    img = _rand_images(1, S, seed=5)[0]
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    png = buf.getvalue()

    async def run(srv):
        app = make_app(srv, labelmap={0: "thing"})
        async with TestClient(TestServer(app)) as client:
            r = await client.get("/healthz")
            assert (await r.json())["ok"]
            r = await client.post("/detect", data=png)
            assert r.status == 200
            dets = (await r.json())["detections"]
            for d in dets:
                assert set(d) == {"box", "score", "class_id", "class_name"}
            r = await client.post("/detect", data=b"not an image")
            assert r.status == 400
            r = await client.get("/stats")
            assert (await r.json())["requests"] >= 1
            return dets

    with DetectorServer(params, cfg, buckets=(1, 2), max_delay_ms=1,
                        top_k=8, warmup=False) as srv:
        dets = asyncio.run(run(srv))
        # HTTP result must agree with the in-process path
        direct = srv.detect(img, timeout=120)
    assert len(dets) == len(direct["boxes"])


# ------------------------------------------------------- zero-shot serving


def _zs_direct(params, cfg, images, tok, queries, top_k=16):
    """Reference: forward_zero_shot + sigmoid + postprocess, one shared
    query set (the serving path computes per-image query matrices via the
    cached build_query_bank embeddings — mathematically identical)."""
    enc = tok(list(queries))
    boxes, logits = owlvit.forward_zero_shot(
        params, cfg.replace(trainable_last_k=None),
        normalize_image(jnp.asarray(images)),
        jnp.asarray(enc["input_ids"]), jnp.asarray(enc["attention_mask"]),
    )
    sims = jax.nn.sigmoid(logits)
    return jax.tree.map(np.asarray, nms_ops.postprocess(
        boxes, sims, confidence_threshold=0.01, iou_threshold=0.6,
        top_k=top_k))


def _hash_tok(cfg):
    from owlvit_tpu.data.tokenizer import HashTokenizer

    return HashTokenizer(cfg.text.vocab_size, max_len=cfg.text.max_len)


def test_zero_shot_matches_direct(detector):
    """submit(queries=...) must reproduce forward_zero_shot + postprocess:
    per-request padded query matrices + masking change nothing."""
    params, cfg = detector
    S = cfg.vision.image_size
    images = _rand_images(2, S, seed=11)
    queries = ("a red box", "a striped circle", "something else")
    tok = _hash_tok(cfg)
    ref = _zs_direct(params, cfg, images, tok, queries)

    with DetectorServer(params, cfg, buckets=(4,), max_delay_ms=20,
                        top_k=16, warmup=False, tokenizer=tok,
                        max_queries=5) as srv:
        futs = [srv.submit(img, queries=list(queries)) for img in images]
        results = [f.result(timeout=120) for f in futs]

    for i, res in enumerate(results):
        keep = ref["valid"][i]
        np.testing.assert_allclose(
            res["boxes"] / S, ref["boxes"][i][keep], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            res["scores"], ref["scores"][i][keep], rtol=1e-4, atol=1e-5)
        assert (res["classes"] == ref["classes"][i][keep]).all()
        assert res["labels"] == [queries[c] for c in res["classes"]]
    # one text encode per DISTINCT string, cached across requests
    assert len(srv._text_cache) == len(queries)


def test_mixed_bank_and_zero_shot_traffic(detector):
    """Bank and zero-shot requests ride separate batches of the same server
    and both resolve correctly."""
    params, cfg = detector
    S = cfg.vision.image_size
    images = _rand_images(4, S, seed=12)
    tok = _hash_tok(cfg)
    ref_bank = _direct(params, cfg, images[:2])
    ref_zs = _zs_direct(params, cfg, images[2:], tok, ("thing",))

    with DetectorServer(params, cfg, buckets=(2,), max_delay_ms=20,
                        top_k=16, warmup=False, tokenizer=tok,
                        max_queries=2) as srv:
        f_bank = [srv.submit(img) for img in images[:2]]
        f_zs = [srv.submit(img, queries=["thing"]) for img in images[2:]]
        r_bank = [f.result(timeout=120) for f in f_bank]
        r_zs = [f.result(timeout=120) for f in f_zs]
        st = srv.stats()

    assert st["zs_batches"] >= 1 and st["batches"] > st["zs_batches"]
    for i, res in enumerate(r_bank):
        keep = ref_bank["valid"][i]
        np.testing.assert_allclose(
            res["scores"], ref_bank["scores"][i][keep], rtol=1e-4, atol=1e-5)
        assert "labels" not in res
    for i, res in enumerate(r_zs):
        keep = ref_zs["valid"][i]
        np.testing.assert_allclose(
            res["scores"], ref_zs["scores"][i][keep], rtol=1e-4, atol=1e-5)
        assert res["labels"] == ["thing"] * len(res["classes"])


def test_zero_shot_guards(detector):
    """No tokenizer -> ValueError; too many queries -> ValueError."""
    params, cfg = detector
    S = cfg.vision.image_size
    img = _rand_images(1, S)[0]
    srv = DetectorServer(params, cfg, buckets=(1,), warmup=False,
                        autostart=False)
    with pytest.raises(ValueError, match="tokenizer"):
        srv.submit(img, queries=["x"])
    tok = _hash_tok(cfg)
    srv2 = DetectorServer(params, cfg, buckets=(1,), warmup=False,
                          autostart=False, tokenizer=tok, max_queries=2)
    with pytest.raises(ValueError, match="queries"):
        srv2.submit(img, queries=["a", "b", "c"])


def test_http_zero_shot_queries_param(detector):
    """POST /detect?queries=a,b rides the zero-shot lane; class_name comes
    from the request's own queries. Without a tokenizer the server returns
    a 400 instead of crashing."""
    from aiohttp.test_utils import TestClient, TestServer
    from PIL import Image

    params, cfg = detector
    S = cfg.vision.image_size
    img = _rand_images(1, S, seed=6)[0]
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    png = buf.getvalue()

    async def run(srv, expect_status):
        app = make_app(srv, labelmap={0: "bankthing"})
        async with TestClient(TestServer(app)) as client:
            r = await client.post("/detect?queries=a%20cat,a%20dog", data=png)
            assert r.status == expect_status
            return (await r.json()) if r.status == 200 else None

    tok = _hash_tok(cfg)
    with DetectorServer(params, cfg, buckets=(1,), max_delay_ms=1,
                        top_k=8, warmup=False, tokenizer=tok,
                        max_queries=4) as srv:
        out = asyncio.run(run(srv, 200))
    names = {d["class_name"] for d in out["detections"]}
    assert names <= {"a cat", "a dog"} and out["detections"]

    with DetectorServer(params, cfg, buckets=(1,), max_delay_ms=1,
                        top_k=8, warmup=False) as srv:  # no tokenizer
        assert asyncio.run(run(srv, 400)) is None


def test_one_shot_matches_direct(detector):
    """submit(query_image=...) must reproduce forward_one_shot + sigmoid +
    postprocess; exemplar embeddings cache by image digest."""
    params, cfg = detector
    S = cfg.vision.image_size
    images = _rand_images(2, S, seed=21)
    qimg = _rand_images(1, S, seed=22)[0]

    boxes, logits = owlvit.forward_one_shot(
        params, cfg.replace(trainable_last_k=None),
        normalize_image(jnp.asarray(images)),
        normalize_image(jnp.asarray(np.stack([qimg, qimg]))),
    )
    ref = jax.tree.map(np.asarray, nms_ops.postprocess(
        boxes, jax.nn.sigmoid(logits), confidence_threshold=0.01,
        iou_threshold=0.6, top_k=16))

    with DetectorServer(params, cfg, buckets=(2,), max_delay_ms=20,
                        top_k=16, warmup=False, one_shot=True) as srv:
        futs = [srv.submit(img, query_image=qimg) for img in images]
        results = [f.result(timeout=120) for f in futs]

    for i, res in enumerate(results):
        keep = ref["valid"][i]
        np.testing.assert_allclose(
            res["boxes"] / S, ref["boxes"][i][keep], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            res["scores"], ref["scores"][i][keep], rtol=1e-4, atol=1e-5)
        assert res["labels"] == ["query-object"] * len(res["classes"])
    assert len(srv._qimg_cache) == 1  # same exemplar -> one device embed


def test_one_shot_guards(detector):
    """query_image without one_shot=True -> ValueError; queries+query_image
    together -> ValueError."""
    params, cfg = detector
    S = cfg.vision.image_size
    img = _rand_images(1, S)[0]
    srv = DetectorServer(params, cfg, buckets=(1,), warmup=False,
                         autostart=False)
    with pytest.raises(ValueError, match="one_shot"):
        srv.submit(img, query_image=img)
    tok = _hash_tok(cfg)
    srv2 = DetectorServer(params, cfg, buckets=(1,), warmup=False,
                          autostart=False, tokenizer=tok, one_shot=True)
    with pytest.raises(ValueError, match="not both"):
        srv2.submit(img, queries=["x"], query_image=img)


def test_http_one_shot_multipart(detector):
    """Multipart POST /detect with image + query_image rides the one-shot
    lane; class_name is query-object."""
    import aiohttp
    from aiohttp.test_utils import TestClient, TestServer
    from PIL import Image

    params, cfg = detector
    S = cfg.vision.image_size

    def png(arr):
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        return buf.getvalue()

    img, qimg = _rand_images(2, S, seed=23)

    async def run(srv):
        app = make_app(srv, labelmap={0: "bankthing"})
        async with TestClient(TestServer(app)) as client:
            form = aiohttp.FormData()
            form.add_field("image", png(img), filename="i.png",
                           content_type="image/png")
            form.add_field("query_image", png(qimg), filename="q.png",
                           content_type="image/png")
            r = await client.post("/detect", data=form)
            assert r.status == 200
            return (await r.json())["detections"]

    with DetectorServer(params, cfg, buckets=(1,), max_delay_ms=1,
                        top_k=8, warmup=False, one_shot=True) as srv:
        dets = asyncio.run(run(srv))
    assert dets and all(d["class_name"] == "query-object" for d in dets)


def test_dispatch_failure_fails_futures(detector):
    """A device/compile failure inside dispatch must reach the waiting
    clients as an exception — never a hung future."""
    params, cfg = detector
    S = cfg.vision.image_size
    img = _rand_images(1, S)[0]
    with DetectorServer(params, cfg, buckets=(1,), max_delay_ms=1,
                        top_k=8, warmup=True) as srv:
        def boom(p, x):
            raise RuntimeError("injected device fault")

        srv._serve = boom
        fut = srv.submit(img)
        with pytest.raises(RuntimeError, match="injected device fault"):
            fut.result(timeout=30)


def test_fetch_failure_fails_futures(detector):
    """An async-dispatched device failure surfaces at the blocking fetch
    (now on the dispatch thread, _fetch_one) — it must fail that batch's
    futures, and the server must keep serving afterwards."""
    params, cfg = detector
    S = cfg.vision.image_size
    img = _rand_images(1, S)[0]

    class _Poisoned:
        def __array__(self, *a, **kw):
            raise RuntimeError("injected fetch fault")

    with DetectorServer(params, cfg, buckets=(1,), max_delay_ms=1,
                        top_k=8, warmup=True) as srv:
        real_serve = srv._serve
        srv._serve = lambda p, x: _Poisoned()
        fut = srv.submit(img)
        with pytest.raises(RuntimeError, match="injected fetch fault"):
            fut.result(timeout=30)
        srv._serve = real_serve
        ok = srv.submit(img).result(timeout=60)  # server survived the fault
        assert "boxes" in ok


def test_cancelled_future_does_not_kill_server(detector):
    """A disconnected client cancels its future (the HTTP frontend wraps it
    in asyncio); set_result/set_exception on it raises InvalidStateError.
    Neither the completion thread nor the dispatch thread may die — with
    _done_q bounded, a dead completion loop back-pressures _fetch and wedges
    dispatch (= the whole server)."""
    params, cfg = detector
    S = cfg.vision.image_size
    imgs = _rand_images(4, S)
    with DetectorServer(params, cfg, buckets=(1,), max_delay_ms=1,
                        top_k=8, warmup=True, max_inflight=1) as srv:
        # cancel more batches than _done_q can hold (maxsize=1): if the
        # completion thread died on the first InvalidStateError, the queue
        # fills and dispatch wedges before the live request below
        for img in imgs[:3]:
            srv.submit(img).cancel()
        # the exception path too: a cancelled future + injected fault
        real_serve = srv._serve
        srv._serve = lambda p, x: (_ for _ in ()).throw(
            RuntimeError("injected"))
        srv.submit(imgs[3]).cancel()
        srv._serve = real_serve
        ok = srv.submit(imgs[0]).result(timeout=60)
        assert "boxes" in ok  # both threads survived


def test_text_and_image_queries_share_a_batch(detector):
    """A zero-shot request and a one-shot request ride the SAME
    query-conditioned batch (per-request qemb rows), each resolving to its
    own reference output."""
    params, cfg = detector
    S = cfg.vision.image_size
    images = _rand_images(2, S, seed=31)
    qimg = _rand_images(1, S, seed=32)[0]
    tok = _hash_tok(cfg)

    ref_zs = _zs_direct(params, cfg, images[:1], tok, ("a widget",))
    boxes, logits = owlvit.forward_one_shot(
        params, cfg.replace(trainable_last_k=None),
        normalize_image(jnp.asarray(images[1:])),
        normalize_image(jnp.asarray(qimg[None])),
    )
    ref_os = jax.tree.map(np.asarray, nms_ops.postprocess(
        boxes, jax.nn.sigmoid(logits), confidence_threshold=0.01,
        iou_threshold=0.6, top_k=16))

    with DetectorServer(params, cfg, buckets=(2,), max_delay_ms=200,
                        top_k=16, warmup=False, tokenizer=tok,
                        one_shot=True, max_queries=2) as srv:
        f0 = srv.submit(images[0], queries=["a widget"])
        f1 = srv.submit(images[1], query_image=qimg)
        r0, r1 = f0.result(timeout=120), f1.result(timeout=120)
        st = srv.stats()

    assert st["batches"] == 1 and st["zs_batches"] == 1  # ONE shared batch
    keep = ref_zs["valid"][0]
    np.testing.assert_allclose(r0["scores"], ref_zs["scores"][0][keep],
                               rtol=1e-4, atol=1e-5)
    assert r0["labels"] == ["a widget"] * len(r0["classes"])
    keep = ref_os["valid"][0]
    np.testing.assert_allclose(r1["scores"], ref_os["scores"][0][keep],
                               rtol=1e-4, atol=1e-5)
    assert r1["labels"] == ["query-object"] * len(r1["classes"])


def test_mesh_sharded_serving(detector):
    """SPMD serving on a data mesh returns the same detections as the
    single-device server (params replicated, batches sharded)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices (virtual CPU mesh)")
    from jax.sharding import Mesh

    params, cfg = detector
    S = cfg.vision.image_size
    images = _rand_images(3, S, seed=41)  # 3 real rows + 1 pad row
    ref = _direct(params, cfg, images)

    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    with DetectorServer(params, cfg, buckets=(4,), max_delay_ms=50,
                        top_k=16, warmup=False, mesh=mesh) as srv:
        futs = [srv.submit(img) for img in images]
        results = [f.result(timeout=120) for f in futs]

    for i, res in enumerate(results):
        keep = ref["valid"][i]
        np.testing.assert_allclose(
            res["boxes"] / S, ref["boxes"][i][keep], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            res["scores"], ref["scores"][i][keep], rtol=1e-4, atol=1e-5)
        assert (res["classes"] == ref["classes"][i][keep]).all()

    with pytest.raises(ValueError, match="divide"):
        DetectorServer(params, cfg, buckets=(3,), warmup=False,
                       autostart=False, mesh=mesh)


def test_overload_shedding(detector):
    """submit() sheds with ServerOverloaded at max_queue instead of growing
    the queue without bound."""
    from owlvit_tpu.serve import ServerOverloaded

    params, cfg = detector
    S = cfg.vision.image_size
    img = _rand_images(1, S)[0]
    srv = DetectorServer(params, cfg, buckets=(1,), warmup=False,
                         autostart=False, max_queue=2)
    srv.submit(img)
    srv.submit(img)
    with pytest.raises(ServerOverloaded, match="max_queue"):
        srv.submit(img)


def test_backlog_forms_full_batches(detector):
    """Under a backlog, dispatch must drain the queue greedily and form
    full buckets. Regression: every queued request is already past its
    delay window, so without the greedy drain the deadline branch shipped
    batch=1 per request (observed on chip: a 640-request flood ran as 640
    single-row batches at 0.65 img/s)."""
    params, cfg = detector
    S = cfg.vision.image_size
    images = _rand_images(16, S, seed=7)
    with DetectorServer(params, cfg, buckets=(4,), max_delay_ms=0,
                        top_k=8, warmup=True) as srv:
        futs = [srv.submit(img) for img in images]
        for f in futs:
            f.result(timeout=60)
        st = srv.stats()
    # greedy drain: at most a couple of leading partial batches while the
    # client is still enqueueing, full 4-buckets after (16 batches = bug)
    assert st["batches"] <= 8, st
    assert st["requests"] == 16


def test_bulk_detect_matches_online(detector):
    """bulk_detect (fetch-deferred batches, device-resident results, one
    trailing fetch pass) must return exactly what the online path returns
    for the same images — same executables, different fetch schedule."""
    params, cfg = detector
    S = cfg.vision.image_size
    images = _rand_images(5, S, seed=21)
    with DetectorServer(params, cfg, buckets=(2,), max_delay_ms=5,
                        top_k=16, warmup=False) as srv:
        online = [srv.detect(img, timeout=120) for img in images]
        bulk = srv.bulk_detect(list(images))
        st = srv.stats()

    assert len(bulk) == 5
    for o, b in zip(online, bulk):
        np.testing.assert_array_equal(o["boxes"], b["boxes"])
        np.testing.assert_array_equal(o["scores"], b["scores"])
        np.testing.assert_array_equal(o["classes"], b["classes"])
        assert "labels" not in b
    # 5 images at bucket 2 -> 3 batches (last padded); accounting recorded
    assert st["bulk"]["jobs"] == 1
    assert st["bulk"]["images"] == 5
    assert st["bulk"]["batches"] == 3
    assert len(st["bulk"]["last_put_series_ms"]) == 3


def test_bulk_detect_zero_shot_matches_direct(detector):
    """Job-shared free-text queries: device-resident embeddings (no host
    text cache) must reproduce the direct zero-shot forward."""
    params, cfg = detector
    S = cfg.vision.image_size
    images = _rand_images(3, S, seed=22)
    queries = ("a red box", "a striped circle")
    tok = _hash_tok(cfg)
    ref = _zs_direct(params, cfg, images, tok, queries)

    with DetectorServer(params, cfg, buckets=(4,), max_delay_ms=5,
                        top_k=16, warmup=False, tokenizer=tok,
                        max_queries=3) as srv:
        bulk = srv.bulk_detect(list(images), queries=list(queries))
        # deliberately bypasses the host text cache (a cache fill would
        # fetch mid-job and end fast-put mode on the relay)
        assert len(srv._text_cache) == 0

    for i, res in enumerate(bulk):
        keep = ref["valid"][i]
        np.testing.assert_allclose(
            res["boxes"] / S, ref["boxes"][i][keep], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            res["scores"], ref["scores"][i][keep], rtol=1e-4, atol=1e-5)
        assert (res["classes"] == ref["classes"][i][keep]).all()
        assert res["labels"] == [queries[c] for c in res["classes"]]


def test_bulk_detect_stage_first_matches(detector):
    """stage_first (all puts before any exec) is a pure reordering — the
    results must be identical to the default interleaved schedule, for
    both the bank and job-shared-queries lanes."""
    params, cfg = detector
    S = cfg.vision.image_size
    images = _rand_images(5, S, seed=23)
    tok = _hash_tok(cfg)
    with DetectorServer(params, cfg, buckets=(2,), max_delay_ms=5,
                        top_k=16, warmup=False, autostart=False,
                        tokenizer=tok, max_queries=2) as srv:
        plain = srv.bulk_detect(list(images))
        staged = srv.bulk_detect(list(images), stage_first=True)
        zs_plain = srv.bulk_detect(list(images), queries=["thing"])
        zs_staged = srv.bulk_detect(list(images), queries=["thing"],
                                    stage_first=True)
        st = srv.stats()
    for a, b in zip(plain + zs_plain, staged + zs_staged):
        np.testing.assert_array_equal(a["boxes"], b["boxes"])
        np.testing.assert_array_equal(a["scores"], b["scores"])
        np.testing.assert_array_equal(a["classes"], b["classes"])
    assert st["bulk"]["last_stage_first"] is True


def test_bulk_detect_prestaged_matches(detector):
    """stage_bulk_images + bulk_detect(prestaged=...) — the cli bulk-infer
    shape, where pixels are staged BEFORE the query bank/model compiles —
    is a pure reordering: identical results to passing images directly,
    on both lanes; put accounting carries the pre-stage timings."""
    from owlvit_tpu.serve import stage_bulk_images

    params, cfg = detector
    S = cfg.vision.image_size
    images = _rand_images(5, S, seed=29)
    tok = _hash_tok(cfg)
    with DetectorServer(params, cfg, buckets=(2,), max_delay_ms=5,
                        top_k=16, warmup=False, autostart=False,
                        tokenizer=tok, max_queries=2) as srv:
        plain = srv.bulk_detect(list(images))
        pre = stage_bulk_images(list(images), S, 2)
        assert pre["n"] == 5 and len(pre["staged"]) == 3
        staged = srv.bulk_detect(prestaged=pre)
        assert pre["staged"] == []  # inputs freed as the job consumed them
        pre_zs = stage_bulk_images(list(images), S, 2)
        zs_plain = srv.bulk_detect(list(images), queries=["thing"])
        zs_staged = srv.bulk_detect(prestaged=pre_zs, queries=["thing"])
        st = srv.stats()
    for a, b in zip(plain + zs_plain, staged + zs_staged):
        np.testing.assert_array_equal(a["boxes"], b["boxes"])
        np.testing.assert_array_equal(a["scores"], b["scores"])
        np.testing.assert_array_equal(a["classes"], b["classes"])
    assert st["bulk"]["last_stage_first"] == "prestaged"


def test_bulk_detect_guards(detector):
    """Empty job -> []; queries without a tokenizer -> ValueError."""
    params, cfg = detector
    srv = DetectorServer(params, cfg, buckets=(1,), warmup=False,
                         autostart=False)
    assert srv.bulk_detect([]) == []
    S = cfg.vision.image_size
    with pytest.raises(ValueError, match="tokenizer"):
        srv.bulk_detect([_rand_images(1, S)[0]], queries=["thing"])


def test_bulk_detect_prestaged_guards(detector):
    """prestaged is mutually exclusive with images and must match the
    server's bucket/image size."""
    from owlvit_tpu.serve import stage_bulk_images

    params, cfg = detector
    S = cfg.vision.image_size
    imgs = list(_rand_images(2, S))
    srv = DetectorServer(params, cfg, buckets=(1,), warmup=False,
                         autostart=False)
    pre = stage_bulk_images(imgs, S, 1)
    with pytest.raises(ValueError, match="not both"):
        srv.bulk_detect(imgs, prestaged=pre)
    wrong_bucket = stage_bulk_images(imgs, S, 2)
    with pytest.raises(ValueError, match="bucket"):
        srv.bulk_detect(prestaged=wrong_bucket)
    assert srv.bulk_detect(prestaged=stage_bulk_images([], S, 1)) == []


def test_submit_after_close_raises(detector):
    """A closed server must refuse new work (instead of stranding a future
    the exited dispatch loop will never resolve), and any request that
    raced into the queue behind the close sentinel gets FAILED, not hung."""
    params, cfg = detector
    S = cfg.vision.image_size
    img = _rand_images(1, S)[0]
    srv = DetectorServer(params, cfg, buckets=(1,), max_delay_ms=1,
                         top_k=8, warmup=False)
    srv.close()
    with pytest.raises(RuntimeError, match="closed"):
        srv.submit(img)
    # simulate the race: a request that slipped in while close() ran
    from owlvit_tpu.serve import _Request
    req = _Request(img, (S, S))
    srv._q.put(req)
    srv.close()  # second close drains and fails stragglers
    with pytest.raises(RuntimeError, match="closed"):
        req.future.result(timeout=5)


def test_text_cache_bounded(detector):
    """The zero-shot text cache evicts FIFO at _cache_cap — unbounded
    distinct-query traffic must not grow host memory forever."""
    params, cfg = detector
    srv = DetectorServer(params, cfg, buckets=(1,), warmup=False,
                         autostart=False, tokenizer=_hash_tok(cfg))
    srv._cache_cap = 4
    for i in range(10):
        srv._embed_queries((f"query {i}",))
    assert len(srv._text_cache) == 4
    assert "query 9" in srv._text_cache and "query 0" not in srv._text_cache


def test_empty_buckets_rejected(detector):
    params, cfg = detector
    with pytest.raises(ValueError, match="buckets"):
        DetectorServer(params, cfg, buckets=())


def test_bulk_detect_no_input_raises(detector):
    params, cfg = detector
    srv = DetectorServer(params, cfg, buckets=(1,), warmup=False,
                         autostart=False)
    with pytest.raises(ValueError, match="images or prestaged"):
        srv.bulk_detect(queries=None)
