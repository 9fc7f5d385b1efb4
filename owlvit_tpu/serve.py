"""Production serving: dynamic request batching onto fixed XLA shapes.

The reference has no deployment story at all (SURVEY §5.4: the fine-tuned
model is never even saved — /root/reference/main.py has no torch.save). This
module is the TPU-native serving layer on top of the exported/ckpt detector:

  * **Static shapes, dynamic traffic.** XLA compiles one executable per input
    shape, so requests are batched onto a small ladder of compiled batch
    sizes ("buckets"); a partial batch is zero-padded up to the smallest
    bucket that fits. Every image is independent in the forward pass (conv,
    per-token LN, within-image attention), so pad rows cost FLOPs but cannot
    perturb real rows — their outputs are simply dropped.
  * **Single device owner, strictly serial relay usage.** JAX is
    single-controller: exactly one dispatcher thread touches the device, and
    it never overlaps a transfer with an in-flight execution. Measured on
    the TPU relay (tools/tpu_transfer_probe.py r4 concurrency cases): an H2D
    issued while an exec is in flight takes ~3.7 s vs 39 ms idle (~100x),
    and a D2H next to a blocked fetch ~5 s vs 29 ms — so the classic
    "overlap host transfers with device compute" pipeline is a pessimization
    here. Each batch runs put -> exec -> block -> fetch serially; only
    host-only work overlaps (request assembly on the dispatcher, result
    postprocessing + future fan-out on the completion thread, which makes
    no JAX calls at all).
  * **Latency/throughput knob.** `max_delay_ms` bounds how long the first
    request of a batch waits for co-riders (classic dynamic-batching window).
  * **Flat wire format.** Transfers happen in device (tiled) layout, so a
    trailing dim of 3/4/7 pads its lane dimension to 128 on the wire — a
    [B, S, S, 3] uint8 batch inflates ~42x. Images therefore cross
    host->device as flat [B, S*S*3] uint8 (reshaped on device) and all
    detection outputs come back in ONE flat [B, K*7] f32 fetch (three
    separate fetches each pay a relay round trip).

Thresholds (confidence/IoU/top_k) are compiled constants of the serving
graph — per-request thresholds would force a retrace; filter client-side on
the returned scores instead. The server serves the trained query bank
(fixed class set) by default; with a `tokenizer`, requests may instead carry
their own free-text queries (zero-shot serving): each distinct string is
text-encoded once and cached, per-image query matrices are padded to a
static [max_queries, proj] block, and zero-shot requests batch together on
a second lane of compiled executables.
"""

from __future__ import annotations

import os
import queue
import threading
import time
from collections import deque
from concurrent.futures import Future
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from owlvit_tpu.models import owlvit
from owlvit_tpu.models.configs import OwlViTConfig
from owlvit_tpu.ops import nms as nms_ops
from owlvit_tpu.ops.preprocess import normalize_image


class ServerOverloaded(RuntimeError):
    """Raised by submit() when the request queue is at max_queue."""


@dataclass
class _Request:
    image: np.ndarray  # [S, S, 3] uint8, already model-sized
    orig_wh: tuple  # (w, h) of the client image, for box rescale
    queries: tuple | None = None  # zero-shot: free-text conditioning
    qimage: np.ndarray | None = None  # one-shot: exemplar image, model-sized
    qdigest: str | None = None  # cache key for the exemplar's embedding
    future: Future = field(default_factory=Future)
    t_enqueue: float = field(default_factory=time.perf_counter)

    @property
    def conditioned(self) -> bool:
        """True when the request rides the query-conditioned lane."""
        return self.queries is not None or self.qimage is not None


def _size_to_model(image: np.ndarray, S: int, what: str = "image") -> np.ndarray:
    """Validate + bicubic-resize one RGB uint8 image to the model's square
    input (the reference's preprocessing protocol — HF image_processing_owlvit
    square resize, no aspect preservation)."""
    if image.ndim != 3 or image.shape[-1] != 3:
        raise ValueError(f"expected [H, W, 3] RGB {what}, got {image.shape}")
    if image.shape[:2] != (S, S):
        from PIL import Image

        image = np.asarray(
            Image.fromarray(np.ascontiguousarray(image, np.uint8))
            .resize((S, S), Image.BICUBIC), np.uint8,
        )
    return np.ascontiguousarray(image, np.uint8)


def _flatten_bucket(chunk, bucket: int, S: int) -> np.ndarray:
    """Pack <=bucket model-sized images into ONE flat [bucket, S*S*3] uint8
    block (zero-padded) — the unpadded relay wire format. The single
    implementation behind both bulk_detect's in-job assembly and
    stage_bulk_images' pre-staging, so the layouts can never diverge."""
    flat = np.zeros((bucket, S * S * 3), np.uint8)
    for i, im in enumerate(chunk):
        flat[i] = im.reshape(-1)
    return flat


def stage_bulk_images(images, image_size: int, bucket: int,
                      orig_whs=None) -> dict:
    """Pre-stage a bulk job's pixels device-resident while the process is
    PRISTINE — i.e. before ANYTHING compiles, executes a big graph, or
    fetches. On the TPU relay the first remote compile alone drops H2D puts
    from ~1.4 GB/s to ~90 MB/s and the first fetch deepens them to
    ~10-30 MB/s permanently (BENCH.md r5c/r5e), so a CLI/offline job must
    order: decode -> stage_bulk_images -> build params/query bank (the
    compiles) -> DetectorServer.bulk_detect(prestaged=...). Single-device
    puts (mesh servers re-shard at exec; bulk_detect rejects prestaged
    input on a mesh server).

    Returns an opaque dict for `bulk_detect(prestaged=...)`: flat
    [bucket, S*S*3] uint8 device batches (each put settled before the next
    RPC — the r4d degraded-put discipline), original (w, h) per image, and
    put timings for the job's stats.

    orig_whs: optional [(w, h), ...] of the ORIGINAL images, for callers
    that decoded+resized to model size upstream (e.g. cli bulk-infer's
    threaded native decode) — box rescale then uses the real source sizes
    instead of the already-resized shapes."""
    images = list(images)
    S, bucket = int(image_size), int(bucket)
    if orig_whs is not None and len(orig_whs) != len(images):
        raise ValueError(
            f"orig_whs has {len(orig_whs)} entries for {len(images)} images"
        )
    sized, whs = [], []
    for j, im in enumerate(images):
        h, w = im.shape[:2] if im.ndim == 3 else (0, 0)
        sized.append(_size_to_model(im, S, "image"))
        whs.append(tuple(orig_whs[j]) if orig_whs is not None else (w, h))
    put_s, series, staged = 0.0, [], []
    for lo in range(0, len(sized), bucket):
        flat = _flatten_bucket(sized[lo : lo + bucket], bucket, S)
        t0 = time.perf_counter()
        staged.append(jax.block_until_ready(jnp.asarray(flat)))
        dt = time.perf_counter() - t0
        put_s += dt
        if len(series) < 512:
            series.append(round(dt * 1e3, 1))
    return {
        "staged": staged, "whs": whs, "n": len(sized),
        "bucket": bucket, "image_size": S,
        "put_secs": put_s, "put_series_ms": series,
    }


def _fail_futures(batch, e: Exception) -> None:
    """set_exception on every request, tolerating already-cancelled futures
    (a disconnected client cancels its future; set_exception then raises
    InvalidStateError — which must never kill the dispatch/completion
    threads: with _done_q bounded, a dead thread wedges the pipeline)."""
    for req in batch:
        try:
            req.future.set_exception(e)
        except Exception:  # noqa: BLE001 — cancelled/already-resolved
            continue


class DetectorServer:
    """Dynamically batched detection server over a jitted forward+NMS graph.

    Parameters
    ----------
    params, cfg : the detector pytree + model config (as from
        `train.state.combine_params` or `models.convert.load_params`).
    buckets : ascending compiled batch sizes. Keep this list short on real
        TPUs — each bucket is a separate XLA executable (remote compiles are
        minutes-expensive on the relay; see BENCH.md).
    max_delay_ms : how long the first request of a batch waits for more
        traffic before dispatching a partial (padded) batch.
    confidence_threshold, iou_threshold, top_k : decode protocol, compiled in
        (reference protocol: 0.01 / 0.6 / 200 — config.yaml:13-14,
        main.py:116-118).
    warmup : compile every bucket at startup (recommended: first-request
        latency otherwise includes a full XLA compile).
    autostart : start the dispatcher/completion threads immediately. Tests
        pass False to enqueue a deterministic batch before starting.
    tokenizer : optional text tokenizer (data.tokenizer.CLIPTokenizer);
        enables `submit(image, queries=[...])` zero-shot serving. Doubles
        the warmup compiles (one zero-shot executable per bucket).
    max_queries : static per-request query capacity of the zero-shot
        executables (requests are padded+masked up to it).
    one_shot : enable `submit(image, query_image=...)` image-guided
        detection (exemplar embeddings cached by image digest; rides the
        query-conditioned lane with one query slot).
    mesh : optional `jax.sharding.Mesh` with a "data" axis — SPMD serving:
        batches shard over the axis, params replicate, GSPMD runs each
        bucket across all devices (buckets must divide the axis size).
    max_queue : admission bound — `submit` raises `ServerOverloaded` once
        this many requests are already waiting (the HTTP frontend maps it
        to 503), so a flood degrades by shedding instead of by unbounded
        queue growth and latency collapse.
    """

    def __init__(
        self,
        params: dict,
        cfg: OwlViTConfig,
        *,
        buckets: tuple = (1, 8, 32),
        max_delay_ms: float = 5.0,
        confidence_threshold: float = 0.01,
        iou_threshold: float = 0.6,
        top_k: int = 200,
        warmup: bool = True,
        autostart: bool = True,
        max_inflight: int = 2,
        tokenizer=None,
        max_queries: int = 8,
        one_shot: bool = False,
        mesh=None,
        max_queue: int = 1024,
    ):
        if (not buckets or list(buckets) != sorted(set(buckets))
                or buckets[0] < 1):
            raise ValueError(f"buckets must be ascending unique >=1: {buckets}")
        # serving = pure fwd. k=0 (not None): the all-frozen path runs the
        # whole encoder under stop_gradient, which licenses the fwd-only
        # kernel modes — numerics identical to the k=None branch. A serving
        # process never builds a grad graph, so it is the proven-safe surface
        # for the static-max softmax (+10.9% serving throughput on chip,
        # BENCH.md r4; faults grad-bearing processes — r4c/r4d).
        # OWLVIT_STATIC_MAX=off still disables the shift inside the kernel.
        self.cfg = cfg.replace(trainable_last_k=0, static_softmax=True)
        self.buckets = tuple(int(b) for b in buckets)
        self.max_delay_s = max_delay_ms / 1e3
        self.image_size = cfg.vision.image_size
        # SPMD serving: on a jax.sharding.Mesh (axis "data"), every batch is
        # sharded over the data axis and params are replicated — GSPMD runs
        # each bucket executable across all devices (per-image independence
        # means zero cross-device collectives in the forward). Buckets must
        # divide the data-axis size so pad rows shard evenly.
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            nd = mesh.shape["data"]
            bad = [b for b in self.buckets if b % nd]
            if bad:
                raise ValueError(
                    f"buckets {bad} do not divide the mesh data axis ({nd})"
                )
            self._shard_batch = lambda nd_: NamedSharding(  # noqa: E731
                mesh, PartitionSpec("data", *([None] * (nd_ - 1)))
            )
            repl = NamedSharding(mesh, PartitionSpec())
            # settle the param-tree put before any later relay RPC (the
            # degraded-put-mode discipline — see _warmup)
            self._params = jax.block_until_ready(jax.device_put(params, repl))
            self._put = lambda a: jax.device_put(  # noqa: E731
                a, self._shard_batch(a.ndim)
            )
        else:
            self._params = jax.block_until_ready(jax.device_put(params))
            self._put = jnp.asarray

        def _serve(p, images_flat_u8):
            # Wire format: images arrive FLAT [B, S*S*3] and detections leave
            # FLAT [B, K*7]. The relay transfers arrays in device (tiled)
            # layout, so a trailing dim of 3 or 4 pads its lane dimension to
            # 128 — a [B, 768, 768, 3] uint8 batch inflates ~42x on the wire
            # (the 4-D wire measured ~2 s/batch for 56.6 MB vs the probed
            # 1.6 GB/s flat link; tools/tpu_transfer_probe.py isolates it).
            # Flat 2-D buffers keep the lane dim large -> no padding; the
            # reshape below is a device-side relayout fused into the
            # normalize/convert.
            b = images_flat_u8.shape[0]
            images_u8 = images_flat_u8.reshape(b, S, S, 3)
            boxes, sims = owlvit.forward_train(p, self.cfg,
                                               normalize_image(images_u8))
            out = nms_ops.postprocess(
                boxes, sims, confidence_threshold=confidence_threshold,
                iou_threshold=iou_threshold, top_k=top_k,
            )
            # One packed f32 tensor -> ONE device->host fetch per batch
            # (three separate fetches each pay a full relay round trip).
            # the shared [B, K, 7] pack (ops/nms.py::pack_detections)
            return nms_ops.pack_detections(out).reshape(b, -1)

        S = self.image_size
        self._top_k = top_k
        self._serve = jax.jit(_serve)

        # --- query-conditioned serving (zero-shot text / one-shot image) --
        # Requests may carry their own query strings (open-vocabulary
        # detection, OWL-ViT's native mode — HF modeling_owlvit.py:1560+) or
        # an exemplar image (image-guided detection, :1425+).
        # Per-image query matrices batch cleanly: the class head is
        # logits[b] = f(feats[b], qemb[b]) (einsum bpd,bqd->bpq), so every
        # request in a batch conditions on its OWN padded [max_queries, proj]
        # block with a mask — text and image queries share one lane of
        # compiled executables (class_predictor normalizes both). Text
        # embeddings are encoded once per distinct string, exemplar
        # embeddings once per distinct image digest (host caches).
        self._tok = tokenizer
        self._one_shot = bool(one_shot)
        self._max_queries = int(max_queries)
        # Bounded host caches (FIFO eviction): open HTTP traffic can send an
        # unbounded stream of DISTINCT query strings / exemplar digests, and
        # an uncapped dict would grow host memory forever — the same
        # unbounded-growth class max_queue exists to prevent. 4096 entries
        # ≈ a few MB; steady query sets stay fully cached.
        self._text_cache: dict = {}
        self._qimg_cache: dict = {}
        self._cache_cap = 4096
        self._serve_zs = None
        if tokenizer is not None or one_shot:
            proj = cfg.projection_dim

            def _encode(p, ids, mask):
                return owlvit.build_query_bank(p, self.cfg, ids, mask)

            self._encode_text = jax.jit(_encode)

            def _embed_qimage(p, qflat_u8):
                qpx = normalize_image(qflat_u8.reshape(1, S, S, 3))
                emb, _, _ = owlvit.embed_image_query(p, self.cfg, qpx)
                return emb[0]  # [proj], un-normalized (class head normalizes)

            self._embed_qimage = jax.jit(_embed_qimage)

            def _serve_zs(p, images_flat_u8, qemb, qmask):
                b = images_flat_u8.shape[0]
                images_u8 = images_flat_u8.reshape(b, S, S, 3)
                feats = owlvit.image_embedder(
                    p, self.cfg, normalize_image(images_u8)
                )
                boxes = owlvit.box_predictor(p, self.cfg, feats)
                logits = owlvit.class_predictor(p, self.cfg, feats, qemb, qmask)
                sims = jax.nn.sigmoid(logits)  # HF decode protocol
                out = nms_ops.postprocess(
                    boxes, sims, confidence_threshold=confidence_threshold,
                    iou_threshold=iou_threshold, top_k=top_k,
                )
                return nms_ops.pack_detections(out).reshape(b, -1)

            self._serve_zs = jax.jit(_serve_zs)
            self._proj = proj
        # OWLVIT_SERVE_PHASES=1: time assemble/H2D/exec/fetch per batch
        # (synchronizes between phases — diagnosis only, disables pipelining).
        self._debug_phases = os.environ.get("OWLVIT_SERVE_PHASES") == "1"
        self._q: queue.Queue = queue.Queue()
        self._max_queue = int(max_queue)
        # max_inflight bounds the fetched-but-unresolved batches handed to
        # the completion thread (ADVICE r4: unbounded, a slow completion
        # thread — client callbacks run in its future.set_result — would
        # accumulate fetched numpy batches without limit; a small maxsize
        # backpressures the dispatch thread instead, which is harmless
        # host-side). The strictly-serial relay protocol still keeps at most
        # ONE batch on the device.
        self._max_inflight = max(1, int(max_inflight))
        # fetched numpy results -> completion thread (pure host postproc)
        self._done_q: queue.Queue = queue.Queue(maxsize=self._max_inflight)
        self._lock = threading.Lock()
        self._stats = {
            "requests": 0, "batches": 0, "zs_batches": 0, "padded_rows": 0,
            "bucket_counts": {b: 0 for b in self.buckets},
        }
        if self._debug_phases:
            self._stats["phase_secs"] = {
                "assemble": 0.0, "h2d": 0.0, "exec": 0.0, "fetch": 0.0,
            }
            # per-batch H2D series (ms, first 256 batches): the relay
            # degrades puts after ~800 MB cumulative per process (BENCH.md
            # r5b), so a flood's put cost is fast->cliff, invisible in sums
            self._stats["h2d_series_ms"] = []
        self._latency = deque(maxlen=10_000)  # seconds, submit -> result
        # One lock serializes ALL relay RPCs between the dispatch thread and
        # bulk_detect callers. Granularity is per device PHASE: a bulk job's
        # exec and fetch passes release it between batches (online traffic
        # interleaves there), but its stage_first put loop is ONE critical
        # section — interleaved online work fetches, and any fetch mid-
        # staging would flip the process out of fast-put mode and defeat
        # the staging entirely (see bulk_detect's docstring).
        self._relay_lock = threading.Lock()
        self._stop = threading.Event()
        self._threads: list = []
        if warmup:
            self._warmup()
        if autostart:
            self.start()

    # ------------------------------------------------------------- lifecycle

    def _warmup(self):
        # Every put is settled (block_until_ready) BEFORE the next relay RPC
        # is issued — dispatching an exec on a still-in-flight put is the
        # suspected trigger that flips the process into permanent
        # degraded-PUT mode (~9.4 MB/s vs 1.4 GB/s; BENCH.md r4d put-state
        # probe — a freshly-WARMED server already showed ~40x degraded puts
        # in r4c, implicating exactly this path).
        S = self.image_size
        for b in self.buckets:
            z = jax.block_until_ready(self._put(np.zeros((b, S * S * 3), np.uint8)))
            jax.block_until_ready(self._serve(self._params, z))
            if self._serve_zs is not None:
                qe = jax.block_until_ready(self._put(
                    np.zeros((b, self._max_queries, self._proj), np.float32)))
                qm = jax.block_until_ready(
                    self._put(np.zeros((b, self._max_queries), np.int32)))
                jax.block_until_ready(self._serve_zs(self._params, z, qe, qm))
        if self._one_shot:
            zq = jax.block_until_ready(jnp.zeros((1, S * S * 3), jnp.uint8))
            jax.block_until_ready(self._embed_qimage(self._params, zq))

    def start(self):
        if self._threads:
            return
        for fn, name in [(self._dispatch_loop, "owlvit-serve-dispatch"),
                         (self._complete_loop, "owlvit-serve-complete")]:
            t = threading.Thread(target=fn, name=name, daemon=True)
            t.start()
            self._threads.append(t)

    def close(self):
        self._stop.set()
        self._q.put(None)  # wake the dispatcher
        for t in self._threads:
            t.join(timeout=30)
        self._threads = []
        # Fail any request that raced past the submit() closed-check into
        # the queue after the None sentinel — its future would otherwise
        # hang the client forever (the dispatch loop has exited).
        stranded = []
        try:
            while True:
                item = self._q.get_nowait()
                if item is not None:
                    stranded.append(item)
        except queue.Empty:
            pass
        if stranded:
            _fail_futures(stranded, RuntimeError("DetectorServer closed"))

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # --------------------------------------------------------------- clients

    def _model_sized(self, image: np.ndarray, what: str) -> np.ndarray:
        return _size_to_model(image, self.image_size, what)

    def _cache_put(self, cache: dict, key, value) -> None:
        """Insert with FIFO eviction at _cache_cap (dicts iterate in
        insertion order). Steady traffic over a fixed query/exemplar set
        never evicts; an adversarial stream of distinct keys stays bounded."""
        if len(cache) >= self._cache_cap:
            cache.pop(next(iter(cache)))
        cache[key] = value

    def submit(self, image: np.ndarray, queries=None,
               query_image: np.ndarray | None = None) -> Future:
        """Enqueue one RGB uint8 [H, W, 3] image; returns a Future.

        The future resolves to
        `{"boxes": [n,4] xyxy in ORIGINAL image pixels, "scores": [n],
          "classes": [n]}` with only valid (post-NMS) detections kept.
        Images not already model-sized are bicubic-resized host-side (the
        reference's preprocessing protocol, HF image_processing_owlvit —
        square resize, no aspect preservation).

        queries: optional list of free-text strings — the request is served
        zero-shot, conditioned on its OWN queries (batched with other
        query-conditioned requests; `classes` then index into `queries` and
        the result gains a `labels` list). Requires the server's `tokenizer`.

        query_image: optional exemplar RGB uint8 image — one-shot
        (image-guided) detection of the exemplar's most salient object
        (`classes` are all 0, `labels` all "query-object"). Requires
        `one_shot=True`. Mutually exclusive with `queries`.
        """
        # admission + liveness checks FIRST: a shed or post-close request
        # must not pay the bicubic resize / sha1 below (load-shedding should
        # protect host CPU too, and a closed server's dispatch loop would
        # never resolve the future — the client would hang forever)
        if self._stop.is_set():
            raise RuntimeError("DetectorServer is closed")
        if self._q.qsize() >= self._max_queue:
            raise ServerOverloaded(
                f"request queue at max_queue={self._max_queue}; retry later"
            )
        if queries is not None and query_image is not None:
            raise ValueError("pass queries OR query_image, not both")
        if queries is not None:
            if self._tok is None:
                raise ValueError(
                    "zero-shot submit(queries=...) requires DetectorServer("
                    "tokenizer=...) — pass a CLIPTokenizer (or HashTokenizer "
                    "for tests)"
                )
            if not 1 <= len(queries) <= self._max_queries:
                raise ValueError(
                    f"got {len(queries)} queries; serving compiles for "
                    f"1..{self._max_queries} (max_queries)"
                )
            queries = tuple(str(q) for q in queries)
        qdigest = None
        if query_image is not None:
            if not self._one_shot:
                raise ValueError(
                    "one-shot submit(query_image=...) requires "
                    "DetectorServer(one_shot=True)"
                )
            query_image = self._model_sized(query_image, "query_image")
            import hashlib

            qdigest = hashlib.sha1(query_image.tobytes()).hexdigest()
        h, w = image.shape[:2] if image.ndim == 3 else (0, 0)
        image = self._model_sized(image, "image")
        req = _Request(image, (w, h), queries, query_image, qdigest)
        self._q.put(req)
        return req.future

    def detect(self, image: np.ndarray, queries=None,
               query_image: np.ndarray | None = None,
               timeout: float | None = None) -> dict:
        """Synchronous convenience wrapper around `submit`."""
        return self.submit(
            image, queries=queries, query_image=query_image
        ).result(timeout=timeout)

    def bulk_detect(self, images=None, queries=None,
                    stage_first: bool = False, prestaged: dict | None = None,
                    ) -> list:
        """Fetch-DEFERRED offline/batch inference over a list of images.

        Runs every batch put -> exec on the caller's thread and keeps each
        batch's packed detections DEVICE-resident; nothing crosses back to
        the host until all batches have executed, then one fetch pass
        returns every result. Why this exists (measured, BENCH.md r5b/r5c
        put-recovery probes): on the TPU relay a process keeps fast H2D
        puts (~1.4 GB/s) until its FIRST device->host fetch; that fetch
        stalls ~1-9 min and afterwards every put runs at ~10-30 MB/s
        permanently (server-side per-session state — reconnect does not
        recover it). Online serving fetches per batch and is therefore
        relay-capped at ~16 img/s; a bulk job that defers all fetches keeps
        the put path fast for its whole length and pays the one-time fetch
        stall amortized over the job. On hardware without the relay
        pathology this is simply a tight pipelined batch loop.

        Results are small on device: [bucket, top_k*7] f32 per batch
        (~180 KB at b32/K=200), so a job of tens of thousands of images
        holds well under 1 GB of outputs in HBM.

        Parameters
        ----------
        images : sequence of RGB uint8 [H, W, 3] arrays (resized host-side
            if not model-sized, as in `submit`).
        queries : optional list of free-text strings shared by the WHOLE
            job (zero-shot). Encoded device-resident — deliberately
            bypassing the host text cache, whose fetch would end fast-put
            mode. Requires the server's `tokenizer`.

        stage_first : put EVERY batch onto the device before the first
            executable runs (then exec over the staged inputs, then fetch).
            The relay can flip a process into degraded-put mode on events
            other than the first fetch (a big remote compile / first big
            exec is the suspect — r5d; the training pixel pre-stage exists
            for the same reason), so a job that front-loads all of its H2D
            while the process is still pristine is immune to the flip no
            matter which event triggers it. Costs HBM: all job pixels are
            device-resident at once (~56 MB per b32 batch — size jobs to
            HBM, e.g. <=4000 768px images beside B/16 params). For full
            effect construct the server with warmup=False and make this
            job's call the process's first device work.

        prestaged : output of `stage_bulk_images`, for callers whose
            process must compile things (e.g. a query-bank build) between
            image decode and the job — staging through that helper FIRST
            keeps every pixel put in pristine-process fast mode regardless
            of what compiles afterwards (cli bulk-infer does this).
            Mutually exclusive with `images`; single-device servers only.

        Returns a list of result dicts (same schema as `detect`) in input
        order. Locking: the job's exec/fetch passes release the relay lock
        between batches (online traffic interleaves there), but the
        stage_first put loop is ONE critical section — online work fetches,
        and a fetch mid-staging would flip the process out of fast-put mode
        and defeat the staging. Online requests therefore block for the
        whole staging phase of a stage_first job; run big bulk jobs on a
        quiet server.
        """
        if prestaged is not None:
            if images is not None:
                raise ValueError("pass images OR prestaged, not both")
            if self.mesh is not None:
                raise ValueError(
                    "prestaged input is single-device; mesh servers must "
                    "pass images directly"
                )
            if (prestaged["bucket"] != self.buckets[-1]
                    or prestaged["image_size"] != self.image_size):
                raise ValueError(
                    f"prestaged for bucket={prestaged['bucket']} "
                    f"S={prestaged['image_size']}; this server serves "
                    f"bucket={self.buckets[-1]} S={self.image_size}"
                )
            if not prestaged["n"]:
                return []
        else:
            if images is None:
                raise ValueError("bulk_detect needs images or prestaged")
            images = list(images)
            if not images:
                return []
        if queries is not None:
            if self._tok is None:
                raise ValueError(
                    "bulk_detect(queries=...) requires DetectorServer("
                    "tokenizer=...)"
                )
            if not 1 <= len(queries) <= self._max_queries:
                raise ValueError(
                    f"got {len(queries)} queries; serving compiles for "
                    f"1..{self._max_queries} (max_queries)"
                )
            queries = tuple(str(q) for q in queries)
        bucket = self.buckets[-1]
        S = self.image_size
        if prestaged is not None:
            sized, whs, n_imgs = None, prestaged["whs"], prestaged["n"]
        else:
            sized, whs = [], []
            for im in images:
                h, w = im.shape[:2] if im.ndim == 3 else (0, 0)
                sized.append(self._model_sized(im, "image"))
                whs.append((w, h))
            n_imgs = len(sized)

        t_job = time.perf_counter()
        # prestaged puts happened before this call — fold their cost into
        # the job's put accounting
        put_s = prestaged["put_secs"] if prestaged is not None else 0.0
        exec_s = 0.0
        put_series: list = (
            list(prestaged["put_series_ms"]) if prestaged is not None else []
        )
        exec_series: list = []
        state = {"qemb": None, "qmask": None}

        def _assemble(lo):
            return _flatten_bucket(sized[lo : lo + bucket], bucket, S)

        def _put_timed(flat):
            nonlocal put_s
            t0 = time.perf_counter()
            dev = jax.block_until_ready(self._put(flat))
            dt = time.perf_counter() - t0
            put_s += dt
            if len(put_series) < 512:
                put_series.append(round(dt * 1e3, 1))
            return dev

        def _exec_timed(dev):
            # The FIRST exec of a cold server carries the remote compile
            # (~4 min on the relay) — exec_series lets callers separate it
            # from the steady per-batch rate.
            nonlocal exec_s
            t0 = time.perf_counter()
            if queries is not None:
                out = jax.block_until_ready(self._serve_zs(
                    self._params, dev, state["qemb"], state["qmask"]))
            else:
                out = jax.block_until_ready(self._serve(self._params, dev))
            dt = time.perf_counter() - t0
            exec_s += dt
            if len(exec_series) < 512:
                exec_series.append(round(dt * 1e3, 1))
            return out

        def _setup_queries():
            # Device-resident query embeddings: encode each string through
            # the same [1, L] executable the online path uses, but never
            # np.asarray the result (stack/pad/broadcast are device-side
            # eager ops) — the whole job stays fetch-free until the end.
            if queries is None:
                return
            embs = []
            for q in queries:
                enc = self._tok([q])
                ids = jax.block_until_ready(jnp.asarray(enc["input_ids"]))
                am = jax.block_until_ready(
                    jnp.asarray(enc["attention_mask"]))
                e = jax.block_until_ready(
                    self._encode_text(self._params, ids, am))
                embs.append(e[0])
            qe = jnp.stack(embs)  # [n, proj], device
            qe = jnp.pad(qe, ((0, self._max_queries - len(embs)), (0, 0)))
            state["qemb"] = jax.block_until_ready(jnp.broadcast_to(
                qe[None], (bucket, self._max_queries, self._proj)
            ).astype(jnp.float32))
            mask = np.zeros((bucket, self._max_queries), np.int32)
            mask[:, : len(queries)] = 1  # tiny (KBs) put
            state["qmask"] = jax.block_until_ready(self._put(mask))

        offsets = range(0, n_imgs, bucket)
        device_out: list = []  # [bucket, K*7] f32 per batch, ON DEVICE
        if prestaged is not None:
            # pixels are already device-resident (staged by the caller
            # before anything compiled); exec over them directly
            staged = list(prestaged["staged"])
            prestaged["staged"] = []  # this copy now OWNS the refs, so the
            # per-slot None below actually frees HBM as the job consumes it
            with self._relay_lock:
                _setup_queries()
            for bi in range(len(staged)):
                with self._relay_lock:
                    device_out.append(_exec_timed(staged[bi]))
                staged[bi] = None  # free the input slot's HBM
        elif stage_first:
            # ALL H2D first, while the process is pristine (no compile,
            # no big exec, no fetch has happened yet if the caller set the
            # server up for it) — then compiles/execs, then the fetch pass.
            staged: list = []
            with self._relay_lock:
                for lo in offsets:
                    staged.append(_put_timed(_assemble(lo)))
                _setup_queries()  # text-tower compile AFTER the pixel puts
            for bi in range(len(staged)):
                with self._relay_lock:
                    device_out.append(_exec_timed(staged[bi]))
                staged[bi] = None  # free the input slot's HBM
        else:
            with self._relay_lock:
                _setup_queries()
            for lo in offsets:
                flat = _assemble(lo)
                with self._relay_lock:
                    dev = _put_timed(flat)
                    device_out.append(_exec_timed(dev))

        # One deferred fetch pass: the first np.asarray pays the relay's
        # per-process flush stall once; d2h is never degraded after it.
        t_f = time.perf_counter()
        results: list = []
        first_fetch_s = None
        for bi, out in enumerate(device_out):
            with self._relay_lock:
                tf0 = time.perf_counter()
                packed = np.asarray(out)
                if first_fetch_s is None:
                    first_fetch_s = time.perf_counter() - tf0
            packed = packed.reshape(bucket, self._top_k, 7)
            for i in range(min(bucket, n_imgs - bi * bucket)):
                results.append(self._unpack_row(
                    packed[i], whs[bi * bucket + i], queries))
        fetch_s = time.perf_counter() - t_f

        with self._lock:
            b = self._stats.setdefault("bulk", {
                "jobs": 0, "images": 0, "batches": 0,
                "put_secs": 0.0, "exec_secs": 0.0, "fetch_secs": 0.0,
            })
            b["jobs"] += 1
            b["images"] += n_imgs
            b["batches"] += len(device_out)
            b["put_secs"] += round(put_s, 3)
            b["exec_secs"] += round(exec_s, 3)
            b["fetch_secs"] += round(fetch_s, 3)
            b["last_first_fetch_secs"] = round(first_fetch_s, 3)
            b["last_job_secs"] = round(time.perf_counter() - t_job, 3)
            b["last_put_series_ms"] = put_series
            b["last_exec_series_ms"] = exec_series
            b["last_stage_first"] = (
                "prestaged" if prestaged is not None else stage_first
            )
        return results

    def stats(self) -> dict:
        with self._lock:
            lat = sorted(self._latency)
            out = {
                **{k: (dict(v) if isinstance(v, dict) else v)
                   for k, v in self._stats.items()},
                "queue_depth": self._q.qsize(),
            }
        if lat:
            pick = lambda q: lat[min(len(lat) - 1, int(q * len(lat)))]  # noqa: E731
            out["latency_ms"] = {
                "p50": round(pick(0.50) * 1e3, 2),
                "p90": round(pick(0.90) * 1e3, 2),
                "p99": round(pick(0.99) * 1e3, 2),
                "n": len(lat),
            }
        return out

    # ----------------------------------------------------------- worker side

    def _dispatch_loop(self):
        # Two lanes: query-bank requests and zero-shot requests compile to
        # different executables, so a batch must be homogeneous. Each lane
        # dispatches when its bucket fills or its OLDEST request's delay
        # window expires — one lane's traffic never delays the other's
        # deadline.
        #
        # SINGLE DEVICE THREAD, strictly serial relay usage: this loop is
        # the only thread that ever touches JAX, and each batch completes
        # put -> exec -> block -> fetch before the next batch's transfer
        # starts. Overlapping transfers with device execution is a ~100x
        # PESSIMIZATION on the TPU relay (tpu_transfer_probe r4: H2D during
        # an in-flight exec 3683 ms vs 39 ms idle; D2H beside a blocked
        # fetch 5001 ms vs 29 ms) — both the r3g two-thread pipeline and an
        # async single-thread pipeline hit it (14.8 img/s floods at ~2 s/
        # batch while every isolated phase probes fast). Fetched numpy
        # results go to the completion thread, which does pure-host
        # postprocessing only.
        max_b = self.buckets[-1]
        pend = {False: deque(), True: deque()}  # key: is zero-shot
        stop = False
        _EMPTY = object()
        while not stop or pend[False] or pend[True]:
            heads = [d[0].t_enqueue for d in pend.values() if d]
            timeout = (
                None if not heads
                else max(0.0, min(heads) + self.max_delay_s - time.perf_counter())
            )
            try:
                nxt = (
                    self._q.get(timeout=timeout)
                    if timeout is None or timeout > 0
                    else self._q.get_nowait()
                )
            except queue.Empty:
                nxt = _EMPTY
            if nxt is None:
                stop = True
            elif nxt is not _EMPTY:
                pend[nxt.conditioned].append(nxt)
                # Greedily drain the queue before checking deadlines: under
                # a backlog every queued request is already past its delay
                # window, so taking one per iteration would trip the
                # deadline branch below into dispatching batch=1 per
                # request (observed on chip: a 640-request flood ran as 640
                # single-row batches at 0.65 img/s, BENCH.md r3g).
                try:
                    while True:
                        more = self._q.get_nowait()
                        if more is None:
                            stop = True
                            break
                        pend[more.conditioned].append(more)
                except queue.Empty:
                    pass
            now = time.perf_counter()
            for is_zs in (False, True):
                d = pend[is_zs]
                while d and (
                    len(d) >= max_b
                    or stop
                    or d[0].t_enqueue + self.max_delay_s <= now
                ):
                    batch = [d.popleft() for _ in range(min(len(d), max_b))]
                    try:
                        out = self._dispatch(batch, is_zs)  # put+exec+block
                    except Exception as e:  # noqa: BLE001 — device/compile
                        # failure must reach the waiting clients, not hang
                        # their futures forever
                        _fail_futures(batch, e)
                        continue
                    self._fetch(out, batch)
        self._done_q.put(None)

    def _fetch(self, out, batch: list):
        """Device->host fetch of a COMPLETED batch (exec already blocked on
        in _dispatch, so the link is idle); hands the numpy result to the
        completion thread. Runs on the dispatch thread — the single JAX
        thread."""
        tf0 = time.perf_counter()
        try:
            with self._relay_lock:
                packed = np.asarray(out)
        except Exception as e:  # noqa: BLE001 — a device failure can still
            # surface at the fetch RPC; fail the batch's futures
            _fail_futures(batch, e)
            return
        if self._debug_phases:
            with self._lock:
                self._stats["phase_secs"]["fetch"] += time.perf_counter() - tf0
        self._done_q.put((packed, batch))

    def _embed_queries(self, queries: tuple) -> np.ndarray:
        """Normalized text embeddings [len(queries), proj], one device
        encode per DISTINCT string ever seen (host cache) — steady-state
        zero-shot traffic does no text-tower work at all."""
        out = []
        for q in queries:
            e = self._text_cache.get(q)
            if e is None:
                enc = self._tok([q])
                # settle puts before the encode exec; block the exec before
                # the fetch (the degraded-put discipline, see _dispatch)
                ids = jax.block_until_ready(jnp.asarray(enc["input_ids"]))
                am = jax.block_until_ready(jnp.asarray(enc["attention_mask"]))
                e = np.asarray(jax.block_until_ready(
                    self._encode_text(self._params, ids, am)
                ))[0]
                self._cache_put(self._text_cache, q, e)
            out.append(e)
        return np.stack(out)

    def _dispatch(self, batch: list, is_zs: bool = False):
        n = len(batch)
        bucket = next(b for b in self.buckets if b >= n)
        S = self.image_size
        t0 = time.perf_counter()
        # Assemble FLAT [bucket, S*S*3]: each row is a contiguous-view copy;
        # the flat layout is what keeps the relay transfer unpadded (see
        # _serve's wire-format comment).
        images = np.zeros((bucket, S * S * 3), np.uint8)
        for i, req in enumerate(batch):
            images[i] = req.image.reshape(-1)
        if is_zs:
            qemb = np.zeros((bucket, self._max_queries, self._proj), np.float32)
            qmask = np.zeros((bucket, self._max_queries), np.int32)
            # The embedding paths below are RELAY RPCs (puts, a compile-
            # bearing exec on a cache miss, and a d2h fetch) — they must
            # hold the relay lock like every other device phase, or a
            # concurrent stage_first bulk job's staging puts race a FETCH
            # (the permanent put-flip trigger the lock exists to prevent)
            with self._relay_lock:
                for i, req in enumerate(batch):
                    if req.queries is not None:
                        e = self._embed_queries(req.queries)
                    else:  # one-shot: exemplar embedding, cached by digest
                        e = self._qimg_cache.get(req.qdigest)
                        if e is None:
                            qdev = jax.block_until_ready(
                                jnp.asarray(req.qimage.reshape(1, -1)))
                            e = np.asarray(jax.block_until_ready(
                                self._embed_qimage(self._params, qdev)
                            ))
                            self._cache_put(self._qimg_cache, req.qdigest, e)
                        e = e[None]  # [1, proj]
                    qemb[i, : len(e)] = e
                    qmask[i, : len(e)] = 1
            call = lambda dev: self._serve_zs(  # noqa: E731
                self._params, dev,
                jax.block_until_ready(self._put(qemb)),
                jax.block_until_ready(self._put(qmask)),
            )
        else:
            call = lambda dev: self._serve(self._params, dev)  # noqa: E731
        # Every put is SETTLED (block_until_ready) before the exec is
        # dispatched: issuing the exec RPC while the put is still in flight
        # is the suspected trigger that flips the process into permanent
        # degraded-PUT mode (~9.4 MB/s; BENCH.md r4d) — and the exec itself
        # must complete before the fetch or the next batch's H2D
        # (overlapped transfers run ~100x slower: see _dispatch_loop).
        # block_until_ready waits WITHOUT a transfer, and surfaces device
        # failures here, where the caller's try/except fails this batch's
        # futures.
        if self._debug_phases:
            t1 = time.perf_counter()
            with self._relay_lock:
                dev = jax.block_until_ready(self._put(images))
                t2 = time.perf_counter()
                out = jax.block_until_ready(call(dev))
            t3 = time.perf_counter()
            with self._lock:
                ph = self._stats["phase_secs"]
                ph["assemble"] += t1 - t0
                ph["h2d"] += t2 - t1
                ph["exec"] += t3 - t2
                series = self._stats["h2d_series_ms"]
                if len(series) < 256:
                    series.append(round((t2 - t1) * 1e3, 1))
        else:
            with self._relay_lock:
                dev = jax.block_until_ready(self._put(images))
                out = jax.block_until_ready(call(dev))
        with self._lock:
            self._stats["batches"] += 1
            self._stats["zs_batches"] += int(is_zs)
            self._stats["padded_rows"] += bucket - n
            self._stats["bucket_counts"][bucket] += 1
        return out

    def _unpack_row(self, row: np.ndarray, orig_wh: tuple,
                    queries: tuple | None, one_shot: bool = False) -> dict:
        """Decode one image's packed [K, 7] block (boxes/score/class/valid)
        into the client result dict, boxes rescaled to original pixels."""
        keep = row[:, 6] > 0.5
        w, h = orig_wh
        res = {
            "boxes": row[keep, :4] * np.array([w, h, w, h], np.float32),
            "scores": row[keep, 4],
            "classes": row[keep, 5].astype(np.int32),
        }
        if queries is not None:  # classes index the request's queries
            res["labels"] = [queries[c] for c in res["classes"]]
        elif one_shot:  # one-shot: single query slot
            res["labels"] = ["query-object"] * len(res["classes"])
        return res

    def _complete_loop(self):
        # Pure-host postprocessing: unpack the already-fetched numpy block
        # and resolve futures. No JAX calls here — the dispatch thread is
        # the only device owner (see _dispatch_loop).
        while True:
            item = self._done_q.get()
            if item is None:
                return
            packed, batch = item
            now = time.perf_counter()
            packed = packed.reshape(packed.shape[0], self._top_k, 7)
            for i, req in enumerate(batch):
                res = self._unpack_row(
                    packed[i], req.orig_wh, req.queries,
                    one_shot=req.qimage is not None,
                )
                try:
                    req.future.set_result(res)
                except Exception:
                    # a disconnected client cancels its future; set_result
                    # then raises InvalidStateError. One dead request must
                    # not kill this thread — with _done_q bounded, a dead
                    # completion loop would back-pressure _fetch and wedge
                    # the dispatch thread (= the whole server)
                    continue
            with self._lock:
                self._stats["requests"] += len(batch)
                self._latency.extend(now - r.t_enqueue for r in batch)


# ------------------------------------------------------------- HTTP frontend


def make_app(server: DetectorServer, labelmap: dict | None = None):
    """aiohttp application over a DetectorServer.

    POST /detect   body = PNG/JPEG bytes -> JSON detections
    GET  /healthz  liveness
    GET  /stats    batching/latency counters
    """
    import asyncio
    import io

    from aiohttp import web
    from PIL import Image

    def _decode_sync(data):
        # native decoder when built (releases the GIL, PIL-exact resize is
        # done later in submit()); PIL fallback otherwise
        from owlvit_tpu import native

        arr = native.decode_bytes(data)
        if arr is not None:
            return arr
        return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))

    async def detect(request: "web.Request"):
        # decode OFF the event loop — a blocking PIL/libjpeg call in the
        # handler would stall every concurrent request
        loop = asyncio.get_running_loop()
        _decode = lambda d: loop.run_in_executor(None, _decode_sync, d)  # noqa: E731
        qimg = None
        try:
            if request.content_type == "multipart/form-data":
                # one-shot: fields `image` + `query_image` (both PNG/JPEG)
                form = await request.post()
                img = await _decode(form["image"].file.read())
                if "query_image" in form:
                    qimg = await _decode(form["query_image"].file.read())
            else:
                img = await _decode(await request.read())
        except Exception:  # noqa: BLE001 — malformed upload is a client error
            return web.json_response({"error": "undecodable image"}, status=400)
        # ?queries=cat,dog -> zero-shot serving conditioned on these strings
        qparam = request.query.get("queries")
        queries = (
            [q.strip() for q in qparam.split(",") if q.strip()]
            if qparam else None
        )
        try:
            fut = server.submit(img, queries=queries, query_image=qimg)
        except ServerOverloaded as e:
            return web.json_response({"error": str(e)}, status=503)
        except ValueError as e:  # no tokenizer / too many queries / both
            return web.json_response({"error": str(e)}, status=400)
        res = await asyncio.wrap_future(fut)
        if queries:
            names = {i: q for i, q in enumerate(queries)}
        elif qimg is not None:
            names = {0: "query-object"}
        else:
            names = labelmap or {}
        return web.json_response({
            "detections": [
                {
                    "box": [round(float(v), 2) for v in b],
                    "score": round(float(s), 4),
                    "class_id": int(c),
                    "class_name": names.get(int(c), str(int(c))),
                }
                for b, s, c in zip(res["boxes"], res["scores"], res["classes"])
            ]
        })

    async def healthz(_):
        return web.json_response({"ok": True})

    async def stats(_):
        return web.json_response(server.stats())

    app = web.Application(client_max_size=64 * 1024**2)
    app.router.add_post("/detect", detect)
    app.router.add_get("/healthz", healthz)
    app.router.add_get("/stats", stats)
    return app
