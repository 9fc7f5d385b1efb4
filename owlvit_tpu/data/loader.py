"""Host->device prefetching.

The reference leans on torch's multiprocess DataLoader (dataset.py:101-106);
on TPU the equivalent win is overlapping host decode/resize with device
compute. A small thread pipelines the HOST side: while the device runs step
N, the host assembles step N+1.

Where the device transfer happens depends on the backend. On the TPU relay
("axon"), a transfer issued while an exec is in flight runs ~100x slower
(tools/tpu_transfer_probe.py r4 concurrency cases: 56 MB H2D 3683 ms during
an exec vs 39 ms idle), so the producer thread must NOT device_put — the
consumer does it at yield time, when the previous step has already been
synced by the caller (the trainer's per-step loss fetch is that barrier).
On backends with real async transfer engines, the producer-side put
(classic prefetch) is kept.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Iterator

import jax


def _serial_relay() -> bool:
    """True when transfers must be serialized against execs (the TPU relay).
    OWLVIT_SERIAL_RELAY=0|1 overrides.

    The relay registers its platform as "axon" but `jax.default_backend()`
    reports "tpu" (every on-chip probe records backend "tpu" — ADVICE r4:
    keying on "axon" meant the consumer-side put never activated in real
    training). Default consumer-side put ON for any tpu backend: on this
    relay an overlapped transfer is a ~100x pessimization (BENCH.md r4b),
    and on real TPUs with async transfer engines the consumer-side put costs
    one prefetch depth, not correctness — OWLVIT_SERIAL_RELAY=0 restores the
    producer-side put there."""
    v = os.environ.get("OWLVIT_SERIAL_RELAY")
    if v in ("0", "1"):
        return v == "1"
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # noqa: BLE001 — backend init failure: act normal
        return False


def prefetch_to_device(
    iterator: Iterator[dict], size: int = 2, put=None, host_keys: tuple = ()
) -> Iterator[dict]:
    """Wrap a numpy-batch iterator; yields batches already on device.

    put: optional transfer fn (e.g. a NamedSharding device_put for mesh
    training) applied to every array value; defaults to jax.device_put.
    host_keys: extra keys to keep as host numpy. Every device_put and every
    later np.asarray is a separate relay RPC; values the consumer only reads
    on the host (eval ground truth, image metadata) must never ride the
    device at all.
    """
    q: queue.Queue = queue.Queue(maxsize=size)
    _SENTINEL = object()
    _ERR = object()
    if put is None:
        put = jax.device_put
    consumer_put = _serial_relay()

    # paths are host-only; indices stay host numpy too — trainers consume
    # them for cache bookkeeping on the host, and a put+np.asarray roundtrip
    # would add a per-step D2H sync on the slow relay link.
    _HOST_KEYS = ("paths", "indices") + tuple(host_keys)

    def _transfer(batch: dict) -> dict:
        arrays = {
            k: put(v) for k, v in batch.items() if k not in _HOST_KEYS
        }
        if consumer_put:
            # Settle the puts BEFORE the caller dispatches its exec: an RPC
            # issued while a put is in flight is the suspected trigger that
            # flips the process into permanent degraded-PUT mode (~9.4 MB/s
            # vs 1.4 GB/s — BENCH.md r4d put-state probe). Blocking here
            # costs nothing (the consumer needs the data now anyway).
            jax.block_until_ready(arrays)
        for k in _HOST_KEYS:
            if k in batch:
                arrays[k] = batch[k]
        return arrays

    # Abandonment-safe puts: if the consumer drops the generator mid-epoch
    # (a step raised, an early break), a plain blocking q.put would leave
    # this thread wedged forever holding ~size full image batches in host
    # memory — a campaign that retries per-epoch leaks a thread + hundreds
    # of MB per attempt. The producer instead polls a stop flag.
    stop = threading.Event()

    def _put_or_stop(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.5)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for batch in iterator:
                img = batch.get("image")
                if img is not None and getattr(img, "ndim", 0) == 4:
                    # FLAT wire format: the relay transfers arrays in device
                    # (tiled) layout, so [B, S, S, 3]'s trailing 3 lane-pads
                    # to 128 — ~42x the bytes on the wire. Ship [B, S*S*3]
                    # (a free host-side view) and let the jitted consumers
                    # reshape on device (trainer train/eval/prefix steps all
                    # accept either rank). See tools/tpu_transfer_probe.py.
                    batch["image"] = img.reshape(img.shape[0], -1)
                if not _put_or_stop(
                    batch if consumer_put else _transfer(batch)
                ):
                    return  # consumer gone; drop everything and exit
            _put_or_stop(_SENTINEL)
        except BaseException as exc:  # propagate, never truncate silently
            _put_or_stop((_ERR, exc))

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                return
            if isinstance(item, tuple) and len(item) == 2 and item[0] is _ERR:
                raise item[1]
            yield _transfer(item) if consumer_put else item
    finally:
        # runs on normal exhaustion AND on GeneratorExit/exception in the
        # consumer — release the producer so it exits instead of wedging
        stop.set()
