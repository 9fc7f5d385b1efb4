"""Host->device prefetching.

The reference leans on torch's multiprocess DataLoader (dataset.py:101-106);
on TPU the equivalent win is overlapping host decode/resize with device
compute. A small thread pipelines batches: while the device runs step N, the
host assembles and transfers step N+1.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import jax


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

    # paths are host-only; indices stay host numpy too — trainers consume
    # them for cache bookkeeping on the host, and a put+np.asarray roundtrip
    # would add a per-step D2H sync on the slow relay link.
    _HOST_KEYS = ("paths", "indices") + tuple(host_keys)

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
                arrays = {
                    k: put(v)
                    for k, v in batch.items()
                    if k not in _HOST_KEYS
                }
                for k in _HOST_KEYS:
                    if k in batch:
                        arrays[k] = batch[k]
                q.put(arrays)
            q.put(_SENTINEL)
        except BaseException as exc:  # propagate, never truncate silently
            q.put((_ERR, exc))

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            return
        if isinstance(item, tuple) and len(item) == 2 and item[0] is _ERR:
            raise item[1]
        yield item
