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


def prefetch_to_device(iterator: Iterator[dict], size: int = 2) -> Iterator[dict]:
    """Wrap a numpy-batch iterator; yields batches already on device."""
    q: queue.Queue = queue.Queue(maxsize=size)
    _SENTINEL = object()
    _ERR = object()

    def producer():
        try:
            for batch in iterator:
                arrays = {
                    k: jax.device_put(v)
                    for k, v in batch.items()
                    if k != "paths"
                }
                if "paths" in batch:
                    arrays["paths"] = batch["paths"]
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
