"""Summarize a jax.profiler trace: top device ops by total time.

Usage: python tools/trace_top_ops.py <trace_dir_or_json.gz> [top_n]

Reads the Perfetto-style trace.json.gz that jax.profiler writes and
aggregates complete events on device tracks (TPU/XLA ops), giving the
where-does-the-step-go table without TensorBoard.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys


def find_trace(path: str) -> str:
    if path.endswith(".json.gz"):
        return path
    cands = sorted(
        glob.glob(os.path.join(path, "**", "*.trace.json.gz"), recursive=True)
    )
    if not cands:
        raise FileNotFoundError(f"no trace.json.gz under {path}")
    return cands[-1]


def main():
    path = find_trace(sys.argv[1])
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    with gzip.open(path, "rt") as f:
        data = json.load(f)

    events = data.get("traceEvents", [])
    # process/thread names to find device tracks
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")

    device_pids = {
        pid for pid, n in names.items()
        if "TPU" in n or "/device" in n.lower() or "XLA" in n
    }

    totals = collections.defaultdict(float)
    counts = collections.defaultdict(int)
    total_device = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        totals[name] += dur
        counts[name] += 1
        total_device += dur

    print(f"trace: {path}")
    print(f"tracks: { {pid: names.get(pid) for pid in device_pids} }")
    print(f"{'op':60s} {'total_ms':>10s} {'count':>6s} {'%':>6s}")
    for name, t in sorted(totals.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{name[:60]:60s} {t:10.2f} {counts[name]:6d} "
              f"{100 * t / max(total_device, 1e-9):6.1f}")
    print(f"{'TOTAL (device events)':60s} {total_device:10.2f}")


if __name__ == "__main__":
    main()
