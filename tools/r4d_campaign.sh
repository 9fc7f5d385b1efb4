#!/bin/bash
# r4d TPU campaign — put-degradation bisect + gated-static validation +
# driver bench. ONE python process at a time, ~150 s cooldown (CLAUDE.md).
LOG=/tmp/r4d_campaign.log
cd /root/repo
echo "=== campaign start $(date)" >> $LOG

run() {
  local bound=$1; shift
  echo "=== $(date +%H:%M:%S) [$bound s] $*" >> $LOG
  timeout "$bound" "$@" >> $LOG 2>&1
  echo "=== rc=$? at $(date +%H:%M:%S)" >> $LOG
  cp -f /tmp/tpu_runs.jsonl /root/repo/r4_tpu_runs.jsonl 2>/dev/null
  cp -f $LOG /root/repo/r4d_campaign.log 2>/dev/null
  sleep 150
}

# 1) WHAT flips a process into degraded-put mode? (36 ms -> 1.5-2.1 s for
#    the same 56 MB H2D). Batteries after: 256-leaf tree, one 170 MB
#    buffer, deletes, tiny execs, BIG execs, eager fetch, h2d-during-exec,
#    DetectorServer init — each with block/roundtrip/consumed-by-exec wait
#    styles.
run 2400 python tools/tpu_put_state_probe.py 3

# 2) cached tail with the GATE (prefix static / tail dynamic) — the
#    flagship path must be proven before the driver bench; twice for fault
#    confidence.
run 2400 python tools/tpu_one_run.py r4_cached_gated cached=1 batch=32
run 2400 python tools/tpu_one_run.py r4_cached_gated2 cached=1 batch=32

# 3) streamed uncached train through the loader, serial vs thread vs
#    serial-again (the r4c attempt crashed under static-everywhere; now the
#    tail is dynamic under the gate)
run 2400 python tools/tpu_one_run.py r4_stream stream=1 batch=32 steps=12

# 4) serving direct number under the gate (ik=0 default now; expect ~171)
run 2400 python tools/tpu_one_run.py r4_infer_gated infer=1 batch=32

# 5) serve flood, strictly serial, NO phases (puts unblocked, consumed by
#    the exec — the cheaper wait style per r4c). With degraded puts this
#    bounds at ~30-35 img/s; the probe (arm 1) decides the next fix.
run 2400 python tools/tpu_serve_batched.py r4_serve_flood2 model=b16 buckets=32 rate=0 total=640 delay_ms=5

# 6) full driver bench (gated static + median-of-3 + MFU)
run 3600 python bench.py

echo "=== campaign done $(date)" >> $LOG
cp -f /tmp/tpu_runs.jsonl /root/repo/r4_tpu_runs.jsonl 2>/dev/null
cp -f $LOG /root/repo/r4d_campaign.log 2>/dev/null
