#!/bin/bash
# r4b TPU campaign — serve fix validation + remaining r4 arms. ONE python
# process at a time, ~150 s claim cooldown between arms (CLAUDE.md). Arms
# append JSON to /tmp/tpu_runs.jsonl; results mirrored into the repo after
# every arm (r3 lost two campaigns to /tmp wipes).
LOG=/tmp/r4b_campaign.log
cd /root/repo
echo "=== campaign start $(date)" >> $LOG

run() {
  local bound=$1; shift
  echo "=== $(date +%H:%M:%S) [$bound s] $*" >> $LOG
  timeout "$bound" "$@" >> $LOG 2>&1
  echo "=== rc=$? at $(date +%H:%M:%S)" >> $LOG
  cp -f /tmp/tpu_runs.jsonl /root/repo/r4_tpu_runs.jsonl 2>/dev/null
  cp -f $LOG /root/repo/r4b_campaign.log 2>/dev/null
  sleep 150
}

# 1) transfer probe v3: CONCURRENCY cases — h2d/d2h while an exec is in
#    flight, with/without a second thread blocked in np.asarray on it (the
#    old two-thread serve.py interleaving). Proves the 2 s/batch mechanism.
run 2400 python tools/tpu_transfer_probe.py 5

# 2) serve flood through the FIXED single-thread pipeline (fetch moved onto
#    the dispatch thread; static-max default ON) + same-process main-thread
#    direct loop for the apples-to-apples upper bound. VERDICT #2 target:
#    >= ~80% of direct.
run 2400 python tools/tpu_serve_batched.py r4_serve_fixed model=b16 buckets=32 rate=0 total=640 delay_ms=5 direct=8

# 3) hflip-cached steady-state cost (two-row pool gather + in-graph mirror);
#    comparator = arm 4 (same static-max default, same session)
run 2400 python tools/tpu_one_run.py r4_hflip hflip=1 batch=32

# 4) cached tail with the new static-max default (r4a dynamic-max baseline:
#    379.9 gather / 413.7 resident img/s)
run 2400 python tools/tpu_one_run.py r4_cached_smax cached=1 batch=32

# 5) serving forward with the SHIPPED default (C=20 vs the A/B's C=0 —
#    same op structure; confirm the +10.9% transfers)
run 2400 python tools/tpu_one_run.py r4_infer_default infer=1 batch=32

# 6) standing retry: L/14 monolithic grad (crashed the remote compiler 7x)
run 3000 python tools/tpu_one_run.py r4_l14_grad model=l14 batch=8 steps=6

# 7) standing retry: b64 cached tail (relay UNAVAILABLE in r2/r3)
run 2400 python tools/tpu_one_run.py r4_b64 cached=1 batch=64

# 8) standing retry: b48 cached tail (faulted in r3; uncached b48 works)
run 2400 python tools/tpu_one_run.py r4_b48 cached=1 batch=48

echo "=== campaign done $(date)" >> $LOG
cp -f /tmp/tpu_runs.jsonl /root/repo/r4_tpu_runs.jsonl 2>/dev/null
cp -f $LOG /root/repo/r4b_campaign.log 2>/dev/null
