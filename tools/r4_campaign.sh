#!/bin/bash
# r4 TPU campaign — ONE python process at a time, ~150 s claim cooldown
# between arms (CLAUDE.md). Arms append JSON to /tmp/tpu_runs.jsonl; after
# every arm the log + results are mirrored into the repo so a VM restart
# cannot lose them (r3 lost two campaigns to /tmp wipes).
LOG=/tmp/r4_campaign.log
cd /root/repo
echo "=== campaign start $(date)" >> $LOG

run() {
  local bound=$1; shift
  echo "=== $(date +%H:%M:%S) [$bound s] $*" >> $LOG
  timeout "$bound" "$@" >> $LOG 2>&1
  echo "=== rc=$? at $(date +%H:%M:%S)" >> $LOG
  cp -f /tmp/tpu_runs.jsonl /root/repo/r4_tpu_runs.jsonl 2>/dev/null
  cp -f $LOG /root/repo/r4_campaign.log 2>/dev/null
  sleep 150
}

# 1) transfer probe v2 (fresh-buffer d2h + worker-thread h2d isolation) —
#    also settles the claim with tiny graphs first
run 1800 python tools/tpu_transfer_probe.py 5

# 2) serve flood through the FIXED batcher (r3 bug: one-get-per-iteration
#    dispatch shipped batch=1 under backlog) — VERDICT #2
run 2400 python tools/tpu_serve_batched.py r4_serve_flood model=b16 buckets=32 rate=0 total=640 delay_ms=5

# 3+4) static-max softmax A/B on the serving forward (fwd-kernel envelope)
run 2400 python tools/tpu_one_run.py r4_infer_base infer=1 batch=32
run 2400 python tools/tpu_one_run.py r4_infer_smax infer=1 batch=32 staticmax=0

# 4b+4c) static-max on the UNCACHED train step (the sub-3x-proxy number is
#        frozen-prefix fwd-kernel bound — this is where the win would land)
run 2400 python tools/tpu_one_run.py r4_uncached_base batch=32
run 2400 python tools/tpu_one_run.py r4_uncached_smax batch=32 staticmax=0

# 5) static-max numerics on chip: pallas variants (env applies) vs xla exact
run 1800 env OWLVIT_STATIC_MAX=0 python tools/tpu_kernel_parity.py batch=4

# 6) cached-tail baseline post-edits (same-campaign comparator for hflip)
run 2400 python tools/tpu_one_run.py r4_cached cached=1 batch=32

# 7) hflip-cached steady-state cost (two-row pool gather + in-graph mirror)
run 2400 python tools/tpu_one_run.py r4_hflip hflip=1 batch=32

# 8) full driver bench (median-of-3 baseline + MFU fields) — validate before
#    the driver's end-of-round run
run 3600 python bench.py

# 9) standing retry: L/14 monolithic grad (crashed the remote compiler 7x)
run 3000 python tools/tpu_one_run.py r4_l14_grad model=l14 batch=8 steps=6

# 10) standing retry: b64 cached tail (relay UNAVAILABLE in r2/r3)
run 2400 python tools/tpu_one_run.py r4_b64 cached=1 batch=64

# 11) standing retry: b48 cached tail (faulted in r3; uncached b48 works)
run 2400 python tools/tpu_one_run.py r4_b48 cached=1 batch=48

echo "=== campaign done $(date)" >> $LOG
cp -f /tmp/tpu_runs.jsonl /root/repo/r4_tpu_runs.jsonl 2>/dev/null
cp -f $LOG /root/repo/r4_campaign.log 2>/dev/null
