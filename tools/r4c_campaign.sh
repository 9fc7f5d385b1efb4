#!/bin/bash
# r4c TPU campaign — serial-relay serve/loader validation + driver bench.
# ONE python process at a time, ~150 s claim cooldown between arms
# (CLAUDE.md). Arms append JSON to /tmp/tpu_runs.jsonl; results mirrored
# into the repo after every arm.
LOG=/tmp/r4c_campaign.log
cd /root/repo
echo "=== campaign start $(date)" >> $LOG

run() {
  local bound=$1; shift
  echo "=== $(date +%H:%M:%S) [$bound s] $*" >> $LOG
  timeout "$bound" "$@" >> $LOG 2>&1
  echo "=== rc=$? at $(date +%H:%M:%S)" >> $LOG
  cp -f /tmp/tpu_runs.jsonl /root/repo/r4_tpu_runs.jsonl 2>/dev/null
  cp -f $LOG /root/repo/r4c_campaign.log 2>/dev/null
  sleep 150
}

# 1) serve no-flood control: main-thread direct loop in a FRESH process
#    (server threads alive but idle, no prior overlapped traffic) — is the
#    1.6 s/put of the r4b direct loop flood-poisoning or inherent?
run 2400 python tools/tpu_serve_batched.py r4_serve_direct_only model=b16 buckets=32 total=0 direct=8

# 2) serve flood through the STRICTLY-SERIAL pipeline (put->exec->block->
#    fetch on one thread; phases=1 is near-free now and gives the split).
#    VERDICT #2 target: >= ~80% of direct (154 img/s) => >= ~123 img/s.
run 2400 python tools/tpu_serve_batched.py r4_serve_serial model=b16 buckets=32 rate=0 total=640 delay_ms=5 phases=1 direct=8

# 3) loader A/B at the real uncached train-step composition: consumer-side
#    put (serial) vs producer-thread put (overlapped) vs serial-again
#    (in-process persistence of the degradation)
run 2400 python tools/tpu_one_run.py r4_stream stream=1 batch=32 steps=12

# 4) cached tail retry with the static-max default — r4b's first attempt hit
#    UNAVAILABLE (the sporadic b48/b64-style relay fault pattern; the hflip
#    arm ran the same kernels + static-max fine at 360.95 img/s). If this
#    faults AGAIN, arm 5 decides whether static-max composes badly with the
#    cached tail — then the default must be gated before the driver bench.
run 2400 python tools/tpu_one_run.py r4_cached_retry cached=1 batch=32

# 5) control at dynamic max (also re-baselines vs r4a's 379.9/413.7)
run 2400 python tools/tpu_one_run.py r4_cached_dyn cached=1 batch=32 staticmax=off

# 6) transfer probe with persistence cases (plain h2d/d2h re-measured AFTER
#    the overlapped cases in the same process)
run 2400 python tools/tpu_transfer_probe.py 5

# 7) full driver bench (static-max default + median-of-3 + MFU fields) —
#    validate before the driver's end-of-round run
run 3600 python bench.py

echo "=== campaign done $(date)" >> $LOG
cp -f /tmp/tpu_runs.jsonl /root/repo/r4_tpu_runs.jsonl 2>/dev/null
cp -f $LOG /root/repo/r4c_campaign.log 2>/dev/null
