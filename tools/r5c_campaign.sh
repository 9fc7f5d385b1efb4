#!/bin/bash
# r5c — reconnect-recovery decision + retries of the sporadic-fault arms.
LOG=/tmp/r5_campaign.log
cd /root/repo
while kill -0 "$(cat /tmp/r5b_campaign.pid)" 2>/dev/null; do sleep 60; done
sleep 150
echo "=== r5c start $(date)" >> $LOG

run() {
  local bound=$1; shift
  echo "=== $(date +%H:%M:%S) [$bound s] $*" >> $LOG
  timeout "$bound" "$@" >> $LOG 2>&1
  echo "=== rc=$? at $(date +%H:%M:%S)" >> $LOG
  cp -f /tmp/tpu_runs.jsonl /root/repo/r5_tpu_runs.jsonl 2>/dev/null
  cp -f $LOG /root/repo/r5_campaign.log 2>/dev/null
  sleep 150
}

# 1) reconnect recovery (the one serving lever left): degrade via the
#    16-put sweep, then clear_backends() x2 — does a reconnect restore
#    fast puts, and does it keep working?
run 2400 python tools/tpu_put_recovery_probe.py 16

# 2) L/14 driver bench retry (sporadic fault last time)
run 5400 env BENCH_MODEL=l14 python bench.py

# 3) staged-pixel stream arm retry (the r5_stream process died before it)
run 2400 python tools/tpu_one_run.py r5_stream2 stream=1 batch=32 steps=12

echo "=== r5c done $(date)" >> $LOG
cp -f /tmp/tpu_runs.jsonl /root/repo/r5_tpu_runs.jsonl 2>/dev/null
cp -f $LOG /root/repo/r5_campaign.log 2>/dev/null
