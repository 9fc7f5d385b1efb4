#!/bin/bash
# r5b follow-up — runs AFTER r5_campaign.sh exits. Decisive put-degradation
# trigger separation + recovery attempts, and the BLOCK_Q=256 era retest.
LOG=/tmp/r5_campaign.log
cd /root/repo
while kill -0 "$(cat /tmp/r5_campaign.pid)" 2>/dev/null; do sleep 60; done
sleep 150
echo "=== r5b start $(date)" >> $LOG

run() {
  local bound=$1; shift
  echo "=== $(date +%H:%M:%S) [$bound s] $*" >> $LOG
  timeout "$bound" "$@" >> $LOG 2>&1
  echo "=== rc=$? at $(date +%H:%M:%S)" >> $LOG
  cp -f /tmp/tpu_runs.jsonl /root/repo/r5_tpu_runs.jsonl 2>/dev/null
  cp -f $LOG /root/repo/r5_campaign.log 2>/dev/null
  sleep 150
}

# 1) H-bytes vs H-fetch separation + parallel-put scaling + reconnect
#    recovery (the serving crawl root-cause decision point)
run 3600 python tools/tpu_put_recovery_probe.py 20

# 2) BLOCK_Q=256 era retest (r2: runtime device fault; compiler healed in
#    r4 — bigger flash blocks halve grid steps on the 2432-token B/16 seq)
run 2400 env OWLVIT_BLOCK_Q=256 python tools/tpu_one_run.py r5_bq256_uncached batch=32
run 2400 env OWLVIT_BLOCK_Q=256 python tools/tpu_one_run.py r5_bq256_cached cached=1 batch=32

echo "=== r5b done $(date)" >> $LOG
cp -f /tmp/tpu_runs.jsonl /root/repo/r5_tpu_runs.jsonl 2>/dev/null
cp -f $LOG /root/repo/r5_campaign.log 2>/dev/null
