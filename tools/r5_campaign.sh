#!/bin/bash
# r5 TPU campaign — restore the green driver bench (VERDICT #1), measure
# the settled-put serving flood (#2), the staged-pixel uncached path (#4),
# b48 era retest, L/14 re-baseline (#5). ONE python process at a time,
# ~150 s claim cooldown between processes (CLAUDE.md).
LOG=/tmp/r5_campaign.log
cd /root/repo
echo "=== campaign start $(date)" >> $LOG

run() {
  local bound=$1; shift
  echo "=== $(date +%H:%M:%S) [$bound s] $*" >> $LOG
  timeout "$bound" "$@" >> $LOG 2>&1
  echo "=== rc=$? at $(date +%H:%M:%S)" >> $LOG
  cp -f /tmp/tpu_runs.jsonl /root/repo/r5_tpu_runs.jsonl 2>/dev/null
  cp -f $LOG /root/repo/r5_campaign.log 2>/dev/null
  sleep 150
}

# 1) put-state bisect v2 (contamination-aware ordering): does the strict
#    put->block->exec->block->fetch protocol hold the fast-put mode? Which
#    trigger flips it? This decides how to read the flood arm.
run 2400 python tools/tpu_put_state_probe.py 3

# 2) cached tail, fully dynamic softmax (the r5 re-gate: trainers never
#    build static kernels) — the path that faulted 5/6 in r4c/r4d.
#    Twice for fault confidence before betting the driver bench on it.
run 2400 python tools/tpu_one_run.py r5_cached cached=1 batch=32
run 2400 python tools/tpu_one_run.py r5_cached2 cached=1 batch=32

# 3) the driver bench (headline; BENCH_r05 shape)
run 3600 python bench.py

# 4) serve flood through the settle-every-put pipeline (serve v4): if the
#    probe says the serial protocol holds fast puts, this should jump from
#    17 img/s toward the 171 img/s direct-loop bound.
run 2400 python tools/tpu_serve_batched.py r5_serve_flood model=b16 buckets=32 rate=0 total=640 delay_ms=5

# 5) streamed uncached train + the staged-pixel arm (zero per-step image
#    H2D): serial/thread/serial-again vs staged in one process.
run 2400 python tools/tpu_one_run.py r5_stream stream=1 batch=32 steps=12

# 6) e2e `cli train` epoch walls (256 synthetic imgs, b32, cached device
#    store) — now with stage_pixels auto-on: epoch-1 wall is the number
#    (r3g: 34 s; the pre-stage should cut the per-step H2D out of it).
run 3600 python -m owlvit_tpu.cli train --config tools/cfg_b16_e2e.yaml --workdir /tmp/r5_e2e

# 7) b48 cached-tail era retest (worked once uncached in r2; UNAVAILABLE
#    since — CLAUDE.md says retest era limits each round)
run 2400 python tools/tpu_one_run.py r5_cached_b48 cached=1 batch=48

# 8) serving direct-loop repro under the config-threaded static gate
run 2400 python tools/tpu_one_run.py r5_infer infer=1 batch=32

# 9) L/14 re-baseline under the healed compiler (VERDICT #5): cached +
#    uncached via the driver bench (b8 protocol, fp32 baseline skipped)
run 5400 env BENCH_MODEL=l14 python bench.py

echo "=== campaign done $(date)" >> $LOG
cp -f /tmp/tpu_runs.jsonl /root/repo/r5_tpu_runs.jsonl 2>/dev/null
cp -f $LOG /root/repo/r5_campaign.log 2>/dev/null
