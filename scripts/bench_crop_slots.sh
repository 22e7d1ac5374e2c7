#!/bin/bash
# Phase 4 of the round-3 bench sweep: crop-slot pool sizing.
#
# At d>=6 crop frames are 5 of every 6, so the crop step's ~1.28 ms
# dominates the clip; its cost scales with cfg.crop_slots (the number of
# oldest live slots cropped per crop frame). Measure bench.py at 16/24/32
# slots for the d=3 shipped config and the d=6(+nudge) candidate so the
# fps side of the slot lever is on record. Quality at <32 slots must be
# gated separately (scenes with >slots concurrent tracks starve updates).
#
# Usage: bench_crop_slots.sh [pid-to-wait-for]
set -u
cd /root/repo
. scripts/lib.sh

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi


LOG=_outputs/bench_crop_slots.log
echo "=== bench crop slots ($(date)) ===" >>"$LOG"

run_bench() {
  tag=$1; shift
  wait_for_tpu || { echo "$tag: TPU never came back" >>"$LOG"; return 1; }
  echo "--- $tag: $* ($(date))" >>"$LOG"
  # shellcheck disable=SC2048,SC2086
  env BENCH_TPU_WAIT_SECS=120 BENCH_RUN_TIMEOUT=1500 $@ timeout 1800 python bench.py >>"$LOG" 2>&1
}

run_bench d3_slots24       BENCH_CROP_SLOTS=24
run_bench d3_slots16       BENCH_CROP_SLOTS=16
run_bench d6_nudge_slots32 BENCH_DET_STEP=6 BENCH_SIZE_NUDGE=1
run_bench d6_nudge_slots24 BENCH_DET_STEP=6 BENCH_SIZE_NUDGE=1 BENCH_CROP_SLOTS=24
run_bench d6_nudge_slots16 BENCH_DET_STEP=6 BENCH_SIZE_NUDGE=1 BENCH_CROP_SLOTS=16
echo "=== bench crop slots done ($(date)) ===" >>"$LOG"
