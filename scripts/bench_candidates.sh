#!/bin/bash
# Phase 3 of the round-3 quality gate: once gate_cadence.sh (PID given as
# $1, optional) finishes its A/B matrix, measure bench.py fps at each
# candidate ship configuration so the quality tables and throughput rows
# land side by side in _outputs/bench_candidates.log.
#
# Runs each config twice (compile-cached second run is the number).
set -u
cd /root/repo
. scripts/lib.sh

GATE_PID=${1:-}
if [ -n "$GATE_PID" ]; then
  while kill -0 "$GATE_PID" 2>/dev/null; do sleep 60; done
fi


LOG=_outputs/bench_candidates.log
echo "=== bench candidates ($(date)) ===" >>"$LOG"

run_bench() {
  tag=$1; shift
  wait_for_tpu || { echo "$tag: TPU never came back" >>"$LOG"; return 1; }
  echo "--- $tag: $* ($(date))" >>"$LOG"
  # shellcheck disable=SC2048,SC2086
  env BENCH_TPU_WAIT_SECS=120 BENCH_RUN_TIMEOUT=1500 $@ timeout 1800 python bench.py >>"$LOG" 2>&1
}

run_bench d3_shipped
run_bench d6           BENCH_DET_STEP=6
run_bench d6_nudge     BENCH_DET_STEP=6 BENCH_SIZE_NUDGE=1
run_bench d6s2_nudge   BENCH_DET_STEP=6 BENCH_SKIP_STEP=2 BENCH_SIZE_NUDGE=1
echo "=== bench candidates done ($(date)) ===" >>"$LOG"
