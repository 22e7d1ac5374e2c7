#!/bin/bash
# Reference-scale pool sweep: fps vs track-pool capacity.
#
# The fused tracker's cost is shape-static: fps depends on the POOL
# capacities (max_tracks slots, max_dets detections, crop_slots crop
# budget), not on how many slots are live. The reference targets 18
# cameras and dozens-to-hundreds of concurrent objects
# (MC3D_crop_tracker.py:1489-1509; KF sweep util_track/kf.py:430-504), so
# this measures the shipped single-camera clip program at pool 64 (shipped)
# / 128 / 256, with the detection cap and crop budget scaled along, at both
# the shipped d=3 cadence and the d=6(+nudge) candidate.
#
# Results -> _outputs/bench_scale.log (one bench.py JSON line per config);
# fold into BENCHMARKS.md "fps vs pool capacity" once captured on the chip.
#
# Usage: bench_scale.sh [pid-to-wait-for]
set -u
cd /root/repo
. scripts/lib.sh

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

LOG=_outputs/bench_scale.log
echo "=== bench scale ($(date)) ===" >>"$LOG"

run_bench() {
  tag=$1; shift
  wait_for_tpu || { echo "$tag: TPU never came back" >>"$LOG"; return 1; }
  echo "--- $tag: $* ($(date))" >>"$LOG"
  # shellcheck disable=SC2048,SC2086
  env BENCH_TPU_WAIT_SECS=120 BENCH_RUN_TIMEOUT=1500 $@ timeout 1800 python bench.py >>"$LOG" 2>&1
}

# Pin EVERY cadence knob per row: bench.py resolves unset knobs from
# bench_config.json (the shipped config), so an unpinned "d3" row would
# silently run the shipped cadence. (The 2026-08-19 capture predates this
# pinning — its d3_pool*/d6_pool* rows all measured the shipped
# d6s2_nudge_gate_ta4 config at the stated pool sizes; the two label sets
# agree with each other, which confirms exactly that.)
D3=(BENCH_DET_STEP=3 BENCH_SKIP_STEP=1 BENCH_SIZE_NUDGE=0 BENCH_CROP_CONF_GATE=0 BENCH_TENTATIVE_AGE=0)
D6=(BENCH_DET_STEP=6 BENCH_SKIP_STEP=1 BENCH_SIZE_NUDGE=1 BENCH_CROP_CONF_GATE=0 BENCH_TENTATIVE_AGE=0)
run_bench d3_pool64   "${D3[@]}" BENCH_MAX_TRACKS=64  BENCH_MAX_DETS=48  BENCH_CROP_SLOTS=32
run_bench d3_pool128  "${D3[@]}" BENCH_MAX_TRACKS=128 BENCH_MAX_DETS=96  BENCH_CROP_SLOTS=64
run_bench d3_pool256  "${D3[@]}" BENCH_MAX_TRACKS=256 BENCH_MAX_DETS=192 BENCH_CROP_SLOTS=128
run_bench d6_pool64   "${D6[@]}" BENCH_MAX_TRACKS=64  BENCH_MAX_DETS=48  BENCH_CROP_SLOTS=32
run_bench d6_pool128  "${D6[@]}" BENCH_MAX_TRACKS=128 BENCH_MAX_DETS=96  BENCH_CROP_SLOTS=64
run_bench d6_pool256  "${D6[@]}" BENCH_MAX_TRACKS=256 BENCH_MAX_DETS=192 BENCH_CROP_SLOTS=128
echo "=== bench scale done ($(date)) ===" >>"$LOG"
