#!/bin/bash
# Round-5 follow-up TPU evidence, queued behind chain5 (polls its log for
# the completion marker so the chip is never contended):
#   1. scripts/bench_mc.py at C=8 and C=18 — the reference's deployment
#      shape is 18 cameras per node (MC3D_crop_tracker.py:1472-1509);
#      BENCHMARKS.md only has the C=4 row.
#   2. bench_scale.sh pool-capacity sweep (64/128/256 track slots).
#   3. resnet50 @ 1080p training smoke (300 steps, loss decreasing) —
#      round-4 VERDICT weak #3: evidence the reference-parity training
#      config runs, beyond the 512x768 harness scale.
set -u
cd /root/repo
. scripts/sprint_lib.sh

CHAIN_LOG=_outputs/chain5_r5.log
for _ in $(seq 1 240); do
  grep -q "chain5 complete" "$CHAIN_LOG" 2>/dev/null && break
  sleep 60
done
grep -q "chain5 complete" "$CHAIN_LOG" || echo "WARN: chain5 marker never appeared; proceeding anyway"

sprint_deadline "${FOLLOWUP_BUDGET:-7200}"

run_stage bench_mc_c8 600 1800 _outputs/bench_mc_c8.log \
  python scripts/bench_mc.py --cameras 8

run_stage bench_mc_c8_d6 600 1800 _outputs/bench_mc_c8_d6.log \
  python scripts/bench_mc.py --cameras 8 --det-step 6

run_stage bench_mc_c18 600 1800 _outputs/bench_mc_c18.log \
  python scripts/bench_mc.py --cameras 18 --max-tracks 128 --crop-slots 64

run_stage bench_scale 1500 3600 _outputs/bench_scale_stage.log \
  bash scripts/bench_scale.sh

run_stage r50_smoke 900 2400 _outputs/r50_smoke.log \
  python -m playground3d_tpu.apps.train_detector --steps 300 --batch 2 \
  --depth 50 --height 1080 --width 1920 --steps-per-epoch 100 \
  --out _outputs/r50_smoke.npz

note "followup complete"
