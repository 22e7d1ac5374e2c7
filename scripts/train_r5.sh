#!/bin/bash
# Round-5 stage S1: standalone resumable training continuation.
#
# Trains the gate nets (full-frame detector -> 5000 steps, crop net ->
# 6000 steps) with --sequences 0 (train-only; tracking gates run separately
# from the checkpoints), warm-starting from _outputs/mc_{det,crop}.npz via
# --resume so any timeout costs at most the 500-step checkpoint interval.
set -u
cd /root/repo
. scripts/lib.sh

DET_STEPS=${DET_STEPS:-5000}
CROP_STEPS=${CROP_STEPS:-6000}
LOG=_outputs/train_r5.log

for try in 1 2 3 4 5 6; do
  wait_for_tpu || exit 1
  echo "--- train attempt $try ($(date)) ---" >>"$LOG"
  if timeout 9000 python -m playground3d_tpu.apps.demo_e2e_mc \
    --steps "$DET_STEPS" --crop-steps "$CROP_STEPS" --batch 4 \
    --resume --sequences 0 --out-prefix /root/repo/_outputs/mc \
    >>"$LOG" 2>&1; then
    echo "training complete ($(date))" >>"$LOG"
    exit 0
  fi
  echo "attempt $try failed rc=$? ($(date))" >>"$LOG"
done
echo "training never completed" >>"$LOG"
exit 1
