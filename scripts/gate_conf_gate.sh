#!/bin/bash
# Phase 6 of the round-3 quality gate: crop-confidence-gated KF updates.
#
# The reference Kalman-updates every attempted crop track regardless of
# confidence (MC3D:1235); cfg.crop_conf_gate skips sub-sigma_c updates so
# occluded tracks coast on the prediction instead of chasing noise boxes.
# Reuses the SAME trained checkpoints as gate_cadence.sh and A/Bs the knob
# at the d=6(+nudge) candidate, where crop-branch drift dominates quality.
#
# Usage: gate_conf_gate.sh [pid-to-wait-for]
set -u
cd /root/repo
. scripts/lib.sh

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

MAX_TRY=3
DET=_outputs/mc_det.npz
CROP=_outputs/mc_crop.npz
[ -f "$DET" ] && [ -f "$CROP" ] || { echo "gate checkpoints missing" >&2; exit 1; }

COMMON="--det-ckpt $DET --crop-ckpt $CROP --batch 4 --frames 120 \
  --cd-max 8 --sequences 3 --track-seeds 2 --depth 18"

run() {
  tag=$1; shift
  for try in $(seq 1 $MAX_TRY); do
    wait_for_tpu || exit 1
    echo "=== $tag attempt $try: $* ($(date)) ==="
    # shellcheck disable=SC2086
    if timeout 5400 python -m playground3d_tpu.apps.demo_e2e_mc $COMMON "$@" \
      >"_outputs/gate_${tag}.log" 2>&1; then
      tail -12 "_outputs/gate_${tag}.log"
      return 0
    fi
  done
  echo "$tag never completed" >&2
}

echo "=== crop-conf-gate quality gate ($(date)) ==="
run d6_nudge_cgate --det-step 6 --quantize --approx-topk --size-nudge --crop-conf-gate --out-prefix _outputs/g6ncg
run d3_cgate       --det-step 3 --quantize --approx-topk --crop-conf-gate --out-prefix _outputs/g3cg
echo "crop-conf-gate gates done at $(date)"
