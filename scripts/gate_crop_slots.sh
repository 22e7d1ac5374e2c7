#!/bin/bash
# Phase 5 of the round-3 quality gate: crop-slot pool quality A/B.
#
# Reuses the SAME trained checkpoints as gate_cadence.sh (mc_det/mc_crop)
# and measures what capping the cropped-slot pool at 16 (vs all-32) costs
# in MOTA at the shipped d=3 and the d=6(+nudge) candidate — the quality
# side of the fps lever that scripts/bench_crop_slots.sh measures.
#
# Usage: gate_crop_slots.sh [pid-to-wait-for]
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

echo "=== crop-slot quality gate ($(date)) ==="
run d3_slots16       --det-step 3 --crop-slots 16 --quantize --approx-topk --out-prefix _outputs/g3s16
run d6_nudge_slots16 --det-step 6 --crop-slots 16 --quantize --approx-topk --size-nudge --out-prefix _outputs/g6ns16
echo "crop-slot gates done at $(date)"
