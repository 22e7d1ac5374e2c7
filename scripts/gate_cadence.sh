#!/bin/bash
# Round-3 hardened quality gate (VERDICT r2 #2/#4), tunnel-hang resilient.
#
# Phase 1: train the 5000-step detector + 3000-step crop net (warm-starting
#   from the periodic _outputs/mc_{det,crop}.npz checkpoints with --resume,
#   so tunnel hangs cost at most ~500 steps) and run the d=3 shipped-config
#   A/B over 3 sequences x 2 render seeds  -> _outputs/gate_d3.log
# Phase 2: reuse the SAME checkpoints for the cadence/quantization A/Bs:
#   d=6, d=6+size_nudge, d=6 s=2 + nudge, d=3 bf16.
#
# Each phase retries up to MAX_TRY times on timeout/failure; training
# progress is monotonic thanks to --resume.
set -u
cd /root/repo
. scripts/lib.sh

MAX_TRY=4
DET=_outputs/mc_det.npz
CROP=_outputs/mc_crop.npz


train_cmd() {
  timeout 9000 python -m playground3d_tpu.apps.demo_e2e_mc \
    --steps 5000 --crop-steps 3000 --batch 4 --frames 120 \
    --det-step 3 --cd-max 8 --quantize --approx-topk \
    --sequences 3 --track-seeds 2 --resume \
    --out-prefix /root/repo/_outputs/mc \
    >>_outputs/gate_d3.log 2>&1
}

echo "=== phase 1: train + d3 gate ($(date)) ==="
ok=0
for try in $(seq 1 $MAX_TRY); do
  wait_for_tpu || exit 1
  echo "--- phase-1 attempt $try ($(date)) ---" >>_outputs/gate_d3.log
  if train_cmd; then ok=1; break; fi
  echo "phase-1 attempt $try failed/timed out ($(date))"
done
[ $ok -eq 1 ] || { echo "phase 1 never completed" >&2; exit 1; }
tail -15 _outputs/gate_d3.log

COMMON="--det-ckpt $DET --crop-ckpt $CROP --batch 4 --frames 120 \
  --cd-max 8 --sequences 3 --track-seeds 2 --depth 18"

run() {
  tag=$1; shift
  for try in $(seq 1 $MAX_TRY); do
    wait_for_tpu || exit 1
    echo "=== $tag attempt $try: $* ($(date)) ==="
    if timeout 5400 python -m playground3d_tpu.apps.demo_e2e_mc $COMMON "$@" \
      >"_outputs/gate_${tag}.log" 2>&1; then
      tail -12 "_outputs/gate_${tag}.log"
      return 0
    fi
  done
  echo "$tag never completed" >&2
}

echo "=== phase 2: cadence A/Bs ($(date)) ==="
run d6         --det-step 6 --quantize --approx-topk --out-prefix _outputs/g6
run d6_nudge   --det-step 6 --quantize --approx-topk --size-nudge --out-prefix _outputs/g6n
run d6s2_nudge --det-step 6 --skip-step 2 --quantize --approx-topk --size-nudge --out-prefix _outputs/g6s2
run d3_bf16    --det-step 3 --out-prefix _outputs/g3bf
echo "all cadence gates done at $(date)"
