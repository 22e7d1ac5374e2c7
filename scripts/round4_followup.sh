#!/bin/bash
# Round-4 follow-up: runs after the round-3 gate chain's last link
# (gate_conf_gate.sh) finishes. Collects everything the ship decision and
# QUALITY.md need in one pass:
#
#   1. summarize_gate.py     -> _outputs/gate_summary.md  (mean+-std tables)
#   2. eval_ap.py            -> _outputs/eval_ap.md       (per-class AP, bf16+int8)
#   3. ab_crop_kernels.py    -> _outputs/ab_crop.log      (pallas vs crop_mxu on-chip)
#   4. bench_scale.sh        -> _outputs/bench_scale.log  (fps vs pool capacity)
#   5. profile_clip @ d6/16  -> _outputs/profile_d6.log   (crop-frame cost)
#
# Usage: round4_followup.sh [pid-to-wait-for]
set -u
cd /root/repo
. scripts/lib.sh

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

echo "=== round4 followup start ($(date)) ===" >_outputs/followup.log

run() {
  tag=$1; shift
  wait_for_tpu || { echo "$tag: TPU never came back" >>_outputs/followup.log; return 1; }
  echo "--- $tag: $* ($(date))" >>_outputs/followup.log
  # shellcheck disable=SC2068
  timeout 3600 $@ >"_outputs/${tag}" 2>&1
  echo "--- $tag rc=$? ($(date))" >>_outputs/followup.log
}

python scripts/summarize_gate.py _outputs >_outputs/gate_summary.md 2>&1
run eval_ap.md      python scripts/eval_ap.py --ckpt _outputs/mc_det.npz --frames 64
run ab_crop.log     python scripts/ab_crop_kernels.py
bash scripts/bench_scale.sh >>_outputs/followup.log 2>&1
run profile_d6.log  env PROFILE_DET_STEP=6 PROFILE_CROP_SLOTS=16 python scripts/profile_clip.py
# ghost re-id quality A/B at the shipped d=3 config (summarize_gate.py
# picks up gate_*.log): does reclaiming occluded ids move MOTA/IDs?
run gate_ghost10.log python -m playground3d_tpu.apps.demo_e2e_mc \
  --det-ckpt _outputs/mc_det.npz --crop-ckpt _outputs/mc_crop.npz \
  --batch 4 --frames 120 --cd-max 8 --sequences 3 --track-seeds 2 \
  --depth 18 --det-step 3 --quantize --approx-topk --ghost-frames 10 \
  --out-prefix _outputs/gg
python scripts/summarize_gate.py _outputs >_outputs/gate_summary.md 2>&1
# autonomous ship step: pick the fastest quality-SHIPPABLE candidate and
# commit it as bench.py's default config (bench_config.json)
python scripts/ship_decision.py --commit >>_outputs/followup.log 2>&1
echo "=== round4 followup done ($(date)) ===" >>_outputs/followup.log
