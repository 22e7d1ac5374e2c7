#!/bin/bash
# Round-5 chain, phase 2: the cadence/death-rule candidates motivated by the
# phase-gradient diagnosis (position error and misses grow monotonically
# with frames-since-detection; f_max=5 kills a track whose crops miss within
# ONE d=6 detection gap). Gates + benches for:
#   d6_nudge_gate_fmax12  — give tracks ~2 detection gaps to be rescued
#   d5_nudge_gate_fmax10  — intermediate cadence (~500 fps by clip algebra)
#   d4_nudge_gate_fmax8   — intermediate cadence (~450 fps)
# then re-runs ship_decision and the final default capture.
#
# Waits for round5_chain.sh (pass its PID as $1) before touching the TPU.
set -u
cd /root/repo
. scripts/sprint_lib.sh

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

sprint_deadline "${CHAIN_BUDGET:-14400}"

DET=_outputs/mc_det.npz
CROP=_outputs/mc_crop.npz
COMMON=(--det-ckpt "$DET" --crop-ckpt "$CROP" --batch 4 --frames 120
        --cd-max 8 --sequences 3 --track-seeds 2 --depth 18
        --quantize --approx-topk)

gate() {
  local tag=$1 prefix=$2
  shift 2
  run_stage "gate_$tag" 1500 5400 "_outputs/gate_${tag}.log" \
    python -m playground3d_tpu.apps.demo_e2e_mc "${COMMON[@]}" \
    --out-prefix "_outputs/$prefix" "$@"
}

gate d6_nudge_gate_fmax12 g6ngf12 --det-step 6 --size-nudge --crop-conf-gate --f-max 12
gate d5_nudge_gate_fmax10 g5ngf10 --det-step 5 --size-nudge --crop-conf-gate --f-max 10
gate d4_nudge_gate_fmax8  g4ngf8  --det-step 4 --size-nudge --crop-conf-gate --f-max 8

python scripts/summarize_gate.py _outputs >_outputs/gate_summary.md 2>&1 || true

BLOG=_outputs/bench_candidates.log
echo "=== round-5 chain2 bench candidates ($(date)) ===" >>"$BLOG"
bench_candidate d6_nudge_gate_fmax12 "$BLOG" BENCH_DET_STEP=6 BENCH_SIZE_NUDGE=1 BENCH_CROP_CONF_GATE=1 BENCH_F_MAX=12
bench_candidate d5_nudge_gate_fmax10 "$BLOG" BENCH_DET_STEP=5 BENCH_SIZE_NUDGE=1 BENCH_CROP_CONF_GATE=1 BENCH_F_MAX=10
bench_candidate d4_nudge_gate_fmax8  "$BLOG" BENCH_DET_STEP=4 BENCH_SIZE_NUDGE=1 BENCH_CROP_CONF_GATE=1 BENCH_F_MAX=8

python scripts/ship_decision.py _outputs --commit \
  >_outputs/ship_decision.json 2>_outputs/ship_decision.err || true
note "ship decision: $(python -c "import json;print(json.load(open('_outputs/ship_decision.json'))['decision'])" 2>/dev/null || echo parse-failed)"

bench_candidate final_shipped "$BLOG"
note "chain2 complete"
