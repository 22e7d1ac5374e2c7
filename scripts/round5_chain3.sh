#!/bin/bash
# Round-5 chain, phase 3: the crop-update-NOISE candidates. The s1->s2 gate
# pair showed crop updates were the d>=6 drift source (d6 s=1 MOTA 0.285 vs
# s=2 0.590 with the same nets): halving crop corrections let the KF coast
# past noisy boxes. These candidates push the same lever further — fewer
# crop updates per gap, longer f_max rescue windows — at clip-algebra rates
# of ~780-900 fps:
#   d6s2_nudge_gate_fmax12  (~780 fps, the MARGINAL d6s2 + the f_max fix)
#   d6s3_nudge_gate_fmax12  (~900 fps, one crop attempt per gap)
#   d8s2_nudge_gate_fmax12  (~900 fps, longer gaps, s=2 cadence)
# Waits for round5_chain2.sh (PID as $1).
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

gate d6s2_nudge_gate_fmax12 g6s2f12 --det-step 6 --skip-step 2 --size-nudge --crop-conf-gate --f-max 12
gate d6s2_nudge_gate_r2s25 g6s2r25 --det-step 6 --skip-step 2 --size-nudge --crop-conf-gate --crop-r2-size 25
gate d6s3_nudge_gate_fmax12 g6s3f12 --det-step 6 --skip-step 3 --size-nudge --crop-conf-gate --f-max 12
gate d8s2_nudge_gate_fmax12 g8s2f12 --det-step 8 --skip-step 2 --size-nudge --crop-conf-gate --f-max 12

python scripts/summarize_gate.py _outputs >_outputs/gate_summary.md 2>&1 || true

BLOG=_outputs/bench_candidates.log
echo "=== round-5 chain3 bench candidates ($(date)) ===" >>"$BLOG"
bench_candidate d6s2_nudge_gate_fmax12 "$BLOG" BENCH_DET_STEP=6 BENCH_SKIP_STEP=2 BENCH_SIZE_NUDGE=1 BENCH_CROP_CONF_GATE=1 BENCH_F_MAX=12
bench_candidate d6s2_nudge_gate_r2s25 "$BLOG" BENCH_DET_STEP=6 BENCH_SKIP_STEP=2 BENCH_SIZE_NUDGE=1 BENCH_CROP_CONF_GATE=1 BENCH_CROP_R2_SIZE=25
bench_candidate d6s3_nudge_gate_fmax12 "$BLOG" BENCH_DET_STEP=6 BENCH_SKIP_STEP=3 BENCH_SIZE_NUDGE=1 BENCH_CROP_CONF_GATE=1 BENCH_F_MAX=12
bench_candidate d8s2_nudge_gate_fmax12 "$BLOG" BENCH_DET_STEP=8 BENCH_SKIP_STEP=2 BENCH_SIZE_NUDGE=1 BENCH_CROP_CONF_GATE=1 BENCH_F_MAX=12

python scripts/ship_decision.py _outputs --commit \
  >_outputs/ship_decision.json 2>_outputs/ship_decision.err || true
note "ship decision: $(python -c "import json;print(json.load(open('_outputs/ship_decision.json'))['decision'])" 2>/dev/null || echo parse-failed)"
note "chain3 complete"
