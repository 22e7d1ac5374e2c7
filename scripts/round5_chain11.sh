#!/bin/bash
# Round-5 chain, phase 11: the cadence upside ladder past d6s3.
#
# tentative-kill (tentative_age=4) swung d6s2 from blocked (-0.037) to
# SHIPPABLE (+0.072 paired dMOTA) because it kills single-false-detection
# junk before it reaches the CSV. The same lever plausibly rescues the
# faster cadences that were only mildly blocked WITHOUT it:
#   d8s2 + fmax12: 885.9 fps, dMOTA -0.048 +- 0.084
#   d6s3 + fmax12: 907.8 fps, dMOTA -0.012 +- 0.087 (chain10 gates d6s3_ta4)
# Ladder, each rung gated only if the previous one actually shipped
# (ship_decision.py ranks d12s3 > d8s3 > d8s2 > d6s3 > d6s2):
#   rung 1: d8s3_ta4  (detect 1/8, crops 1/3 — beyond both measured points)
#   rung 2: d12s3_ta4 (stretch; detect 1/12)
# A rung that gates blocked leaves bench_config.json at the last certified
# config — ship_decision only moves forward on a SHIPPABLE verdict.
set -u
cd /root/repo
. scripts/sprint_lib.sh

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

sprint_deadline "${CHAIN_BUDGET:-10800}"

DET=_outputs/mc_det.npz
CROP=_outputs/mc_crop.npz
COMMON=(--det-ckpt "$DET" --crop-ckpt "$CROP" --batch 4 --frames 120
        --cd-max 8 --sequences 5 --track-seeds 3 --depth 18
        --quantize --approx-topk)

decide() {
  python scripts/ship_decision.py _outputs --commit \
    >_outputs/ship_decision.json 2>_outputs/ship_decision.err || true
  note "ship decision: $(python -c "import json;print(json.load(open('_outputs/ship_decision.json'))['decision'])" 2>/dev/null || echo parse-failed)"
}

shipped_tag() {
  python -c "import json;d=json.load(open('_outputs/ship_decision.json'));s=d.get('shipped');print(s['tag'] if s else '')" 2>/dev/null
}

# rung 1: d8s3_ta4 — only worth the chip time if the s=3 lever certified
# at d=6 (chain10); otherwise s=3 is the blocked axis, not d.
if [ "$(shipped_tag)" = "d6s3_nudge_gate_ta4" ]; then
  run_stage gate_d8s3_nudge_gate_ta4 1500 2700 \
    _outputs/gate_d8s3_nudge_gate_ta4.log \
    python -m playground3d_tpu.apps.demo_e2e_mc "${COMMON[@]}" \
    --out-prefix _outputs/gt_d8s3ta4 --det-step 8 --skip-step 3 \
    --size-nudge --crop-conf-gate --tentative-age 4
  bench_candidate d8s3_nudge_gate_ta4 _outputs/bench_candidates.log \
    BENCH_DET_STEP=8 BENCH_SKIP_STEP=3 BENCH_SIZE_NUDGE=1 \
    BENCH_CROP_CONF_GATE=1 BENCH_TENTATIVE_AGE=4
  decide
else
  # d6s3_ta4 did not ship: probe the d-axis instead at the certified s=2
  # (d8s2_ta4, 886 fps-class), same conditional logic.
  run_stage gate_d8s2_nudge_gate_ta4 1500 2700 \
    _outputs/gate_d8s2_nudge_gate_ta4.log \
    python -m playground3d_tpu.apps.demo_e2e_mc "${COMMON[@]}" \
    --out-prefix _outputs/gt_d8s2ta4 --det-step 8 --skip-step 2 \
    --size-nudge --crop-conf-gate --tentative-age 4
  bench_candidate d8s2_nudge_gate_ta4 _outputs/bench_candidates.log \
    BENCH_DET_STEP=8 BENCH_SKIP_STEP=2 BENCH_SIZE_NUDGE=1 \
    BENCH_CROP_CONF_GATE=1 BENCH_TENTATIVE_AGE=4
  decide
fi

# rung 2: d12s3_ta4 stretch, only on top of a shipped d8s3
if [ "$(shipped_tag)" = "d8s3_nudge_gate_ta4" ]; then
  run_stage gate_d12s3_nudge_gate_ta4 1500 2700 \
    _outputs/gate_d12s3_nudge_gate_ta4.log \
    python -m playground3d_tpu.apps.demo_e2e_mc "${COMMON[@]}" \
    --out-prefix _outputs/gt_d12s3ta4 --det-step 12 --skip-step 3 \
    --size-nudge --crop-conf-gate --tentative-age 4
  bench_candidate d12s3_nudge_gate_ta4 _outputs/bench_candidates.log \
    BENCH_DET_STEP=12 BENCH_SKIP_STEP=3 BENCH_SIZE_NUDGE=1 \
    BENCH_CROP_CONF_GATE=1 BENCH_TENTATIVE_AGE=4
  decide
fi

bench_candidate final_shipped _outputs/bench_candidates.log
python scripts/summarize_gate.py _outputs >_outputs/gate_summary.md 2>&1 || true
decide
note "chain11 complete"
