#!/bin/bash
# Round-5 chain, phase 4: EXPANDED paired gates for the ship decision.
# The 6-run gates leave the winning candidate MARGINAL (paired sem ~0.05
# at dMOTA ~-0.01); 15 paired runs (5 scenes x 3 render seeds) tighten the
# sem ~1.6x so the sem-adjusted SHIPPABLE/blocked call is made on signal.
# Re-gates BOTH the d3 baseline and the candidate on the same run keys.
#
# Usage:
#   CAND_TAG=d6s2_nudge_gate_fmax12 \
#   CAND_FLAGS="--det-step 6 --skip-step 2 --size-nudge --crop-conf-gate --f-max 12" \
#   round5_chain4.sh [wait_pid]
set -u
cd /root/repo
. scripts/sprint_lib.sh

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

: "${CAND_TAG:?set CAND_TAG}"
: "${CAND_FLAGS:?set CAND_FLAGS}"

sprint_deadline "${CHAIN_BUDGET:-10800}"

DET=_outputs/mc_det.npz
CROP=_outputs/mc_crop.npz
COMMON=(--det-ckpt "$DET" --crop-ckpt "$CROP" --batch 4 --frames 120
        --cd-max 8 --sequences 5 --track-seeds 3 --depth 18
        --quantize --approx-topk)

run_stage gate_d3 2400 7200 _outputs/gate_d3.log \
  python -m playground3d_tpu.apps.demo_e2e_mc "${COMMON[@]}" \
  --out-prefix _outputs/g3x --det-step 3

# shellcheck disable=SC2086 — CAND_FLAGS is intentionally word-split
run_stage "gate_${CAND_TAG}" 2400 7200 "_outputs/gate_${CAND_TAG}.log" \
  python -m playground3d_tpu.apps.demo_e2e_mc "${COMMON[@]}" \
  --out-prefix "_outputs/gx_${CAND_TAG}" $CAND_FLAGS

python scripts/summarize_gate.py _outputs >_outputs/gate_summary.md 2>&1 || true

python scripts/ship_decision.py _outputs --commit \
  >_outputs/ship_decision.json 2>_outputs/ship_decision.err || true
note "ship decision: $(python -c "import json;print(json.load(open('_outputs/ship_decision.json'))['decision'])" 2>/dev/null || echo parse-failed)"

bench_candidate final_shipped _outputs/bench_candidates.log
note "chain4 complete"
