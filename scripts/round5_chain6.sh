#!/bin/bash
# Round-5 chain, phase 6 (conditional): gate ONE more candidate against the
# already-captured 15-run d3 baseline (chain5's _outputs/gate_d3.log), bench
# it, and re-run the ship decision.  Used when chain5 shows the crop_r2_size
# de-weighting rescues d6s2 quality — the same fold applied to the faster
# d6s3/d8s2 cadences (~900 fps measured) is then worth one more gate.
#
# Usage:
#   CAND_TAG=d6s3_nudge_gate_fmax12_r2s25 \
#   CAND_FLAGS="--det-step 6 --skip-step 3 --size-nudge --crop-conf-gate --f-max 12 --crop-r2-size 25" \
#   CAND_ENV="BENCH_DET_STEP=6 BENCH_SKIP_STEP=3 BENCH_SIZE_NUDGE=1 BENCH_CROP_CONF_GATE=1 BENCH_F_MAX=12 BENCH_CROP_R2_SIZE=25" \
#   round5_chain6.sh
set -u
cd /root/repo
. scripts/sprint_lib.sh

: "${CAND_TAG:?set CAND_TAG}"
: "${CAND_FLAGS:?set CAND_FLAGS}"
: "${CAND_ENV:?set CAND_ENV}"

sprint_deadline "${CHAIN_BUDGET:-5400}"

DET=_outputs/mc_det.npz
CROP=_outputs/mc_crop.npz
COMMON=(--det-ckpt "$DET" --crop-ckpt "$CROP" --batch 4 --frames 120
        --cd-max 8 --sequences 5 --track-seeds 3 --depth 18
        --quantize --approx-topk)

# shellcheck disable=SC2086 — CAND_FLAGS is intentionally word-split
run_stage "gate_${CAND_TAG}" 1500 7200 "_outputs/gate_${CAND_TAG}.log" \
  python -m playground3d_tpu.apps.demo_e2e_mc "${COMMON[@]}" \
  --out-prefix "_outputs/gy_${CAND_TAG}" $CAND_FLAGS

python scripts/summarize_gate.py _outputs >_outputs/gate_summary.md 2>&1 || true

# shellcheck disable=SC2086
bench_candidate "$CAND_TAG" _outputs/bench_candidates.log $CAND_ENV

python scripts/ship_decision.py _outputs --commit \
  >_outputs/ship_decision.json 2>_outputs/ship_decision.err || true
note "ship decision: $(python -c "import json;print(json.load(open('_outputs/ship_decision.json'))['decision'])" 2>/dev/null || echo parse-failed)"

bench_candidate final_shipped _outputs/bench_candidates.log
note "chain6 complete"
