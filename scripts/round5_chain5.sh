#!/bin/bash
# Round-5 chain, phase 5: the final ship call on expanded evidence.
#
# Chain3 left the ladder at: d6s2_nudge_gate MARGINAL (paired dMOTA -0.012
# sem 0.047 over 6 runs) at 771.8 fps, and the crop_r2_size de-weighting
# knob (commit 43d0a9c) never gated.  15 paired runs (5 scenes x 3 render
# seeds) tighten the sem ~1.6x so the sem-adjusted SHIPPABLE/blocked call
# is made on signal, for BOTH candidates against the SAME re-gated d3
# baseline run keys.
#
# Usage: round5_chain5.sh   (CHAIN_BUDGET env overrides the wall budget)
set -u
cd /root/repo
. scripts/sprint_lib.sh

sprint_deadline "${CHAIN_BUDGET:-10800}"

DET=_outputs/mc_det.npz
CROP=_outputs/mc_crop.npz
COMMON=(--det-ckpt "$DET" --crop-ckpt "$CROP" --batch 4 --frames 120
        --cd-max 8 --sequences 5 --track-seeds 3 --depth 18
        --quantize --approx-topk)

run_stage gate_d3 2400 7200 _outputs/gate_d3.log \
  python -m playground3d_tpu.apps.demo_e2e_mc "${COMMON[@]}" \
  --out-prefix _outputs/g3x --det-step 3

run_stage gate_d6s2_nudge_gate 2400 7200 _outputs/gate_d6s2_nudge_gate.log \
  python -m playground3d_tpu.apps.demo_e2e_mc "${COMMON[@]}" \
  --out-prefix _outputs/gx_d6s2ng --det-step 6 --skip-step 2 \
  --size-nudge --crop-conf-gate

run_stage gate_d6s2_nudge_gate_r2s25 2400 7200 \
  _outputs/gate_d6s2_nudge_gate_r2s25.log \
  python -m playground3d_tpu.apps.demo_e2e_mc "${COMMON[@]}" \
  --out-prefix _outputs/gx_d6s2ngr2 --det-step 6 --skip-step 2 \
  --size-nudge --crop-conf-gate --crop-r2-size 25

python scripts/summarize_gate.py _outputs >_outputs/gate_summary.md 2>&1 || true

# r2s25 is a constant fold of the d6s2 program (same shape) but has no
# measured fps row yet; capture one so the ship decision ranks on
# measurement, not clip algebra.
bench_candidate d6s2_nudge_gate_r2s25 _outputs/bench_candidates.log \
  BENCH_DET_STEP=6 BENCH_SKIP_STEP=2 BENCH_SIZE_NUDGE=1 \
  BENCH_CROP_CONF_GATE=1 BENCH_CROP_R2_SIZE=25

python scripts/ship_decision.py _outputs --commit \
  >_outputs/ship_decision.json 2>_outputs/ship_decision.err || true
note "ship decision: $(python -c "import json;print(json.load(open('_outputs/ship_decision.json'))['decision'])" 2>/dev/null || echo parse-failed)"

bench_candidate final_shipped _outputs/bench_candidates.log
note "chain5 complete"
