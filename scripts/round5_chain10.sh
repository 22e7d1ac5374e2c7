#!/bin/bash
# Round-5 chain, phase 10: recover the upside branch chain9 lost.
#
# chain9's decide() wrote ship_decision.json through a stdout redirect that
# ALSO caught `git commit`'s stdout (ship_decision.py bug, now fixed), so
# json.load failed, shipped_tag() returned empty, and the conditional
# d6s3_nudge_gate_ta4 upside gate never ran — even though d6s2_ta4 had just
# certified SHIPPABLE (dMOTA +0.072) at 770.8 fps and the same lever at
# s=3 benches 907.8 fps (chain7's fmax12 s=3 run was only MARGINAL without
# tentative-kill: dMOTA -0.012 ± 0.087).
#
# This chain:
#   1. waits for the chain9 process (passed as $1) to exit — PID poll, not
#      a completion marker (ROUND_NOTES lesson from the chain5 stall);
#   2. gates d6s3_nudge_gate_ta4 (the 908 fps candidate), benches it,
#      re-runs ship_decision (PERF_CANDIDATES already ranks it first);
#   3. back-fills any follow-up evidence stage chain9's budget skipped,
#      judged by artifact content, not by how chain9 ended.
set -u
cd /root/repo
. scripts/sprint_lib.sh

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

sprint_deadline "${CHAIN_BUDGET:-9600}"

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

# evidence_missing <log> <success-marker-regex>
evidence_missing() {
  [ ! -s "$1" ] || ! grep -q "$2" "$1"
}

run_stage gate_d6s3_nudge_gate_ta4 1500 2700 \
  _outputs/gate_d6s3_nudge_gate_ta4.log \
  python -m playground3d_tpu.apps.demo_e2e_mc "${COMMON[@]}" \
  --out-prefix _outputs/gt_d6s3ta4 --det-step 6 --skip-step 3 \
  --size-nudge --crop-conf-gate --tentative-age 4

bench_candidate d6s3_nudge_gate_ta4 _outputs/bench_candidates.log \
  BENCH_DET_STEP=6 BENCH_SKIP_STEP=3 BENCH_SIZE_NUDGE=1 \
  BENCH_CROP_CONF_GATE=1 BENCH_TENTATIVE_AGE=4

decide
bench_candidate final_shipped _outputs/bench_candidates.log

# ---- back-fill chain9 follow-up evidence the budget may have skipped ----

if evidence_missing _outputs/bench_mc_c8.log "multi-cam frames/s"; then
  run_stage bench_mc_c8 600 1800 _outputs/bench_mc_c8.log \
    python scripts/bench_mc.py --cameras 8
fi

if evidence_missing _outputs/bench_mc_c18.log "multi-cam frames/s"; then
  run_stage bench_mc_c18 600 1800 _outputs/bench_mc_c18.log \
    python scripts/bench_mc.py --cameras 18 --max-tracks 128 --crop-slots 64
fi

if evidence_missing _outputs/r50_smoke.log "final checkpoint"; then
  run_stage r50_smoke 900 2400 _outputs/r50_smoke.log \
    python -m playground3d_tpu.apps.train_detector --steps 300 --batch 2 \
    --depth 50 --height 1080 --width 1920 --steps-per-epoch 100 \
    --out _outputs/r50_smoke.npz
fi

if evidence_missing _outputs/bench_scale.log "bench scale done"; then
  run_stage bench_scale 1200 3600 _outputs/bench_scale_stage.log \
    bash scripts/bench_scale.sh
fi

if evidence_missing _outputs/bench_mc_c8_d6.log "multi-cam frames/s"; then
  run_stage bench_mc_c8_d6 600 1800 _outputs/bench_mc_c8_d6.log \
    python scripts/bench_mc.py --cameras 8 --det-step 6
fi

python scripts/summarize_gate.py _outputs >_outputs/gate_summary.md 2>&1 || true
decide
note "chain10 complete"
