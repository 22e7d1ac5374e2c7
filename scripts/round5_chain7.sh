#!/bin/bash
# Round-5 chain, phase 7: the intermediate-cadence candidates + follow-up
# evidence, sequenced on one chip.
#
# The 15-run gates blocked both d6s2 variants (paired dMOTA -0.037 for
# d6s2_nudge_gate; the r2s25 fold made it worse) — but skip_step=2 was the
# quality lever all along (plain d6 was -0.36).  d4s2/d5s2 halve the full-
# detection gap of d6s2 (clip algebra ~600/~650 fps vs the 500 target), so
# they are the remaining honest ship candidates.  Gates run against chain5's
# 15-run d3 baseline (_outputs/gate_d3.log, same run keys).
#
# Then the round-4 verdict's remaining evidence: C=8/C=18 multi-cam rows,
# the pool-capacity sweep, and the resnet50@1080p training smoke.
#
# Usage: round5_chain7.sh   (polls for chain5's completion marker first)
set -u
cd /root/repo
. scripts/sprint_lib.sh

CHAIN_LOG=_outputs/chain5_r5.log
for _ in $(seq 1 120); do
  grep -q "chain5 complete" "$CHAIN_LOG" 2>/dev/null && break
  sleep 60
done
grep -q "chain5 complete" "$CHAIN_LOG" || echo "WARN: chain5 marker never appeared; proceeding anyway"

sprint_deadline "${CHAIN_BUDGET:-9000}"

DET=_outputs/mc_det.npz
CROP=_outputs/mc_crop.npz
COMMON=(--det-ckpt "$DET" --crop-ckpt "$CROP" --batch 4 --frames 120
        --cd-max 8 --sequences 5 --track-seeds 3 --depth 18
        --quantize --approx-topk)

run_stage gate_d4s2_nudge_gate 1500 7200 _outputs/gate_d4s2_nudge_gate.log \
  python -m playground3d_tpu.apps.demo_e2e_mc "${COMMON[@]}" \
  --out-prefix _outputs/gz_d4s2ng --det-step 4 --skip-step 2 \
  --size-nudge --crop-conf-gate

run_stage gate_d5s2_nudge_gate 1500 7200 _outputs/gate_d5s2_nudge_gate.log \
  python -m playground3d_tpu.apps.demo_e2e_mc "${COMMON[@]}" \
  --out-prefix _outputs/gz_d5s2ng --det-step 5 --skip-step 2 \
  --size-nudge --crop-conf-gate

python scripts/summarize_gate.py _outputs >_outputs/gate_summary.md 2>&1 || true

bench_candidate d4s2_nudge_gate _outputs/bench_candidates.log \
  BENCH_DET_STEP=4 BENCH_SKIP_STEP=2 BENCH_SIZE_NUDGE=1 BENCH_CROP_CONF_GATE=1

bench_candidate d5s2_nudge_gate _outputs/bench_candidates.log \
  BENCH_DET_STEP=5 BENCH_SKIP_STEP=2 BENCH_SIZE_NUDGE=1 BENCH_CROP_CONF_GATE=1

python scripts/ship_decision.py _outputs --commit \
  >_outputs/ship_decision.json 2>_outputs/ship_decision.err || true
note "ship decision: $(python -c "import json;print(json.load(open('_outputs/ship_decision.json'))['decision'])" 2>/dev/null || echo parse-failed)"

bench_candidate final_shipped _outputs/bench_candidates.log

# ---- follow-up evidence (round-4 verdict items 5/6 + weak #3) ----

run_stage bench_mc_c8 600 1800 _outputs/bench_mc_c8.log \
  python scripts/bench_mc.py --cameras 8

run_stage bench_mc_c8_d6 600 1800 _outputs/bench_mc_c8_d6.log \
  python scripts/bench_mc.py --cameras 8 --det-step 6

run_stage bench_mc_c18 600 1800 _outputs/bench_mc_c18.log \
  python scripts/bench_mc.py --cameras 18 --max-tracks 128 --crop-slots 64

run_stage bench_scale 1500 3600 _outputs/bench_scale_stage.log \
  bash scripts/bench_scale.sh

run_stage r50_smoke 900 2400 _outputs/r50_smoke.log \
  python -m playground3d_tpu.apps.train_detector --steps 300 --batch 2 \
  --depth 50 --height 1080 --width 1920 --steps-per-epoch 100 \
  --out _outputs/r50_smoke.npz

note "chain7 complete"
