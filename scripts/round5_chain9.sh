#!/bin/bash
# Round-5 chain, phase 9 (supersedes chain8 after its gate BLOCKED).
#
# chain8's f_init=8 + f_max=12 candidate failed its own premise: f_max=12
# keeps junk alive ~12 failed attempts, i.e. PAST the 8-frame burn-in, so
# junk still reached the CSV (seed1000 r5 fell to 0.244, paired dMOTA
# -0.075 — worse than plain d6s2's -0.037), while every true track lost
# its first 8 frames of reported coverage (~-0.05 MOTA on 120-frame clips).
#
# chain9 gates the structural fix instead — tentative-kill
# (TrackerConfig.tentative_age, tracker_state.lifecycle): a track's FIRST
# failed re-detection attempt while age <= 4 is fatal and ghost-free. Junk
# born from a single false detection dies in 1-2 frames, inside the
# default f_init=2 burn-in, so it never reaches the CSV; confirmed tracks
# keep full coverage AND the full f_max budget (covered by
# tests/test_tracker.py::test_tentative_kill_rule). f_init/f_max stay at
# the d3-tuned defaults — one knob isolates the effect.
set -u
cd /root/repo
. scripts/sprint_lib.sh

sprint_deadline "${CHAIN_BUDGET:-6600}"

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

run_stage gate_d6s2_nudge_gate_ta4 1500 2700 \
  _outputs/gate_d6s2_nudge_gate_ta4.log \
  python -m playground3d_tpu.apps.demo_e2e_mc "${COMMON[@]}" \
  --out-prefix _outputs/gt_d6s2ta4 --det-step 6 --skip-step 2 \
  --size-nudge --crop-conf-gate --tentative-age 4

bench_candidate d6s2_nudge_gate_ta4 _outputs/bench_candidates.log \
  BENCH_DET_STEP=6 BENCH_SKIP_STEP=2 BENCH_SIZE_NUDGE=1 \
  BENCH_CROP_CONF_GATE=1 BENCH_TENTATIVE_AGE=4

decide

# upside only if the d6s2 candidate certified: s=3 (908 fps by the fm12
# bench) with the same tentative-kill lever
if [ -n "$(shipped_tag)" ]; then
  run_stage gate_d6s3_nudge_gate_ta4 1500 2700 \
    _outputs/gate_d6s3_nudge_gate_ta4.log \
    python -m playground3d_tpu.apps.demo_e2e_mc "${COMMON[@]}" \
    --out-prefix _outputs/gt_d6s3ta4 --det-step 6 --skip-step 3 \
    --size-nudge --crop-conf-gate --tentative-age 4
  bench_candidate d6s3_nudge_gate_ta4 _outputs/bench_candidates.log \
    BENCH_DET_STEP=6 BENCH_SKIP_STEP=3 BENCH_SIZE_NUDGE=1 \
    BENCH_CROP_CONF_GATE=1 BENCH_TENTATIVE_AGE=4
  decide
fi

python scripts/summarize_gate.py _outputs >_outputs/gate_summary.md 2>&1 || true

bench_candidate final_shipped _outputs/bench_candidates.log

# ---- follow-up evidence (round-4 verdict items 5/6 + weak #3) ----

run_stage bench_mc_c8 600 1800 _outputs/bench_mc_c8.log \
  python scripts/bench_mc.py --cameras 8

run_stage bench_mc_c18 600 1800 _outputs/bench_mc_c18.log \
  python scripts/bench_mc.py --cameras 18 --max-tracks 128 --crop-slots 64

run_stage r50_smoke 900 2400 _outputs/r50_smoke.log \
  python -m playground3d_tpu.apps.train_detector --steps 300 --batch 2 \
  --depth 50 --height 1080 --width 1920 --steps-per-epoch 100 \
  --out _outputs/r50_smoke.npz

run_stage bench_scale 1200 3600 _outputs/bench_scale_stage.log \
  bash scripts/bench_scale.sh

run_stage bench_mc_c8_d6 600 1800 _outputs/bench_mc_c8_d6.log \
  python scripts/bench_mc.py --cameras 8 --det-step 6

python scripts/summarize_gate.py _outputs >_outputs/gate_summary.md 2>&1 || true
decide
note "chain9 complete"
