#!/bin/bash
# Round-5 certify-then-ship chain (VERDICT r4 #2/#3): resumable stages.
#
#   S1 (separate): scripts/train_r5.sh trains mc_{det,crop}.npz (5000/6000).
#   S2 gates: tracking-only A/Bs from the checkpoints — d3 baseline plus the
#      d>=6 candidates (size_nudge / crop_conf_gate / slots16 / s2).
#   S3 bench: bench.py fps at every candidate -> _outputs/bench_candidates.log
#   S4 eval_ap: per-class AP (bf16 + int8) -> _outputs/eval_ap.md
#   S5 ship_decision.py -> bench_config.json (+ commit) + final default bench.
#
# Every stage writes through run_stage/bench_candidate (scripts/sprint_lib.sh):
# SKIPped stages leave prior evidence untouched, and section headers land in
# the bench log only when bench.py actually ran.
set -u
cd /root/repo
. scripts/sprint_lib.sh

sprint_deadline "${CHAIN_BUDGET:-21600}"

DET=_outputs/mc_det.npz
CROP=_outputs/mc_crop.npz

# ---- wait for S1 (training) to reach its targets -----------------------------
note "waiting for training checkpoints (det>=5000, crop>=6000 steps)"
while :; do
  dstep=$(cat "$DET.step" 2>/dev/null || echo 0)
  cstep=$(cat "$CROP.step" 2>/dev/null || echo 0)
  if [ "$dstep" -ge 5000 ] && [ "$cstep" -ge 6000 ]; then
    note "training done (det=$dstep crop=$cstep)"
    break
  fi
  if [ "$(sprint_left)" -lt 3600 ]; then
    note "training still at det=$dstep crop=$cstep with <1h left; proceeding anyway"
    break
  fi
  sleep 120
done

# ---- S2: quality gates --------------------------------------------------------
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

gate d3                   g3     --det-step 3
gate d6_nudge             g6n    --det-step 6 --size-nudge
gate d6_nudge_gate        g6ng   --det-step 6 --size-nudge --crop-conf-gate
gate d6s2_nudge_gate      g6s2ng --det-step 6 --skip-step 2 --size-nudge --crop-conf-gate
gate d6_nudge_gate_slots16 g6ngs16 --det-step 6 --size-nudge --crop-conf-gate --crop-slots 16

python scripts/summarize_gate.py _outputs >_outputs/gate_summary.md 2>&1 || true
note "gate summary written"

# ---- S3: candidate fps --------------------------------------------------------
BLOG=_outputs/bench_candidates.log
echo "=== round-5 bench candidates ($(date)) ===" >>"$BLOG"
bench_candidate d3_shipped            "$BLOG"
bench_candidate d6_nudge              "$BLOG" BENCH_DET_STEP=6 BENCH_SIZE_NUDGE=1
bench_candidate d6_nudge_gate         "$BLOG" BENCH_DET_STEP=6 BENCH_SIZE_NUDGE=1 BENCH_CROP_CONF_GATE=1
bench_candidate d6s2_nudge_gate       "$BLOG" BENCH_DET_STEP=6 BENCH_SKIP_STEP=2 BENCH_SIZE_NUDGE=1 BENCH_CROP_CONF_GATE=1
bench_candidate d6_nudge_gate_slots16 "$BLOG" BENCH_DET_STEP=6 BENCH_SIZE_NUDGE=1 BENCH_CROP_CONF_GATE=1 BENCH_CROP_SLOTS=16

# ---- S4: per-class AP ---------------------------------------------------------
run_stage eval_ap 900 2400 _outputs/eval_ap.md \
  python scripts/eval_ap.py --ckpt "$DET" --depth 18 --frames 64

# ---- S5: ship decision + final default capture --------------------------------
python scripts/ship_decision.py _outputs --commit \
  >_outputs/ship_decision.json 2>_outputs/ship_decision.err || true
note "ship decision: $(python -c "import json;print(json.load(open('_outputs/ship_decision.json'))['decision'])" 2>/dev/null || echo parse-failed)"

bench_candidate final_shipped "$BLOG"
note "chain complete"
