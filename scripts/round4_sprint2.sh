#!/bin/bash
# Trimmed continuation of round4_sprint.sh: the 0.5 s/step training rate
# makes 1200/700 steps bust the wall budget, so phase 1 resumes from the
# 500-step detector sidecar and trains the crop net only 300 steps, keeping
# the full 3 sequences x 2 seeds eval spread for the A/B.
set -u
cd /root/repo
LOG=_outputs/sprint.log
DEADLINE=${1:?deadline epoch}

note() { echo "[$(date +%H:%M:%S)] $*" >>"$LOG"; }
left() { echo $((DEADLINE - $(date +%s))); }

# run <need> <timeout> <tag> <log> cmd... — see round4_sprint.sh: redirection
# happens after the deadline check (a SKIP leaves prior evidence untouched);
# log "-" appends a headered section to $BLOG only when the command runs.
run() {
  local need=$1 tmo=$2 tag=$3 log=$4 rc tmp
  shift 4
  if [ "$(left)" -lt "$need" ]; then note "SKIP $tag (only $(left)s left, need $need)"; return 1; fi
  note "START $tag: $*"
  if [ "$log" = "-" ]; then
    echo "--- $tag: $* ($(date))" >>"$BLOG"
    timeout "$tmo" "$@" >>"$BLOG" 2>&1
    rc=$?
  else
    tmp="$log.tmp-$$"
    timeout "$tmo" "$@" >"$tmp" 2>&1
    rc=$?
    mv -f "$tmp" "$log"
  fi
  note "DONE  $tag rc=$rc"
  return $rc
}

note "sprint2 start, deadline in $(left)s (trimmed: det 500 resume, crop 300)"
BLOG=_outputs/bench_candidates.log

run 300 1500 gate_d3 _outputs/gate_d3.log \
  python -m playground3d_tpu.apps.demo_e2e_mc \
  --steps 500 --crop-steps 300 --batch 4 --frames 120 \
  --det-step 3 --cd-max 8 --quantize --approx-topk \
  --sequences 3 --track-seeds 2 --resume \
  --out-prefix _outputs/mc

COMMON="--det-ckpt _outputs/mc_det.npz --crop-ckpt _outputs/mc_crop.npz \
  --batch 4 --frames 120 --cd-max 8 --sequences 3 --track-seeds 2 --depth 18"

run 240 1200 gate_d6_nudge _outputs/gate_d6_nudge.log \
  python -m playground3d_tpu.apps.demo_e2e_mc $COMMON \
  --det-step 6 --quantize --approx-topk --size-nudge \
  --out-prefix _outputs/g6n

run 180 800 d6_nudge - env BENCH_DET_STEP=6 BENCH_SIZE_NUDGE=1 \
  BENCH_TPU_WAIT_SECS=60 BENCH_RUN_TIMEOUT=700 python bench.py

python scripts/summarize_gate.py _outputs >_outputs/gate_summary.md 2>&1
python scripts/ship_decision.py >_outputs/ship_decision.json 2>&1
note "ship decision (pass 1) written"

run 240 1000 gate_d6s2_nudge _outputs/gate_d6s2_nudge.log \
  python -m playground3d_tpu.apps.demo_e2e_mc $COMMON \
  --det-step 6 --skip-step 2 --quantize --approx-topk --size-nudge \
  --out-prefix _outputs/g6s2 \
&& run 180 700 d6s2_nudge - env BENCH_DET_STEP=6 BENCH_SKIP_STEP=2 BENCH_SIZE_NUDGE=1 \
     BENCH_TPU_WAIT_SECS=60 BENCH_RUN_TIMEOUT=600 python bench.py

run 200 800 eval_ap _outputs/eval_ap.md \
  python scripts/eval_ap.py --ckpt _outputs/mc_det.npz --frames 64

python scripts/summarize_gate.py _outputs >_outputs/gate_summary.md 2>&1
python scripts/ship_decision.py >_outputs/ship_decision.json 2>&1
note "sprint2 done with $(left)s to spare"
