#!/bin/bash
# Round-4 TPU sprint: the tunnel is back but the wall clock is ~45 min, so
# this is the time-boxed version of the round-3/4 gate chain
# (gate_cadence.sh + bench_candidates.sh + ship_decision.py), one process,
# strictly serialized on the single chip, with an absolute deadline so the
# driver's end-of-round bench.py capture finds the chip free.
#
# Usage: round4_sprint.sh <deadline-epoch-seconds>
set -u
cd /root/repo
LOG=_outputs/sprint.log
DEADLINE=${1:?deadline epoch}
STEPS=${GATE_STEPS:-1200}
CROP_STEPS=${GATE_CROP_STEPS:-700}

note() { echo "[$(date +%H:%M:%S)] $*" >>"$LOG"; }
left() { echo $((DEADLINE - $(date +%s))); }

# run <budget-needed> <timeout> <tag> <log> cmd... : skip if not enough wall
# left. The redirection lives HERE, after the deadline check (ADVICE r4: call
# sites attached `>log` to the `run` invocation itself, so a SKIPped stage
# truncated the previous pass's evidence before run() executed). <log> "-"
# appends a "--- <tag>: ..." section to $BLOG — the ship_decision.py bench
# format — with the header emitted only once the command actually runs;
# otherwise output goes to a temp file promoted over <log> after execution.
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

: >"$LOG"
note "sprint start, deadline in $(left)s; steps=$STEPS/$CROP_STEPS"

# 1. baseline d3 fps (ship_decision needs d3_shipped to compare against)
BLOG=_outputs/bench_candidates.log
run 300 900 d3_shipped - env BENCH_TPU_WAIT_SECS=60 BENCH_RUN_TIMEOUT=780 \
  python bench.py

# 2. train det+crop nets (resumable; 500-step sidecars) + d3 quality gate
run 420 2400 gate_d3 _outputs/gate_d3.log \
  python -m playground3d_tpu.apps.demo_e2e_mc \
  --steps "$STEPS" --crop-steps "$CROP_STEPS" --batch 4 --frames 120 \
  --det-step 3 --cd-max 8 --quantize --approx-topk \
  --sequences 3 --track-seeds 2 --resume \
  --out-prefix _outputs/mc

COMMON="--det-ckpt _outputs/mc_det.npz --crop-ckpt _outputs/mc_crop.npz \
  --batch 4 --frames 120 --cd-max 8 --sequences 3 --track-seeds 2 --depth 18"

# 3. candidate quality A/Bs with the SAME nets (gate_cadence.sh phase 2)
run 300 1200 gate_d6_nudge _outputs/gate_d6_nudge.log \
  python -m playground3d_tpu.apps.demo_e2e_mc $COMMON \
  --det-step 6 --quantize --approx-topk --size-nudge \
  --out-prefix _outputs/g6n

# 4. candidate fps (same log format ship_decision parses)
run 240 800 d6_nudge - env BENCH_DET_STEP=6 BENCH_SIZE_NUDGE=1 \
  BENCH_TPU_WAIT_SECS=60 BENCH_RUN_TIMEOUT=700 python bench.py

python scripts/ship_decision.py >_outputs/ship_decision.json 2>&1
note "ship decision (pass 1) written"

# 5. stretch candidates, fastest-first, while budget remains
run 300 1200 gate_d6s2_nudge _outputs/gate_d6s2_nudge.log \
  python -m playground3d_tpu.apps.demo_e2e_mc $COMMON \
  --det-step 6 --skip-step 2 --quantize --approx-topk --size-nudge \
  --out-prefix _outputs/g6s2 \
&& run 240 800 d6s2_nudge - env BENCH_DET_STEP=6 BENCH_SKIP_STEP=2 BENCH_SIZE_NUDGE=1 \
     BENCH_TPU_WAIT_SECS=60 BENCH_RUN_TIMEOUT=700 python bench.py

run 180 600 gate_slots16 _outputs/gate_d6_nudge_slots16.log \
  python -m playground3d_tpu.apps.demo_e2e_mc $COMMON \
  --det-step 6 --quantize --approx-topk --size-nudge --crop-slots 16 \
  --out-prefix _outputs/g6n16 \
&& run 200 700 d6_nudge_slots16 - env BENCH_DET_STEP=6 BENCH_SIZE_NUDGE=1 BENCH_CROP_SLOTS=16 \
     BENCH_TPU_WAIT_SECS=60 BENCH_RUN_TIMEOUT=600 python bench.py

python scripts/summarize_gate.py _outputs >_outputs/gate_summary.md 2>&1
python scripts/ship_decision.py >_outputs/ship_decision.json 2>&1
note "sprint done with $(left)s to spare"
