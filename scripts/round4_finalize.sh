#!/bin/bash
# Final autonomous link of the round-4 chain: once round4_followup.sh is
# done (gate summaries, AP eval, crop-kernel A/B, scale bench, ship
# decision), assemble and COMMIT the round's durable artifacts so a late
# TPU return still lands everything without a human:
#
#   1. scripts/make_quality.py  -> QUALITY.md (per-class AP + MOT mean±std
#      tables from the long-trained checkpoints; round-3 VERDICT #5)
#   2. snapshot the trained checkpoints into checkpoints/ (repo-committed
#      quality anchor — every future perf lever A/Bs against these)
#   3. one bench.py run at the shipped config -> _outputs/bench_shipped.log
#      (pre-round-end evidence; the driver's own BENCH_r04 capture is the
#      number of record)
#   4. git commit QUALITY.md + checkpoints (+ bench_config.json if the ship
#      decision changed it and didn't commit already)
#
# Usage: round4_finalize.sh [pid-to-wait-for]
set -u
cd /root/repo
. scripts/lib.sh

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

echo "=== round4 finalize start ($(date)) ===" >>_outputs/followup.log

if ! python scripts/make_quality.py >>_outputs/followup.log 2>&1; then
  echo "finalize: make_quality inputs missing; nothing to commit" >>_outputs/followup.log
  exit 0
fi

mkdir -p checkpoints
for f in mc_det.npz mc_det.npz.step mc_crop.npz mc_crop.npz.step; do
  [ -f "_outputs/$f" ] && cp "_outputs/$f" "checkpoints/$f"
done

git add QUALITY.md checkpoints bench_config.json 2>/dev/null
if ! git diff --cached --quiet; then
  git commit -m "Quality anchor: QUALITY.md + long-trained gate checkpoints

Per-class AP (bf16 + shipped int8) and MOT mean+-std tables over
sequences x seeds from the 5000-step detector / 3000-step crop net;
checkpoints committed so every future perf lever A/Bs against the same
anchor instead of short-trained demo nets." >>_outputs/followup.log 2>&1
  echo "finalize: committed $(git log --oneline -1)" >>_outputs/followup.log
fi

# evidence run AFTER the commit: the end-of-round watchdog may reclaim the
# chip mid-bench and must not be able to cost us the committed artifacts
if wait_for_tpu; then
  env BENCH_TPU_WAIT_SECS=300 BENCH_RUN_TIMEOUT=1800 timeout 2400 python bench.py >_outputs/bench_shipped.log 2>&1
  echo "bench at shipped config: $(tail -1 _outputs/bench_shipped.log)" >>_outputs/followup.log
fi
echo "=== round4 finalize done ($(date)) ===" >>_outputs/followup.log
