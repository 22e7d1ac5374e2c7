#!/bin/bash
# Shared helpers for the certify-then-ship pipeline (round-5; ADVICE r4:
# the round-4 sprint scripts cloned these helpers per sprint with undeclared
# globals and attached log redirections OUTSIDE the deadline check, so a
# SKIPped stage truncated the previous pass's evidence to an empty file).
#
# Source after `cd /root/repo`:
#   . scripts/sprint_lib.sh
#   sprint_deadline 14400            # wall budget for the whole chain
#   run_stage d3 1800 3600 _outputs/gate_d3.log python -m ... args
#
# Contract:
# * every helper uses `local` variables only;
# * stage output goes to a TEMP file and is moved over the target log ONLY
#   after the command actually ran (pass OR fail) — a SKIP for lack of wall
#   time leaves the previous pass's log untouched;
# * each stage is retried while its time budget fits in the remaining wall.

. "$(dirname "${BASH_SOURCE[0]}")/lib.sh"  # wait_for_tpu, mkdir _outputs

SPRINT_T0=$(date +%s)
SPRINT_BUDGET=0

sprint_deadline() {
  SPRINT_T0=$(date +%s)
  SPRINT_BUDGET=$1
}

sprint_left() {
  local now
  now=$(date +%s)
  echo $((SPRINT_BUDGET - (now - SPRINT_T0)))
}

note() {
  echo "[chain $(date +%H:%M:%S) left=$(sprint_left)s] $*"
}

# run_stage <tag> <need_secs> <timeout_secs> <log> <cmd...>
#   SKIPs (rc 2) without touching <log> when the remaining wall budget is
#   below <need_secs>; otherwise runs <cmd> under `timeout`, capturing to a
#   temp file that replaces <log> only once the command has actually run.
#   Retries while the budget allows. rc 0 = stage passed, 1 = exhausted.
run_stage() {
  local tag=$1 need=$2 tmo=$3 log=$4
  shift 4
  local try rc tmp
  for try in 1 2 3; do
    if [ "$(sprint_left)" -lt "$need" ]; then
      note "SKIP $tag (needs ${need}s)"
      return 2
    fi
    wait_for_tpu || { note "$tag: TPU never came back"; return 1; }
    tmp="${log}.tmp-$$"
    note "$tag attempt $try: $*"
    echo "=== $tag attempt $try: $* ($(date)) ===" >"$tmp"
    timeout "$tmo" "$@" >>"$tmp" 2>&1
    rc=$?
    mv -f "$tmp" "$log"   # the command ran: its output IS the evidence
    if [ "$rc" -eq 0 ]; then
      note "$tag done"
      return 0
    fi
    note "$tag attempt $try failed rc=$rc"
  done
  return 1
}

# bench_candidate <tag> <log> [ENV=V ...] — one bench.py fps measurement.
#   The section header is echoed into the log ONLY after bench.py actually
#   ran (ADVICE r4: unconditional headers left orphan sections).
bench_candidate() {
  local tag=$1 log=$2
  shift 2
  local tmp rc
  if [ "$(sprint_left)" -lt 600 ]; then
    note "SKIP bench:$tag"
    return 2
  fi
  wait_for_tpu || { note "bench:$tag TPU never came back"; return 1; }
  note "bench $tag: $*"
  tmp="${log}.tmp-$$"
  env BENCH_TPU_WAIT_SECS=120 BENCH_RUN_TIMEOUT=1500 "$@" \
    timeout 1800 python bench.py >"$tmp" 2>&1
  rc=$?
  {
    echo "--- $tag: $* ($(date))"
    cat "$tmp"
  } >>"$log"
  rm -f "$tmp"
  return "$rc"
}
