#!/bin/bash
# End-of-round chip watchdog.
#
# The driver captures BENCH_r04.json by running bench.py on the single real
# TPU chip at round end. If the self-resuming gate chain (gate_cadence ->
# ... -> round4_followup) is still mid-run at that point, the two would
# time-share the chip and depress the recorded headline number — worse than
# losing a partial gate run, since training is sidecar-resumable anyway.
#
# Sleeps until DEADLINE_EPOCH, then kills the given chain ROOT PIDs and every
# live descendant, by explicit PID tree walk (never by name pattern).
#
# Usage: endround_watchdog.sh DEADLINE_EPOCH PID [PID...]
set -u
DEADLINE=$1; shift

now=$(date +%s)
while [ "$now" -lt "$DEADLINE" ]; do
  sleep $(( DEADLINE - now > 300 ? 300 : DEADLINE - now ))
  now=$(date +%s)
done

descendants() { # echo pid and all live descendants, children-first
  local p=$1 c
  for c in $(ls /proc/ 2>/dev/null | grep -E '^[0-9]+$'); do
    [ -r "/proc/$c/stat" ] || continue
    ppid=$(awk '{print $4}' "/proc/$c/stat" 2>/dev/null) || continue
    [ "$ppid" = "$p" ] && descendants "$c"
  done
  echo "$p"
}

log=/root/repo/_outputs/watchdog.log
echo "=== endround watchdog fired $(date -u) ===" >>"$log"
for root in "$@"; do
  [ -d "/proc/$root" ] || { echo "root $root already gone" >>"$log"; continue; }
  for pid in $(descendants "$root"); do
    if [ -d "/proc/$pid" ]; then
      cmd=$(tr '\0' ' ' </proc/$pid/cmdline 2>/dev/null | head -c 120)
      echo "kill $pid: $cmd" >>"$log"
      kill "$pid" 2>/dev/null
    fi
  done
done
sleep 10
for root in "$@"; do
  for pid in $(descendants "$root" 2>/dev/null); do
    [ -d "/proc/$pid" ] && kill -9 "$pid" 2>/dev/null
  done
done
echo "=== watchdog done $(date -u) ===" >>"$log"
