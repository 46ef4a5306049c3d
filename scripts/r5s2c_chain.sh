#!/bin/bash
# Round-5 session-2 chain C: the probe the consolidated chain dropped —
# small phase-2 work-list tiles under the PACKED wl entry budget (184320,
# 4x the 46080 that forced fact-#33's permanent rectangular fallback).
# sched_sim predicted ~1.8x on box phase 2; never hardware-measured since
# the packed-wl fix. Runs after r5s2b.
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/r5s2c.log}
: > "$LOG"

for i in $(seq 1 480); do
  grep -q "CHAIN DONE" /tmp/r5s2b.log 2>/dev/null && break
  [ "$i" = 480 ] && { echo "r5s2b never finished; aborting" >> "$LOG"; exit 1; }
  sleep 30
done

probe() {
  echo "=== $1 ===" >> "$LOG"
  local to=$2 sc=$3
  shift 3
  echo "env: $*" >> "$LOG"
  env "$@" timeout "$to" python -u scripts/perf_probe.py "$sc" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}

probe "box p2_tile 512" 2400 box STRELKA_P2_TILE=512
probe "box p2_tile 256" 2400 box STRELKA_P2_TILE=256
probe "kitchen p2_tile 256" 2700 kitchen STRELKA_P2_TILE=256
probe "kitchen p2_tile 512" 2700 kitchen STRELKA_P2_TILE=512

echo "CHAIN DONE" >> "$LOG"
