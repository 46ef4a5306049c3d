#!/bin/bash
# Round-5 session-2 chain D: fidelity measurements after the per-scene-class
# precision default landed. hair_patch SSIM vs the FRESH subdiv-8+refinement
# CPU golden (regenerated this session — the old golden predated exact curve
# refinement), with a refine-off diagnostic arm. Runs after r5s2c.
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/r5s2d.log}
: > "$LOG"

for i in $(seq 1 600); do
  grep -q "CHAIN DONE" /tmp/r5s2c.log 2>/dev/null && break
  [ "$i" = 600 ] && { echo "r5s2c never finished; aborting" >> "$LOG"; exit 1; }
  sleep 30
done

ssim() {
  echo "=== ssim $1 ===" >> "$LOG"
  local sc=$2
  shift 2
  echo "env: $*" >> "$LOG"
  env "$@" timeout 1800 python -u scripts/tpu_golden_diff.py "$sc" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}

ssim "hair_patch refine-on (default)" hair_patch
ssim "hair_patch refine-off" hair_patch STRELKA_CURVE_REFINE=0
ssim "cornell auto-flat-highp default" cornell

echo "CHAIN DONE" >> "$LOG"
