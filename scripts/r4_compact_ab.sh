#!/bin/bash
# Round-4: hardware A/B of the lane-compacted dense sweep (sweep_compact).
# Oracle said 4.4x less sweep-lane work on bounce wavefronts (facts #43/#47);
# this measures the e2e launch time on box:48 and kitchen at bench config.
# One probe at a time; never kill mid-launch.
set -u
cd /root/repo
LOG=/root/repo/r4_compact.log
: > "$LOG"
run() {
  echo "=== $* ===" >> "$LOG"
  env "$@" timeout 2400 python scripts/perf_probe.py "$PROBE_SCENE" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}
PROBE_SCENE=box
run PROBE=baseline
run STRELKA_SWEEP_COMPACT=1
PROBE_SCENE=kitchen
run PROBE=baseline_kitchen
run STRELKA_SWEEP_COMPACT=1
echo "CHAIN DONE" >> "$LOG"
