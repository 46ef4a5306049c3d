#!/bin/bash
# Round-4 chain 2: compact kernels (fixed cumsum) on box/kitchen, cone
# compact on hair, mxu_highp fidelity-speed point on cornell.
set -u
cd /root/repo
LOG=/root/repo/r4_compact2.log
: > "$LOG"
run() {
  local scene="$1"; shift
  echo "=== $scene $* ===" >> "$LOG"
  env "$@" timeout 2400 python scripts/perf_probe.py "$scene" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}
run box STRELKA_SWEEP_COMPACT=1
run kitchen STRELKA_SWEEP_COMPACT=1
echo "=== hair baseline ===" >> "$LOG"
timeout 2400 python scripts/hair_probe.py >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"
echo "=== hair STRELKA_CONE_COMPACT=1 ===" >> "$LOG"
env STRELKA_CONE_COMPACT=1 timeout 2400 python scripts/hair_probe.py >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"
run cornell STRELKA_MXU_HIGHP=1
echo "CHAIN2 DONE" >> "$LOG"
