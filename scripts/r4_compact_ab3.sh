#!/bin/bash
# Round-4 chain 3: roll-based cumsum fix — kernel smoke first, then the
# compact e2e probes that chain 2 lost to the concat lowering failure.
set -u
cd /root/repo
LOG=/root/repo/r4_compact3.log
: > "$LOG"
echo "=== kernel smoke compact ===" >> "$LOG"
timeout 1200 python scripts/kernel_smoke.py compact >> "$LOG" 2>&1
rc=$?; echo "rc=$rc" >> "$LOG"
if [ $rc -ne 0 ]; then echo "SMOKE FAILED - aborting chain" >> "$LOG"; exit 1; fi
echo "=== kernel smoke cone ===" >> "$LOG"
timeout 1200 python scripts/kernel_smoke.py cone >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"
echo "=== box STRELKA_SWEEP_COMPACT=1 ===" >> "$LOG"
env STRELKA_SWEEP_COMPACT=1 timeout 2400 python scripts/perf_probe.py box >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"
echo "=== kitchen STRELKA_SWEEP_COMPACT=1 ===" >> "$LOG"
env STRELKA_SWEEP_COMPACT=1 timeout 2400 python scripts/perf_probe.py kitchen >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"
echo "=== hair STRELKA_CONE_COMPACT=1 ===" >> "$LOG"
env STRELKA_CONE_COMPACT=1 timeout 2400 python scripts/hair_probe.py >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"
echo "=== cornell STRELKA_MXU_HIGHP=1 ===" >> "$LOG"
env STRELKA_MXU_HIGHP=1 timeout 2400 python scripts/perf_probe.py cornell >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"
echo "CHAIN3 DONE" >> "$LOG"
