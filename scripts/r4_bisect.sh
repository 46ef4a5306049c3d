#!/bin/bash
# Round-4 stage 1: bisect the box_field 1849(r2) -> 2549(r3) ms regression at
# the EXACT bench config (grid 48, 512^2, 2spp, 4d). Suspects, strongest
# first: phase1_fused (baked ON in session D, never hardware-A/B'd vs OFF),
# shadow grouping, residual two-pass interactions. Each probe is a fresh
# process; one probe at a time (single TPU client). NEVER kill mid-launch.
set -u
cd /root/repo
LOG=/root/repo/r4_bisect.log
: > "$LOG"
run() {
  echo "=== $* ===" >> "$LOG"
  env "$@" timeout 1200 python scripts/perf_probe.py box >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}
run PROBE=baseline_defaults
run STRELKA_PHASE1_FUSED=0
run STRELKA_NO_SHADOW_GROUP=1
run STRELKA_PHASE1_FUSED=0 STRELKA_NO_SHADOW_GROUP=1
echo "CHAIN DONE" >> "$LOG"
