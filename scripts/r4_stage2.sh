#!/bin/bash
# Round-4 stage 2: with the r4 defaults landed (phase1_fused OFF, shadow
# grouping OFF), (a) clean-confirm the new baseline, (b) settle the opt-in
# features (hitcache, sort_once, bucket_sort) with direct e2e A/Bs,
# (c) first kitchen + hair numbers on the new defaults.
set -u
cd /root/repo
LOG=/root/repo/r4_stage2.log
: > "$LOG"
run() {
  echo "=== $* ===" >> "$LOG"
  env "$@" timeout 2400 python "${SCRIPT:-scripts/perf_probe.py}" "${ARG:-box}" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}
run PROBE=new_defaults_box
run STRELKA_HIT_PREDICT=1
run STRELKA_SORT_ONCE=1
run STRELKA_BUCKET_SORT=1
ARG=kitchen run PROBE=new_defaults_kitchen
SCRIPT=scripts/hair_probe.py ARG="" run PROBE=hair_defaults
echo "CHAIN DONE" >> "$LOG"
