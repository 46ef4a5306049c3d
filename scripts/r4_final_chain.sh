#!/bin/bash
# Round-4 final session: re-validate the tuned knobs that were LOST when
# tuned.json (gitignored + VM restart) vanished. Every probe pins its env
# explicitly so the missing file cannot skew either arm. One probe at a
# time (single TPU client); NEVER kill mid-launch.
set -u
cd /root/repo
LOG=/root/repo/r4_final.log
: > "$LOG"
run() {
  echo "=== $* ===" >> "$LOG"
  env "$@" timeout 1200 python scripts/perf_probe.py box >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}
run STRELKA_SHADOW_SINGLE=1 STRELKA_P1_TILE=1024 STRELKA_P2_TILE=1024
run STRELKA_SHADOW_SINGLE=0 STRELKA_P1_TILE=1024 STRELKA_P2_TILE=1024
run STRELKA_SHADOW_SINGLE=1 STRELKA_P1_TILE=512 STRELKA_P2_TILE=1024
run STRELKA_SHADOW_SINGLE=1 STRELKA_P1_TILE=1024 STRELKA_P2_TILE=512
echo "CHAIN DONE" >> "$LOG"
