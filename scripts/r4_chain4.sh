#!/bin/bash
# Round-4 chain 4: post-compact-falsification levers. Re-baseline box with
# packed attrs, the queued p1_tile scan (fact #47), op-level profiles of the
# two big scenes, and finer cone blocks for hair.
set -u
cd /root/repo
LOG=/root/repo/r4_chain4.log
: > "$LOG"
stage() { echo "=== $* ===" >> "$LOG"; }
stage box baseline packed-attrs
timeout 2400 python scripts/perf_probe.py box >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"
stage box P1_TILE=512
env STRELKA_P1_TILE=512 timeout 2400 python scripts/perf_probe.py box >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"
stage box P1_TILE=256
env STRELKA_P1_TILE=256 timeout 2400 python scripts/perf_probe.py box >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"
stage profile box_field
timeout 2400 python scripts/profile_scene.py box_field >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"
stage profile kitchen
timeout 2400 python scripts/profile_scene.py kitchen >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"
stage hair CONE_TBLK=64
env STRELKA_CONE_TBLK=64 timeout 2400 python scripts/hair_probe.py >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"
stage cornell baseline packed-attrs
timeout 2400 python scripts/perf_probe.py cornell >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"
stage cornell MXU_HIGHP=1
env STRELKA_MXU_HIGHP=1 timeout 2400 python scripts/perf_probe.py cornell >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"
echo "CHAIN4 DONE" >> "$LOG"
