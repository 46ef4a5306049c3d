#!/bin/bash
# Round-5 chain 1: aim the traversal work (kitchen profile) + env-only A/Bs.
# Run from repo root with the host otherwise idle (NOTES fact #52).
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/r5_chain1.log}
: > "$LOG"

probe() {
  echo "=== $1 ===" >> "$LOG"
  shift
  echo "env: $*" >> "$LOG"
  env "$@" timeout 2400 python -u scripts/perf_probe.py "$PROBE_ARG" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}

echo "--- kitchen profile ---" >> "$LOG"
timeout 2400 python -u scripts/profile_scene.py kitchen >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"

PROBE_ARG=kitchen
probe "kitchen baseline"
probe "kitchen wl_mxu" STRELKA_WL_MXU=1
probe "kitchen wl_mxu highp" STRELKA_WL_MXU=1 STRELKA_MXU_HIGHP=1
probe "kitchen pack_super 2" STRELKA_PACK_SUPER=2

PROBE_ARG=box
probe "box baseline"
probe "box wl_mxu" STRELKA_WL_MXU=1
probe "box p1_tile 512" STRELKA_P1_TILE=512
probe "box pack_super 4" STRELKA_PACK_SUPER=4

echo "CHAIN DONE" >> "$LOG"
