#!/bin/bash
# Round-5 chain 2: sort-key env A/Bs (VERDICT r4 next-step (b)) on the two
# slow scenes. Env-only — no code changes required.
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/r5_chain2.log}
: > "$LOG"

probe() {
  echo "=== $1 ===" >> "$LOG"
  shift
  echo "env: $*" >> "$LOG"
  env "$@" timeout 2400 python -u scripts/perf_probe.py "$PROBE_ARG" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}

PROBE_ARG=kitchen
probe "kitchen key_nearest_block" STRELKA_KEY_NEAREST_BLOCK=1
probe "kitchen key_oct_mid12" STRELKA_KEY_OCT_MID=12
probe "kitchen wl_mxu + nearest_block" STRELKA_WL_MXU=1 STRELKA_KEY_NEAREST_BLOCK=1

PROBE_ARG=box
probe "box key_nearest_block" STRELKA_KEY_NEAREST_BLOCK=1
probe "box key_oct_mid12" STRELKA_KEY_OCT_MID=12

echo "CHAIN DONE" >> "$LOG"
