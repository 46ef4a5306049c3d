#!/bin/bash
# Round-5 chain 4: (1) hair cone-count reduction under the exact Newton
# refinement (VERDICT r5 tasks 4+5), (2) bf16x3 middle-point precision for
# the work-list MXU sweeps (1-pass bf16 drifts the image; HIGHEST costs 3x).
# Run with the host otherwise idle (NOTES fact #52).
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/r5_chain4.log}
: > "$LOG"

hair() {
  echo "=== hair $* ===" >> "$LOG"
  local scene=$1
  shift
  env "$@" timeout 2400 python -u -c "
import sys
sys.path.insert(0, 'scripts'); sys.path.insert(0, '.')
import hair_probe
hair_probe.run('$scene', iters=2 if 'long' in '$scene' else 3)
" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}

probe() {
  echo "=== $1 ===" >> "$LOG"
  shift
  echo "env: $*" >> "$LOG"
  env "$@" timeout 2400 python -u scripts/perf_probe.py "$PROBE_ARG" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}

# --- tasks 4+5: cone count under exact refinement ---
hair hair_patch
hair hair_patch STRELKA_CURVE_SUBDIV=4
hair hair_patch STRELKA_CURVE_SUBDIV=2
hair hair_long
hair hair_long STRELKA_CURVE_SUBDIV=4
hair hair_long STRELKA_CURVE_SUBDIV=2

# --- task 1: bf16x3 wl sweeps (mean must equal the exact 222.5457 / 31.6639) ---
PROBE_ARG=kitchen
probe "kitchen wl_mxu prec high" STRELKA_WL_MXU=1 STRELKA_CLOSEST_PREC=high STRELKA_ANY_PREC=high
probe "kitchen closest_single" STRELKA_CLOSEST_SINGLE=1
probe "kitchen closest_single wl_mxu high" STRELKA_CLOSEST_SINGLE=1 STRELKA_WL_MXU=1 STRELKA_CLOSEST_PREC=high STRELKA_ANY_PREC=high
PROBE_ARG=box
probe "box wl_mxu prec high" STRELKA_WL_MXU=1 STRELKA_CLOSEST_PREC=high STRELKA_ANY_PREC=high
probe "box closest_single" STRELKA_CLOSEST_SINGLE=1

echo "CHAIN DONE" >> "$LOG"
