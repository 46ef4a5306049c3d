#!/bin/bash
# Round-5 chain 5: (A) low-subdiv hair under the envelope-covering cone
# inflation + sphere ghost rejection (means must hold at subdiv 4/2 —
# subdiv-8 reference mean: hair_patch 8.66093, hair_long 5.70330);
# (B) work-list MXU sweeps with prec=high now lowering as HIGHEST
# (means must equal the exact 222.5457 kitchen / 31.6639 box);
# (C) small-tile phase-2 schedules unlocked by the packed 1-word wl.
# Run with the host otherwise idle (NOTES fact #52).
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/r5_chain5.log}
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

# --- A: hair cone-count reduction, now ghost-safe ---
hair hair_patch
hair hair_patch STRELKA_CURVE_SUBDIV=4
hair hair_patch STRELKA_CURVE_SUBDIV=2
hair hair_long STRELKA_CURVE_SUBDIV=4
hair hair_long STRELKA_CURVE_SUBDIV=2

# --- B: wl MXU sweeps, f32-exact dots ---
PROBE_ARG=kitchen
probe "kitchen wl_mxu high" STRELKA_WL_MXU=1 STRELKA_CLOSEST_PREC=high STRELKA_ANY_PREC=high
probe "kitchen wl_mxu nearest_block high" STRELKA_WL_MXU=1 STRELKA_KEY_NEAREST_BLOCK=1 STRELKA_CLOSEST_PREC=high STRELKA_ANY_PREC=high
probe "kitchen p2_tile 256" STRELKA_P2_TILE=256
probe "kitchen wl_mxu nearest_block high p2_256" STRELKA_WL_MXU=1 STRELKA_KEY_NEAREST_BLOCK=1 STRELKA_CLOSEST_PREC=high STRELKA_ANY_PREC=high STRELKA_P2_TILE=256
PROBE_ARG=box
probe "box wl_mxu high" STRELKA_WL_MXU=1 STRELKA_CLOSEST_PREC=high STRELKA_ANY_PREC=high
probe "box closest_single wl_mxu high" STRELKA_CLOSEST_SINGLE=1 STRELKA_WL_MXU=1 STRELKA_CLOSEST_PREC=high STRELKA_ANY_PREC=high
probe "box p2_tile 256" STRELKA_P2_TILE=256

# --- C: cornell closest_highp cost anchor (bf16 baseline for the delta) ---
PROBE_ARG=cornell
probe "cornell baseline bf16" STRELKA_NOOP=1
probe "cornell closest_highp" STRELKA_CLOSEST_HIGHP=1

echo "CHAIN DONE" >> "$LOG"
