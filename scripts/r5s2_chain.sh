#!/bin/bash
# Round-5 session-2 consolidated decision chain (prior sessions' chains were
# written but their /tmp logs died with the VM before any result was
# transcribed). Priority order = decision value:
#   1. SSIM task (VERDICT r5 #2): closest_highp cost anchor on cornell +
#      golden-config SSIM with/without on cornell + coffeetable.
#   2. Traversal task (#1): kitchen/box baseline vs the chain4/6 combos
#      (closest_single work-list + MXU prec high, fine PACK_SUPER).
#   3. Hair (#4/#5): curve_subdiv 8/4/2 under the exact Newton refinement.
# Run with the host otherwise idle (NOTES fact #52).
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/r5s2.log}
: > "$LOG"

probe() { # probe <label> <timeout> <scene-arg> [env...]
  echo "=== $1 ===" >> "$LOG"
  local to=$2 sc=$3
  shift 3
  echo "env: $*" >> "$LOG"
  env "$@" timeout "$to" python -u scripts/perf_probe.py "$sc" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}

ssim() { # ssim <label> <scene> [env...]
  echo "=== ssim $1 ===" >> "$LOG"
  local sc=$2
  shift 2
  echo "env: $*" >> "$LOG"
  env "$@" timeout 1800 python -u scripts/tpu_golden_diff.py "$sc" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}

hair() { # hair <label> <timeout> <scene> [env...]
  echo "=== hair $1 ===" >> "$LOG"
  local to=$2 sc=$3
  shift 3
  echo "env: $*" >> "$LOG"
  env "$@" timeout "$to" python -u -c "
import sys
sys.path.insert(0, 'scripts'); sys.path.insert(0, '.')
import hair_probe
hair_probe.run('$sc', iters=2 if 'long' in '$sc' else 3)
" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}

# ---- block 1: fidelity (decide closest_highp default) ----
probe "cornell baseline" 1500 cornell
probe "cornell closest_highp" 1500 cornell STRELKA_CLOSEST_HIGHP=1
ssim "cornell base" cornell
ssim "cornell closest_highp" cornell STRELKA_CLOSEST_HIGHP=1
ssim "coffeetable base" coffeetable
ssim "coffeetable closest_highp" coffeetable STRELKA_CLOSEST_HIGHP=1

# ---- block 2: traversal (kitchen/box) ----
FINE="STRELKA_CLOSEST_SINGLE=1 STRELKA_WL_MXU=1 STRELKA_CLOSEST_PREC=high STRELKA_ANY_PREC=high STRELKA_WL_CAP=256 STRELKA_WL_FULL_NSB=512"
probe "kitchen baseline" 2700 kitchen
probe "kitchen closest_single wl_mxu high" 2700 kitchen STRELKA_CLOSEST_SINGLE=1 STRELKA_WL_MXU=1 STRELKA_CLOSEST_PREC=high STRELKA_ANY_PREC=high
probe "kitchen fine ps2" 2700 kitchen $FINE STRELKA_PACK_SUPER=2
probe "box baseline" 2400 box
probe "box closest_single wl_mxu high" 2400 box STRELKA_CLOSEST_SINGLE=1 STRELKA_WL_MXU=1 STRELKA_CLOSEST_PREC=high STRELKA_ANY_PREC=high
probe "box fine ps2" 2400 box $FINE STRELKA_PACK_SUPER=2

# ---- block 3: hair cone-count under exact refinement ----
hair "hair_patch s8" 2400 hair_patch
hair "hair_patch s4" 2400 hair_patch STRELKA_CURVE_SUBDIV=4
hair "hair_patch s2" 2400 hair_patch STRELKA_CURVE_SUBDIV=2
hair "hair_long s4" 3000 hair_long STRELKA_CURVE_SUBDIV=4

echo "CHAIN DONE" >> "$LOG"
