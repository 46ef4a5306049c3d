#!/bin/bash
# Follow-up probes after the SMEM fixes (budgeted wl entries + fallback tile
# floor): the sim-favored VPU tiling configs that previously OOM'd SMEM.
set -x
cd /root/repo
WAITPID=$1
while kill -0 "$WAITPID" 2>/dev/null; do sleep 10; done
echo "chip free at $(date)"
echo "=== PROBE fixed p2_tile=256 + octant"
STRELKA_P2_TILE=256 STRELKA_P2_OCTANT=1 timeout 900 python -u scripts/tune_defaults.py --probe box:32
echo "=== PROBE fixed p1_tile=512 + p2_tile=256 + octant"
STRELKA_P1_TILE=512 STRELKA_P2_TILE=256 STRELKA_P2_OCTANT=1 timeout 900 python -u scripts/tune_defaults.py --probe box:32
echo "=== FOLLOWUP DONE at $(date)"
