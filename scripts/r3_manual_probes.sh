#!/bin/bash
# Manual high-value probe sequence (short hardware window): waits for the
# orphaned tuner probe to release the chip, then times the sim-backed knob
# combinations directly. Winners are written to tuned.json by hand afterward.
set -x
cd /root/repo
ORPHAN=$1
while kill -0 "$ORPHAN" 2>/dev/null; do sleep 10; done
echo "chip free at $(date)"
# baseline was measured by the tuner: phase1_fused=True 1723.0 ms mean=31.713966
echo "=== PROBE mxu_big"
STRELKA_MXU_BIG=1 timeout 900 python -u scripts/tune_defaults.py --probe box:32
echo "=== PROBE p2_tile=256 + octant"
STRELKA_P2_TILE=256 STRELKA_P2_OCTANT=1 timeout 900 python -u scripts/tune_defaults.py --probe box:32
echo "=== PROBE p1_tile=512 + p2_tile=256 + octant"
STRELKA_P1_TILE=512 STRELKA_P2_TILE=256 STRELKA_P2_OCTANT=1 timeout 900 python -u scripts/tune_defaults.py --probe box:32
echo "=== PROBE ALL + mxu_big"
STRELKA_MXU_BIG=1 STRELKA_P1_TILE=512 STRELKA_P2_TILE=256 STRELKA_P2_OCTANT=1 timeout 900 python -u scripts/tune_defaults.py --probe box:32
echo "=== MANUAL PROBES DONE at $(date)"
