#!/bin/bash
# Round-3 TPU A/B: superblock-local MXU feats on box_field.
# Runs the moment the axon tunnel is healthy; each stage appends to the log.
set -x
cd /root/repo
python -u -c "import time,jax; t=time.time(); print('devices', jax.devices(), '%.1fs'%(time.time()-t))" || exit 1
# 1. correctness: capture a bounce wavefront, arbitrate vs f64 oracle.
# NOT a chain-fatal gate (a transient failure must not burn the only
# hardware window): an oracle failure pins mxu_big OFF in tuned.json so
# the unvalidated intersector can never become a default, and the rest of
# the chain (whose winners are image-mean-guarded) still runs.
oracle_ok=1
timeout 7200 python -u scripts/capture_bounce.py 48 || oracle_ok=0
[ "$oracle_ok" = 1 ] && { timeout 7200 python -u scripts/oracle_probe.py 48 4096 || oracle_ok=0; }
if [ "$oracle_ok" = 0 ]; then
  python -c "import sys; sys.path.insert(0, '.'); from strelka_tpu import tuned; tuned.write({'mxu_big': False, 'mxu_big_pinned': True})"
  echo "ORACLE FAILED — mxu_big pinned off, continuing"
fi
# 1b. auto-tune binary scheduling flags -> tuned.json (later processes,
# including the driver's bench, default to the measured winners)
timeout 7200 python -u scripts/tune_defaults.py || true
echo "TUNE DEFAULTS DONE"
# 2. perf A/B: vpu baseline vs mxu-with-local-feats e2e
timeout 7200 python -u scripts/mxu_box_probe.py vpu mxu || echo 'MXU AB FAILED (continuing)'
# 2b. fused-K phase 1 (default ON) vs rectangular phase 1
STRELKA_PHASE1_FUSED=0 timeout 1800 python -u scripts/mxu_box_probe.py vpu || true
echo "PHASE1_FUSED AB DONE"
# 2c. K scan under the fused kernel (sim: open 0.65/0.50/0.34 at K=16/24/32;
# fused phase-1 cost ~linear in K -> optimum likely 24-32)
STRELKA_RESIDUAL_K=24 timeout 1800 python -u scripts/mxu_box_probe.py vpu || true
STRELKA_RESIDUAL_K=32 timeout 1800 python -u scripts/mxu_box_probe.py vpu || true
echo "RESIDUAL_K SCAN DONE"
# 2c'. bucket counting-sort vs argsort for the per-bounce wavefront sort
STRELKA_BUCKET_SORT=1 timeout 1800 python -u scripts/mxu_box_probe.py vpu || true
echo "BUCKET_SORT AB DONE"
# 2c''. per-ray grouped-rounds traversal vs the tile-K two-pass: the CPU
# sim (scripts/rounds_sim.py) predicts a 1.9x pair-count LOSS (median 7
# blocks enter before a hit; tile amortization wins) — one cheap
# confirmation run only
STRELKA_RAY_ROUNDS=1 STRELKA_BUCKET_SORT=1 timeout 2400 python -u scripts/mxu_box_probe.py vpu || true
echo "RAY_ROUNDS AB DONE"
# 2c'''. sched_sim-backed two-pass tiling: p2 tile 256 (+octant sub-sort),
# p1 tile 512 — sim predicts closest path 372 -> ~247 ms equivalent
STRELKA_P2_TILE=256 timeout 1800 python -u scripts/mxu_box_probe.py vpu || true
STRELKA_P2_TILE=256 STRELKA_P2_OCTANT=1 timeout 1800 python -u scripts/mxu_box_probe.py vpu || true
STRELKA_P1_TILE=512 STRELKA_P2_TILE=256 STRELKA_P2_OCTANT=1 timeout 1800 python -u scripts/mxu_box_probe.py vpu || true
STRELKA_P1_TILE=256 STRELKA_P2_TILE=256 STRELKA_P2_OCTANT=1 timeout 1800 python -u scripts/mxu_box_probe.py vpu || true
echo "P2_TILE AB DONE"
# 2d. sort-once A/B (keep the bounce-1 order for later bounces)
STRELKA_SORT_ONCE=1 timeout 1800 python -u scripts/mxu_box_probe.py vpu || true
echo "SORT_ONCE AB DONE"
# 3. wl sweeps on MXU with vpu phase-1 (mid hypothesis)
STRELKA_WL_MXU=1 timeout 7200 python -u scripts/mxu_box_probe.py vpu || echo 'WL_MXU FAILED (continuing)'
# 4. cornell sanity (should be unchanged ~100ms)
timeout 3600 python -u scripts/perf_probe.py cornell 2>/dev/null || timeout 3600 python -u scripts/perf_probe.py || true
echo "ALL DONE"
# 4b. shade/epilogue breakdown (where cornell's non-sweep ms live)
timeout 1800 python -u scripts/shade_profile.py || true
echo "SHADE PROFILE DONE"
# 5. shadow single-pass wl vs two-pass (direction-coherent grouped shadow tiles)
STRELKA_SHADOW_SINGLE=1 timeout 7200 python -u scripts/mxu_box_probe.py vpu mxu || true
echo "SHADOW_SINGLE DONE"
# 5b. temporal hit prediction A/B (per-ray block assignment vs K-nearest)
timeout 3000 python -u scripts/predict_probe.py 48 6 || true
echo "PREDICT AB DONE"
# 5b'. phase-1 K scan under prediction (0 = pure prediction)
STRELKA_PRED_K=0 timeout 1800 python -u scripts/predict_probe.py 48 4 || true
STRELKA_PRED_K=4 timeout 1800 python -u scripts/predict_probe.py 48 4 || true
STRELKA_PRED_K=16 timeout 1800 python -u scripts/predict_probe.py 48 4 || true
echo "PREDICT K SCAN DONE"
timeout 3000 python -u scripts/predict_probe.py kitchen 6 || true
echo "PREDICT KITCHEN AB DONE"
# 5c. flat-compact A/B on cornell (dead-to-tail partition + dead-tile guard)
timeout 1800 python -u scripts/perf_probe.py cornell || true
STRELKA_FLAT_COMPACT=1 timeout 1800 python -u scripts/perf_probe.py cornell || true
echo "FLAT_COMPACT AB DONE"
# 5d. einar-scale hair: cone two-pass A/B (hair_long 100k segments) + K scan
timeout 3000 python -u scripts/hair_probe.py || true
STRELKA_CONE_NO_TWOPASS=1 timeout 3000 python -u scripts/hair_probe.py || true
STRELKA_CONE_K=8 timeout 1800 python -u scripts/hair_probe.py || true
STRELKA_CONE_K=24 timeout 1800 python -u scripts/hair_probe.py || true
echo "HAIR TWOPASS AB DONE"
# 6. refresh showcase renders (kitchen added) with the current kernels
timeout 3000 python -u scripts/render_showcase.py || true
echo "SHOWCASE DONE"
# 7. Kitchen Set 2048spp/4d converged wall-clock (BASELINE.md "establish baseline")
timeout 5400 python -u scripts/soak.py --kitchen || true
echo "KITCHEN SOAK DONE"
# 8. kitchen intersector A/B (local feats may flip the big-scene crossover)
timeout 3000 python -u scripts/perf_probe.py kitchen_ab || true
echo "KITCHEN AB DONE"
