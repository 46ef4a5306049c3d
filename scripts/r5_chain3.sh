#!/bin/bash
# Round-5 chain 3: (1) selective closest-sweep f32 precision A/B — SSIM +
# perf (VERDICT r5 task 2), (2) the chain-1/2 probes the session restart
# killed (traversal task 1). Run with the host otherwise idle (fact #52).
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/r5_chain3.log}
: > "$LOG"

probe() {
  echo "=== $1 ===" >> "$LOG"
  shift
  echo "env: $*" >> "$LOG"
  env "$@" timeout 2400 python -u scripts/perf_probe.py "$PROBE_ARG" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}

ssim_arm() {  # ssim_arm <scene> <env...>
  local scene=$1
  shift
  echo "=== ssim $scene $* ===" >> "$LOG"
  env "$@" timeout 2400 python -u scripts/ssim_spp_probe.py "$scene" 1 "/tmp/${scene}_hp.png" >> "$LOG" 2>&1
  python -u scripts/ssim_spp_probe.py --ssim "goldens/${scene}_golden.png" "/tmp/${scene}_hp.png" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}

# --- task 2: closest-sweep-only f32 precision ---
ssim_arm cornell     STRELKA_CLOSEST_HIGHP=1
ssim_arm coffeetable STRELKA_CLOSEST_HIGHP=1
ssim_arm kitchen     STRELKA_CLOSEST_HIGHP=1
PROBE_ARG=cornell
probe "cornell closest_highp" STRELKA_CLOSEST_HIGHP=1
PROBE_ARG=kitchen
probe "kitchen closest_highp" STRELKA_CLOSEST_HIGHP=1
probe "kitchen wl_mxu + closest_highp" STRELKA_WL_MXU=1 STRELKA_CLOSEST_HIGHP=1

# --- task 1: the probes chain 1/2 never got to ---
probe "kitchen pack_super 2" STRELKA_PACK_SUPER=2
probe "kitchen key_nearest_block" STRELKA_KEY_NEAREST_BLOCK=1
probe "kitchen key_oct_mid12" STRELKA_KEY_OCT_MID=12
probe "kitchen wl_mxu + nearest_block" STRELKA_WL_MXU=1 STRELKA_KEY_NEAREST_BLOCK=1
PROBE_ARG=box
probe "box baseline"
probe "box wl_mxu" STRELKA_WL_MXU=1
probe "box closest_highp" STRELKA_CLOSEST_HIGHP=1
probe "box p1_tile 512" STRELKA_P1_TILE=512
probe "box pack_super 4" STRELKA_PACK_SUPER=4
probe "box key_nearest_block" STRELKA_KEY_NEAREST_BLOCK=1
probe "box key_oct_mid12" STRELKA_KEY_OCT_MID=12

echo "CHAIN DONE" >> "$LOG"
