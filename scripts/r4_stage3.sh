#!/bin/bash
# r4 stage 3: post-tuner hardware probes (run AFTER tune_defaults.py exits).
# Every probe is a fresh subprocess with a generous timeout (NOTES fact #18:
# never kill a TPU client mid-launch).
cd /root/repo
probe() {
  echo "=== $* ==="
  env "${@:2}" timeout 3000 python -u scripts/tune_defaults.py --probe "$1" 2>&1 |
    grep -v "WARNING\|INFO" | tail -3
}
# octant-mid sort key A/B on the bench config (baseline first, same session)
probe box:48
probe box:48 STRELKA_KEY_OCT_MID=18
probe box:48 STRELKA_KEY_OCT_MID=12
# schedule-pure tiles: group lanes by first superblock along the ray
probe box:48 STRELKA_KEY_NEAREST_BLOCK=1
# kitchen attribution: texture sampling on/off at bench config
probe kitchen
probe kitchen STRELKA_NO_TEX=1
# cornell clean re-probe (the tuner's cornell numbers contended with a
# concurrent golden render)
probe cornell
echo "=== coffeetable TPU-vs-CPU-golden diff ==="
timeout 1200 python -u scripts/tpu_golden_diff.py coffeetable /tmp 2>&1 | grep -v "WARNING\|INFO" | tail -5
echo "=== kitchen profile ==="
timeout 3000 python -u scripts/profile_scene.py kitchen 512x512 2 4 2>&1 | grep -v "WARNING\|INFO" | head -40
echo "=== hair_patch profile ==="
timeout 3000 python -u scripts/profile_scene.py hair_patch 384x384 2 4 2>&1 | grep -v "WARNING\|INFO" | head -40
echo "STAGE3 DONE"
