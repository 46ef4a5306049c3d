#!/bin/bash
# Round-4 final session, stage 2 (runs after r4_final_chain.sh):
#  a) cornell flat_compact A/B — the headline is 98.8 vs the 100 Mrays/s
#     target; the dead-to-tail partition was built for exactly this class
#     and its r4 tuner measurement was lost with tuned.json.
#  b) TPU arms of the SSIM-vs-spp experiment (CPU arms in /tmp/*_cpu_x4.png).
set -u
cd /root/repo
LOG=/root/repo/r4_final2.log
: > "$LOG"
# Bounded wait: give up after ~40 min if the upstream chain never finishes
# (a dead chain would otherwise leave this process spinning forever).
for i in $(seq 1 120); do
  grep -q "CHAIN DONE" /root/repo/r4_final.log 2>/dev/null && break
  [ "$i" = 120 ] && { echo "upstream chain never finished; aborting" >> "$LOG"; exit 1; }
  sleep 20
done
probe() {
  echo "=== $* ===" >> "$LOG"
  timeout 1200 "$@" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}
probe python scripts/perf_probe.py cornell
probe env STRELKA_FLAT_COMPACT=1 python scripts/perf_probe.py cornell
probe python scripts/ssim_spp_probe.py cornell 4 /tmp/cornell_tpu_x4.png
probe python scripts/ssim_spp_probe.py coffeetable 4 /tmp/coffeetable_tpu_x4.png
probe env PROBE_CPU=1 python scripts/ssim_spp_probe.py --ssim /tmp/cornell_cpu_x4.png /tmp/cornell_tpu_x4.png
probe env PROBE_CPU=1 python scripts/ssim_spp_probe.py --ssim /tmp/coffeetable_cpu_x4.png /tmp/coffeetable_tpu_x4.png
echo "CHAIN2 DONE" >> "$LOG"
