#!/bin/bash
# Round-5 session-2 chain E: the north-star Kitchen render (VERDICT r5 task
# 7) at the reference showcase config, wall-clock-budgeted so it exits
# cleanly (checkpoint + interim BENCH_northstar.json row) before the driver
# needs the chip. Runs after chain D's fidelity probes.
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/r5s2e.log}
BUDGET=${2:-3600}
: > "$LOG"

for i in $(seq 1 600); do
  grep -q "CHAIN DONE" /tmp/r5s2d.log 2>/dev/null && break
  [ "$i" = 600 ] && { echo "r5s2d never finished; aborting" >> "$LOG"; exit 1; }
  sleep 30
done

python -u scripts/northstar.py --w 1024 --h 768 --spp 2048 --depth 4 \
  --ckpt-every 32 --max-seconds "$BUDGET" >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"
echo "CHAIN DONE" >> "$LOG"
