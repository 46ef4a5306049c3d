#!/bin/bash
# Round-5 session-2 follow-up chain: runs after r5s2_chain.sh finishes.
#  - retry the cornell closest_highp COST anchor (tunnel hiccup killed it:
#    "remote_compile: response body closed" rc=1)
#  - closest_prec=high variant (dots-only upgrade) as the cheaper alternative
# Results decide the tuned.json fidelity default (SSIM measured: cornell
# 0.9877 -> 0.9995, coffeetable 0.9799 -> 0.9990 with closest_highp=1).
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/r5s2b.log}
: > "$LOG"

for i in $(seq 1 360); do
  grep -q "CHAIN DONE" /tmp/r5s2.log 2>/dev/null && break
  [ "$i" = 360 ] && { echo "r5s2 never finished; aborting" >> "$LOG"; exit 1; }
  sleep 30
done

probe() {
  echo "=== $1 ===" >> "$LOG"
  local to=$2 sc=$3
  shift 3
  echo "env: $*" >> "$LOG"
  env "$@" timeout "$to" python -u scripts/perf_probe.py "$sc" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}

probe "cornell closest_highp retry" 1500 cornell STRELKA_CLOSEST_HIGHP=1

echo "CHAIN DONE" >> "$LOG"
