#!/bin/bash
# Round-5 chain 6: FINE-granularity work-list schedules. PACK_SUPER=1/2
# shrinks the streamed superblock to 256/512 tris; the packed 1-word wl
# budget (184320 entries) plus a raised per-tile cap lets the work list
# enumerate the much sparser fine demand instead of overflowing to the
# rectangular fallback (which is what chain3's PACK_SUPER=2 probe actually
# measured). closest_single skips the K-nearest phase 1 so the whole
# closest path rides the single wl sweep. Waits for chain5 to finish.
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/r5_chain6.log}
: > "$LOG"

# bounded wait for chain5 (ADVICE r4: never spin forever)
for i in $(seq 1 240); do
  grep -q "CHAIN DONE" /tmp/r5_chain5.log 2>/dev/null && break
  [ "$i" = 240 ] && { echo "chain5 never finished; aborting" >> "$LOG"; exit 1; }
  sleep 30
done

probe() {
  echo "=== $1 ===" >> "$LOG"
  shift
  echo "env: $*" >> "$LOG"
  env "$@" timeout 2400 python -u scripts/perf_probe.py "$PROBE_ARG" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}

FINE="STRELKA_CLOSEST_SINGLE=1 STRELKA_WL_MXU=1 STRELKA_CLOSEST_PREC=high STRELKA_ANY_PREC=high STRELKA_WL_CAP=256 STRELKA_WL_FULL_NSB=512"

PROBE_ARG=kitchen
probe "kitchen fine ps1" $FINE STRELKA_PACK_SUPER=1
probe "kitchen fine ps2" $FINE STRELKA_PACK_SUPER=2
probe "kitchen fine ps2 nearest_block" $FINE STRELKA_PACK_SUPER=2 STRELKA_KEY_NEAREST_BLOCK=1
PROBE_ARG=box
probe "box fine ps1" $FINE STRELKA_PACK_SUPER=1
probe "box fine ps2" $FINE STRELKA_PACK_SUPER=2

echo "CHAIN DONE" >> "$LOG"
