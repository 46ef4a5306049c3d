#!/bin/bash
# Trimmed round-3 hardware chain for a short window: tuner first (persists
# winners to tuned.json for the driver's bench), then the mxu correctness
# oracle, then quick hair + cornell probes, then a full bench snapshot.
set -x
cd /root/repo
python -u -c "import time,jax; t=time.time(); print('devices', jax.devices(), '%.1fs'%(time.time()-t))" || exit 1
timeout 2700 python -u scripts/tune_defaults.py || true
echo "TUNE DEFAULTS DONE"
oracle_ok=1
timeout 900 python -u scripts/capture_bounce.py 48 || oracle_ok=0
[ "$oracle_ok" = 1 ] && { timeout 900 python -u scripts/oracle_probe.py 48 4096 || oracle_ok=0; }
if [ "$oracle_ok" = 0 ]; then
  python -c "import sys; sys.path.insert(0, '.'); from strelka_tpu import tuned; tuned.write({'mxu_big': False, 'mxu_big_pinned': True})"
  echo "ORACLE FAILED OR SKIPPED - mxu_big pinned off"
fi
echo "ORACLE DONE ok=$oracle_ok"
timeout 600 python -u scripts/hair_probe.py || true
echo "HAIR DONE"
timeout 1200 python -u bench.py || true
echo "ALL DONE"
