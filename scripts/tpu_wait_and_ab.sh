#!/bin/bash
# Hybrid wait: the tunnel oscillates between hang and fast-fail. Long probes
# (45 min) so a healthy-but-slow claim can complete; loop for up to ~8h.
cd /root/repo
for i in $(seq 1 11); do
  echo "=== probe $i $(date +%H:%M:%S)"
  timeout 2700 python -u -c "import time,jax; t=time.time(); d=jax.devices(); print('devices', d, '%.1fs'%(time.time()-t))" && exec bash scripts/r3_tpu_ab.sh
  echo "probe $i failed rc=$?"
  sleep 60
done
echo "TUNNEL STILL DOWN after ~8h"
exit 1
