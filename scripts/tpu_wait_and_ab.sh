#!/bin/bash
# Poll for axon tunnel health (bounded probes), then run the A/B chain.
cd /root/repo
for i in $(seq 1 60); do
  echo "=== probe $i $(date +%H:%M:%S)" 
  timeout 900 python -u -c "import time,jax; t=time.time(); d=jax.devices(); print('devices', d, '%.1fs'%(time.time()-t))" && break
  echo "probe $i failed rc=$?; sleeping 180s"
  sleep 180
done
timeout 300 python -u -c "import jax; jax.devices()" || { echo "TUNNEL STILL DOWN, giving up"; exit 1; }
exec bash scripts/r3_tpu_ab.sh
