#!/bin/bash
# Patient axon-tunnel waiter: re-probe until jax.devices() answers, then run
# the round-3 A/B chain unattended. NEVER kills a hung probe (fact #18:
# killing a TPU client mid-op wedges the tunnel) — a hung probe is left to
# finish; a fast-failed probe is retried after a sleep.
cd /root/repo
PROBE_LOG=/tmp/tpu_probe.log
PROBE_PID_F=/tmp/tpu_probe.pid
CHAIN_LOG=/tmp/r3_ab6.log

start_probe() {
  # "> log" truncates: no stale 'matmul ok' from an earlier run can gate
  nohup python -u -c "
import time
t0=time.time()
import jax
d = jax.devices()
print('devices', d, 'in', time.time()-t0, 's', flush=True)
import jax.numpy as jnp
import numpy as np
x = jnp.ones((256,256)) @ jnp.ones((256,256))
print('matmul ok', float(np.asarray(x)[0,0]), time.time()-t0, flush=True)
" > "$PROBE_LOG" 2>&1 &
  echo $! > "$PROBE_PID_F"
}

# startup: adopt a LIVE probe (its log is current); otherwise start fresh so
# the gate below never reads a previous run's log
pid=$(cat "$PROBE_PID_F" 2>/dev/null)
if [ -z "$pid" ] || ! kill -0 "$pid" 2>/dev/null; then
  start_probe
fi

n=0
while true; do
  if grep -q "matmul ok" "$PROBE_LOG" 2>/dev/null; then
    echo "=== tunnel healthy at $(date), launching chain" >> "$CHAIN_LOG"
    bash scripts/r3_tpu_ab.sh >> "$CHAIN_LOG" 2>&1
    echo "=== chain finished rc=$? at $(date)" >> "$CHAIN_LOG"
    exit 0
  fi
  pid=$(cat "$PROBE_PID_F" 2>/dev/null)
  if [ -z "$pid" ] || ! kill -0 "$pid" 2>/dev/null; then
    # probe exited without success (fast fail) -> sleep, re-probe
    n=$((n+1))
    echo "probe restart $n at $(date)" >> "$CHAIN_LOG"
    sleep 120
    start_probe
  else
    sleep 60   # probe still running (hung or connecting) — be patient
  fi
done
