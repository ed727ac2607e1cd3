#!/bin/bash
# Watch for the axon TPU tunnel to come back, then run the round-3
# hardware sweep (tools/r3_hw_sweep.sh) exactly once.
#
# The axon plugin HANGS inside `import jax` when the tunnel is down, so
# each probe is a timeout-bounded subprocess. Probe cadence 10 min.
# Log: /tmp/tunnel_watch.log; sweep results: /tmp/r3_sweep.log.
set -u
cd /root/repo
LOG=/tmp/tunnel_watch.log
echo "=== tunnel watch started $(date -u +%FT%TZ) ===" >> "$LOG"
while true; do
  if timeout 300 python -c "import jax; d=jax.devices(); assert d" \
       >> "$LOG" 2>&1; then
    echo "tunnel UP at $(date -u +%FT%TZ) — running sweep" >> "$LOG"
    bash tools/r3_hw_sweep.sh
    echo "sweep finished at $(date -u +%FT%TZ)" >> "$LOG"
    exit 0
  fi
  echo "tunnel still down at $(date -u +%FT%TZ)" >> "$LOG"
  sleep 600
done
