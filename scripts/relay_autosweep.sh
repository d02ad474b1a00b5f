#!/bin/bash
# Probe the TPU relay on a short cadence; the moment it answers, run the
# phase-2 sweep (scripts/chip_sweep2.sh) exactly once. Bounded overall so a
# forgotten watcher cannot outlive the round.
set -u
cd /root/repo
LOG=bench_runs/r04/autosweep.log
mkdir -p bench_runs/r04
echo "=== autosweep start $(date -u +%FT%TZ) ===" | tee -a "$LOG"

DEADLINE=$(( $(date +%s) + ${AUTOSWEEP_MAX_S:-14400} ))
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if timeout 90 python -c "
import numpy as np, jax.numpy as jnp
print('probe ok', np.asarray(jnp.zeros(1))[0])" >>"$LOG" 2>&1; then
    echo "relay ALIVE $(date -u +%FT%TZ) — starting chip_sweep2" | tee -a "$LOG"
    bash scripts/chip_sweep2.sh >>"$LOG" 2>&1
    echo "=== autosweep done rc=$? $(date -u +%FT%TZ) ===" | tee -a "$LOG"
    exit 0
  fi
  echo "probe dead $(date -u +%FT%TZ)" >>"$LOG"
  sleep 300
done
echo "=== autosweep deadline reached $(date -u +%FT%TZ) ===" | tee -a "$LOG"
exit 1
