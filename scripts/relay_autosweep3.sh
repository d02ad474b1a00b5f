#!/bin/bash
# Probe the TPU relay on a short cadence; the moment it answers, run the
# round-5 sweep (scripts/chip_sweep3.sh) exactly once. Bounded overall so a
# forgotten watcher cannot outlive the round — and it MUST be dead well
# before round end so the driver's own BENCH_r05.json capture never races
# the builder's sweep for the single relay (the probable cause of round 4's
# null official capture; VERDICT r4 missing #2).
set -u
cd /root/repo
LOG=bench_runs/r05/autosweep.log
mkdir -p bench_runs/r05
echo "=== autosweep3 start $(date -u +%FT%TZ) ===" | tee -a "$LOG"

DEADLINE=$(( $(date +%s) + ${AUTOSWEEP_MAX_S:-14400} ))
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if timeout 90 python -c "
import numpy as np, jax.numpy as jnp
print('probe ok', np.asarray(jnp.zeros(1))[0])" >>"$LOG" 2>&1; then
    echo "relay ALIVE $(date -u +%FT%TZ) — starting chip_sweep3" | tee -a "$LOG"
    bash scripts/chip_sweep3.sh >>"$LOG" 2>&1
    echo "=== autosweep3 done rc=$? $(date -u +%FT%TZ) ===" | tee -a "$LOG"
    exit 0
  fi
  echo "probe dead $(date -u +%FT%TZ)" >>"$LOG"
  sleep 300
done
echo "=== autosweep3 deadline reached $(date -u +%FT%TZ) ===" | tee -a "$LOG"
exit 1
