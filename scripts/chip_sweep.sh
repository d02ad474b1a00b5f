#!/bin/bash
# Round-4 on-chip capture plan: run the moment the TPU relay answers.
#
# Captures, SERIALIZED (one TPU job at a time — concurrent processes starve
# the single relay tunnel), each bounded by a timeout and written to a file:
#   1. flagship full bench (170-scan loop-closing honest workload)
#   2. dlo_ggo bench (the >=100 scans/s north-star topology)
#   3. A/B variants (subsample=stride, voxel_reduce=scan, downsample=DEDUP)
#      at BENCH_FLEET=0 to keep each pass short — the pick is speed-only
#      (accuracy of all variants already validated at full density on CPU,
#      BENCH_r04_cpu_accuracy.json and ab/ records)
#   4. LFA + stage profiler (scripts/profile_stages.py)
#
# Usage: bash scripts/chip_sweep.sh   (from /root/repo)
set -u
cd /root/repo
mkdir -p bench_runs/r04
LOG=bench_runs/r04/sweep.log
echo "=== chip_sweep start $(date -u +%FT%TZ) ===" | tee -a "$LOG"

# stop the background relay-probe loop: it dispatches device ops every 10
# min and TPU jobs must be serialized (kill by PID, never by pattern)
if [ -f /tmp/relay_probe.pid ]; then
  kill "$(cat /tmp/relay_probe.pid)" 2>/dev/null && echo "probe loop stopped" | tee -a "$LOG"
  rm -f /tmp/relay_probe.pid
fi

probe() {
  timeout 90 python -c "
import numpy as np, jax.numpy as jnp
print('probe ok', np.asarray(jnp.zeros(1))[0])" >>"$LOG" 2>&1
}

if ! probe; then
  echo "relay NOT alive — aborting sweep $(date -u +%FT%TZ)" | tee -a "$LOG"
  exit 1
fi

run() { # run <name> <timeout_s> <env...> -- captures stdout+stderr
  local name=$1 tmo=$2; shift 2
  echo "--- $name start $(date -u +%FT%TZ)" | tee -a "$LOG"
  timeout "$tmo" env "$@" python bench.py \
    > "bench_runs/r04/$name.json" 2> "bench_runs/r04/$name.err"
  local rc=$?
  echo "--- $name rc=$rc $(date -u +%FT%TZ)" | tee -a "$LOG"
  tail -c 400 "bench_runs/r04/$name.json" | tee -a "$LOG"; echo | tee -a "$LOG"
}

# 1. the headline: full flagship, loops+BoW+fleet extras (longest)
run full_170 3600 BENCH_MODE=full

# 2. the north-star topology
run dlo_ggo_170 2400 BENCH_MODE=dlo_ggo

# 3. A/B speed picks (no fleet, 2 reps — short passes)
run ab_stride 1800 BENCH_MODE=full BENCH_SUBSAMPLE=stride BENCH_FLEET=0 BENCH_REPS=2
run ab_scanreduce 1800 BENCH_MODE=full BENCH_VOXEL_REDUCE=scan BENCH_FLEET=0 BENCH_REPS=2
run ab_dedup 1800 BENCH_MODE=full BENCH_DOWNSAMPLE=DEDUP BENCH_FLEET=0 BENCH_REPS=2
# combined best-case candidate: no segment reduction + zero-gather subsample
run ab_dedup_stride 1800 BENCH_MODE=full BENCH_DOWNSAMPLE=DEDUP BENCH_SUBSAMPLE=stride BENCH_FLEET=0 BENCH_REPS=2

# 4. profilers (bounded; failures must not block the record)
echo "--- profile_lfa start $(date -u +%FT%TZ)" | tee -a "$LOG"
timeout 1800 python scripts/profile_stages.py --lfa \
  > bench_runs/r04/profile_lfa.txt 2>&1
echo "--- profile_lfa rc=$? $(date -u +%FT%TZ)" | tee -a "$LOG"
timeout 1800 python scripts/profile_stages.py \
  > bench_runs/r04/profile_stages.txt 2>&1
echo "--- profile_stages rc=$? $(date -u +%FT%TZ)" | tee -a "$LOG"

echo "=== chip_sweep done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
