#!/bin/bash
# Resume of scripts/chip_sweep.sh after full_170 completed (14:18Z) and the
# session segment ended mid-dlo_ggo. Same discipline: serialized, bounded,
# probe first.
set -u
cd /root/repo
mkdir -p bench_runs/r04
LOG=bench_runs/r04/sweep.log
echo "=== chip_sweep RESUME $(date -u +%FT%TZ) ===" | tee -a "$LOG"

probe() {
  timeout 90 python -c "
import numpy as np, jax.numpy as jnp
print('probe ok', np.asarray(jnp.zeros(1))[0])" >>"$LOG" 2>&1
}

if ! probe; then
  echo "relay NOT alive — aborting sweep $(date -u +%FT%TZ)" | tee -a "$LOG"
  exit 1
fi

run() {
  local name=$1 tmo=$2; shift 2
  echo "--- $name start $(date -u +%FT%TZ)" | tee -a "$LOG"
  timeout "$tmo" env "$@" python bench.py \
    > "bench_runs/r04/$name.json" 2> "bench_runs/r04/$name.err"
  local rc=$?
  echo "--- $name rc=$rc $(date -u +%FT%TZ)" | tee -a "$LOG"
  tail -c 400 "bench_runs/r04/$name.json" | tee -a "$LOG"; echo | tee -a "$LOG"
}

run dlo_ggo_170 2400 BENCH_MODE=dlo_ggo

run ab_stride 1800 BENCH_MODE=full BENCH_SUBSAMPLE=stride BENCH_FLEET=0 BENCH_REPS=2
run ab_scanreduce 1800 BENCH_MODE=full BENCH_VOXEL_REDUCE=scan BENCH_FLEET=0 BENCH_REPS=2
run ab_dedup 1800 BENCH_MODE=full BENCH_DOWNSAMPLE=DEDUP BENCH_FLEET=0 BENCH_REPS=2
run ab_dedup_stride 1800 BENCH_MODE=full BENCH_DOWNSAMPLE=DEDUP BENCH_SUBSAMPLE=stride BENCH_FLEET=0 BENCH_REPS=2

echo "--- profile_lfa start $(date -u +%FT%TZ)" | tee -a "$LOG"
timeout 1800 python scripts/profile_stages.py --lfa \
  > bench_runs/r04/profile_lfa.txt 2>&1
echo "--- profile_lfa rc=$? $(date -u +%FT%TZ)" | tee -a "$LOG"
timeout 1800 python scripts/profile_stages.py \
  > bench_runs/r04/profile_stages.txt 2>&1
echo "--- profile_stages rc=$? $(date -u +%FT%TZ)" | tee -a "$LOG"

echo "=== chip_sweep RESUME done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
