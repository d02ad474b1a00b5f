#!/bin/bash
# Round-4 sweep, phase 2: first re-measure the headline with the host-BoW
# loop path (pretrained vocab, zero device calls per BoW query — the round-4
# on-chip profile showed loop detect at 31-36 ms/scan, dominated by vocab
# training + per-keyframe device round trips), then the prefilter A/Bs, then
# the stage profilers. Serialized, bounded, probe-first — and RE-PROBE
# between runs: the relay has died mid-sweep twice.
set -u
cd /root/repo
mkdir -p bench_runs/r04
LOG=bench_runs/r04/sweep.log
echo "=== chip_sweep2 start $(date -u +%FT%TZ) ===" | tee -a "$LOG"

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

# headline re-measures with the host-BoW loop path
run full_170_hostbow 2400 BENCH_MODE=full
run dlo_ggo_170_hostbow 2400 BENCH_MODE=dlo_ggo

# prefilter A/Bs (2 reps, no fleet: speed-pick only — accuracy already
# validated at full density on CPU, see BENCH_r04_cpu_accuracy*.json)
run ab_dedup 1800 BENCH_MODE=full BENCH_DOWNSAMPLE=DEDUP BENCH_FLEET=0 BENCH_REPS=2
run ab_dedup_stride 1800 BENCH_MODE=full BENCH_DOWNSAMPLE=DEDUP BENCH_SUBSAMPLE=stride BENCH_FLEET=0 BENCH_REPS=2
# zero-sort prefilter: NONE+stride skips compaction entirely (elementwise
# distance mask + strided slice are the only prefilter ops)
run ab_none_stride 1800 BENCH_MODE=full BENCH_DOWNSAMPLE=NONE BENCH_SUBSAMPLE=stride BENCH_FLEET=0 BENCH_REPS=2
run ab_stride 1800 BENCH_MODE=full BENCH_SUBSAMPLE=stride BENCH_FLEET=0 BENCH_REPS=2
run ab_scanreduce 1800 BENCH_MODE=full BENCH_VOXEL_REDUCE=scan BENCH_FLEET=0 BENCH_REPS=2

# final headline: whichever A/B won (ties -> baseline full), with the fleet
# extras and full reps — this is the number the round is judged on
best=$(python - <<'EOF'
import json, os
runs = {
    "ab_dedup": "BENCH_DOWNSAMPLE=DEDUP",
    "ab_dedup_stride": "BENCH_DOWNSAMPLE=DEDUP BENCH_SUBSAMPLE=stride",
    "ab_none_stride": "BENCH_DOWNSAMPLE=NONE BENCH_SUBSAMPLE=stride",
    "ab_stride": "BENCH_SUBSAMPLE=stride",
    "ab_scanreduce": "BENCH_VOXEL_REDUCE=scan",
}
base = None
try:
    base = json.load(open("bench_runs/r04/full_170_hostbow.json"))["value"]
except Exception:
    pass
best_env, best_v = "", base or 0
for name, env in runs.items():
    try:
        rec = json.load(open(f"bench_runs/r04/{name}.json"))
        ok = rec.get("extra", {}).get("tracking_ok") in (True, None)
        if rec.get("value") and ok and rec["value"] > best_v * 1.02:
            best_v, best_env = rec["value"], env
    except Exception:
        continue
print(best_env)
EOF
)
if [ -n "$best" ]; then
  echo "--- A/B winner env: $best" | tee -a "$LOG"
  run final_headline 2400 BENCH_MODE=full $best
  run final_dlo_ggo 2400 BENCH_MODE=dlo_ggo $best
fi

echo "--- profile_lfa start $(date -u +%FT%TZ)" | tee -a "$LOG"
timeout 1800 python scripts/profile_stages.py --lfa \
  > bench_runs/r04/profile_lfa.txt 2>&1
echo "--- profile_lfa rc=$? $(date -u +%FT%TZ)" | tee -a "$LOG"
timeout 1800 python scripts/profile_stages.py \
  > bench_runs/r04/profile_stages.txt 2>&1
echo "--- profile_stages rc=$? $(date -u +%FT%TZ)" | tee -a "$LOG"

echo "=== chip_sweep2 done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
