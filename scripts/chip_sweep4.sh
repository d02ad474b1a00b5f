#!/bin/bash
# Round-5 follow-up capture: the entries r05c lost to flaky probes plus the
# round-5 code changes (async feed-time verify dispatch, LFA shared flat
# top-k, chunk-size A/B). Headline first; artifacts written as they
# complete; probe retries (the relay's first fetch from a fresh process can
# take minutes while a bulk upload drains).
#
# Usage: scripts/chip_sweep4.sh [outdir]   (default bench_runs/r05d)
set -u
OUT=${1:-bench_runs/r05d}
mkdir -p "$OUT"
log() { echo "$(date -u +%FT%TZ) $*" | tee -a "$OUT/sweep.log"; }

probe() {
  for _ in 1 2; do
    timeout 120 python -c "
import numpy as np, jax.numpy as jnp
print('probe ok', np.asarray(jnp.zeros(1))[0])" >/dev/null 2>&1 && return 0
  done
  return 1
}

run_one() {  # name, env...
  name=$1; shift
  if ! probe; then log "$name SKIPPED: relay dead"; return 1; fi
  log "$name start"
  timeout 1500 env "$@" python bench.py \
    > "$OUT/$name.json" 2> "$OUT/$name.err"
  rc=$?
  log "$name rc=$rc $(tail -c 400 "$OUT/$name.json" 2>/dev/null)"
  return $rc
}

log "=== chip_sweep4 start ==="

# 1. the headline (round-5 shipped code: async backend, feed-time verify
#    dispatch, shared flat/less-flat selection network)
run_one full_170 BENCH_MODE=full

# 2. chunk-size A/B: 64-scan chunks halve per-chunk relay round trips
#    (pose+ORB fetches); exact-equal output (carry-threaded chunking)
run_one ab_chunk64 BENCH_MODE=full BENCH_CHUNK=64

# 3. prefilter + LFA-stride A/Bs (all have full-density CPU accuracy
#    records: BENCH_r05_cpu_accuracy_{dedup_stride,none_stride,lfa_stride2})
run_one ab_dedup_stride BENCH_MODE=full BENCH_DOWNSAMPLE=DEDUP
run_one ab_none_stride BENCH_MODE=full BENCH_DOWNSAMPLE=NONE
run_one ab_lfa_stride2 BENCH_MODE=full BENCH_LFA_STRIDE=2

# 4. async-backend delta (BENCH_ASYNC=0 restores the in-line backend)
run_one ab_sync_backend BENCH_MODE=full BENCH_ASYNC=0

# 5. extras (separate passes so a wedge cannot take the headline)
run_one full_fleet BENCH_MODE=full BENCH_FLEET=1 BENCH_REPS=1
run_one full_delta BENCH_MODE=full BENCH_DELTA=1 BENCH_REPS=1
run_one dlo_ggo_170 BENCH_MODE=dlo_ggo

# 6. profilers (profile_backend is new: ORB batch, verify ladder, window
#    group, LM solve device-exec costs — tells latency from device time)
if probe; then
  log "profile_backend start"
  timeout 1200 python scripts/profile_stages.py --backend > "$OUT/profile_backend.txt" 2>&1
  log "profile_backend rc=$?"
fi
if probe; then
  log "profile_lfa start"
  timeout 1200 python scripts/profile_stages.py --lfa > "$OUT/profile_lfa.txt" 2>&1
  log "profile_lfa rc=$?"
fi
if probe; then
  log "profile_stages start"
  timeout 1200 python scripts/profile_stages.py > "$OUT/profile_stages.txt" 2>&1
  log "profile_stages rc=$?"
fi

# 7. winner report: highest tracking_ok throughput with devkit_t_err within
#    2x of the headline's (advisor r4 gate); never compares against 0
python - "$OUT" << 'EOF'
import json, os, sys
out = sys.argv[1]
entries = {}
for name in ("full_170", "ab_chunk64", "ab_dedup_stride", "ab_none_stride",
             "ab_lfa_stride2", "ab_sync_backend"):
    p = os.path.join(out, name + ".json")
    try:
        with open(p) as f:
            entries[name] = json.loads(f.read().strip().splitlines()[-1])
    except Exception:
        pass
base = entries.get("full_170", {})
base_v = base.get("value") or 0.0
base_err = (base.get("extra") or {}).get("devkit_t_err")
best, best_v = "full_170", base_v
for name, e in entries.items():
    x = e.get("extra") or {}
    v = e.get("value") or 0.0
    if not x.get("tracking_ok"):
        continue
    err = x.get("devkit_t_err")
    if base_err and err and err > 2.0 * base_err:
        continue
    if v > best_v:
        best, best_v = name, v
print(json.dumps({"winner": best, "value": best_v,
                  "headline": base_v or None}))
EOF
log "=== chip_sweep4 done ==="
