#!/bin/bash
# Round-5 on-chip capture plan. Ordering rules learned from rounds 3-4:
# the relay wedges every few hours, so the HEADLINE lands first and every
# artifact is written as it completes; a probe runs between entries and
# the sweep stops cleanly (leaving partials) the moment the relay dies.
#
# The default bench invocation is now headline-only (warmup + 2 reps,
# ~<=15 min); fleet/delta extras are separate opt-in entries at the tail.
#
# Usage: scripts/chip_sweep3.sh [outdir]   (default bench_runs/r05)
set -u
OUT=${1:-bench_runs/r05}
mkdir -p "$OUT"
log() { echo "$(date -u +%FT%TZ) $*" | tee -a "$OUT/sweep.log"; }

probe() {
  # the relay's first fetch from a fresh process can take minutes when a
  # bulk upload is in flight; one retry keeps a flaky probe from skipping a
  # captureable entry (r05c lost 5 entries to probe timeouts while the
  # relay was demonstrably alive)
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

log "=== chip_sweep3 start ==="

# 1. the headline: full pipeline, shipped defaults (VOXELGRID + stride,
#    async loop detection)
run_one full_170 BENCH_MODE=full

# 2. dlo_ggo (the no-LFA delta is derivable from this separate run)
run_one dlo_ggo_170 BENCH_MODE=dlo_ggo

# 3. A/B prefilter variants still unmeasured on chip. NONE+stride is
#    selectable only if its CPU accuracy record exists (advisor r4 gate).
if [ -f BENCH_r05_cpu_accuracy_none_stride.json ]; then
  run_one ab_none_stride BENCH_MODE=full BENCH_DOWNSAMPLE=NONE
else
  log "ab_none_stride SKIPPED: no CPU accuracy record in-tree"
fi
if [ -f BENCH_r05_cpu_accuracy_dedup_stride.json ]; then
  run_one ab_dedup_stride BENCH_MODE=full BENCH_DOWNSAMPLE=DEDUP
else
  log "ab_dedup_stride SKIPPED: no CPU accuracy record in-tree"
fi

# 3b. round-5 A/Bs: the dlo+lfa fusion gain (BENCH_CHAIN=split restores
#     the two-program round-4 path), the async-backend gain (BENCH_ASYNC=0
#     restores the in-line backend — the delta vs full_170 is the overlap
#     win), and A-LOAM's mapping skipFrameNum=2 (gated on its CPU accuracy
#     record, like NONE+stride)
run_one ab_chain_split BENCH_MODE=full BENCH_CHAIN=split
run_one ab_sync_backend BENCH_MODE=full BENCH_ASYNC=0
if [ -f BENCH_r05_cpu_accuracy_lfa_stride2.json ]; then
  run_one ab_lfa_stride2 BENCH_MODE=full BENCH_LFA_STRIDE=2
else
  log "ab_lfa_stride2 SKIPPED: no CPU accuracy record in-tree"
fi
# the combined candidate (zero-sort prefilter + LFA mapping stride): only
# selectable once ITS OWN full-density CPU accuracy record exists — the
# per-variant records don't compose automatically
if [ -f BENCH_r05_cpu_accuracy_turbo.json ]; then
  run_one ab_turbo BENCH_MODE=full BENCH_DOWNSAMPLE=NONE BENCH_LFA_STRIDE=2
else
  log "ab_turbo SKIPPED: no CPU accuracy record in-tree"
fi

# 3c. chunk-size A/B: 64-scan chunks halve the per-chunk relay round trips
#     (pose fetch + ORB fetch each cost 30-500 ms latency); exact-equal
#     output (carry-threaded chunking), so no accuracy record needed
run_one ab_chunk64 BENCH_MODE=full BENCH_CHUNK=64

# 4. extras: LFA delta attribution + fleet retention (separate passes so
#    a mid-run wedge cannot take the headline with it)
run_one full_delta BENCH_MODE=full BENCH_DELTA=1 BENCH_REPS=1
run_one full_fleet BENCH_MODE=full BENCH_FLEET=1 BENCH_REPS=1

# 4b. the multi-loop workload (300-scan double circle, VERDICT r4 #7):
#     heaviest upload (~660 MB through the few-MB/s relay — the 1500 s
#     default timed out mid-upload in the first r5 sweep), so it runs
#     after the headline artifacts are already on disk, with its own cap
if probe; then
  log "multi_loop_300 start"
  timeout 3000 env BENCH_MODE=full BENCH_TRAJECTORY=double_circle BENCH_REPS=1 \
    python bench.py > "$OUT/multi_loop_300.json" 2> "$OUT/multi_loop_300.err"
  log "multi_loop_300 rc=$? $(tail -c 400 "$OUT/multi_loop_300.json" 2>/dev/null)"
else
  log "multi_loop_300 SKIPPED: relay dead"
fi

# 5. profilers
if probe; then
  log "profile_stages start"
  timeout 1200 python scripts/profile_stages.py > "$OUT/profile_stages.txt" 2>&1
  log "profile_stages rc=$?"
fi
if probe; then
  log "profile_lfa start"
  timeout 1200 python scripts/profile_stages.py --lfa > "$OUT/profile_lfa.txt" 2>&1
  log "profile_lfa rc=$?"
fi
if probe; then
  log "profile_backend start"
  timeout 1200 python scripts/profile_stages.py --backend > "$OUT/profile_backend.txt" 2>&1
  log "profile_backend rc=$?"
fi

# 6. winner report: highest tracking_ok throughput whose devkit_t_err is
#    within 2x of the headline's (advisor r4: don't let a loose 0.010 gate
#    crown an accuracy-degrading variant). Falls back to the headline when
#    variants are missing; never compares against 0.
python - "$OUT" << 'EOF'
import json, os, sys
out = sys.argv[1]
entries = {}
for name in ("full_170", "ab_none_stride", "ab_dedup_stride",
             "ab_lfa_stride2", "ab_turbo"):
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
log "=== chip_sweep3 done ==="
