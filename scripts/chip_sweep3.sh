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
  timeout 90 python -c "
import numpy as np, jax.numpy as jnp
print('probe ok', np.asarray(jnp.zeros(1))[0])" >/dev/null 2>&1
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
run_one ab_dedup_stride BENCH_MODE=full BENCH_DOWNSAMPLE=DEDUP

# 4. extras: LFA delta attribution + fleet retention (separate passes so
#    a mid-run wedge cannot take the headline with it)
run_one full_delta BENCH_MODE=full BENCH_DELTA=1 BENCH_REPS=1
run_one full_fleet BENCH_MODE=full BENCH_FLEET=1 BENCH_REPS=1

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

# 6. winner report: highest tracking_ok throughput whose devkit_t_err is
#    within 2x of the headline's (advisor r4: don't let a loose 0.010 gate
#    crown an accuracy-degrading variant). Falls back to the headline when
#    variants are missing; never compares against 0.
python - "$OUT" << 'EOF'
import json, os, sys
out = sys.argv[1]
entries = {}
for name in ("full_170", "ab_none_stride", "ab_dedup_stride"):
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
