#!/bin/bash
# Round-5b CPU accuracy revalidation: the backend changed (eager feed-time
# verification dispatch, drain-deferred LM) and the verify ladder's Newton
# caps dropped 64/64/64 -> 8/8/16, so the loop-closure records must be
# re-proven at full density before the next chip sweep can ship them:
#
# 1. shipped defaults, 170-scan circle  (headline accuracy + n_loops=1)
# 2. 300-scan double circle             (multi-loop: n_loops >= 3)
#
# Usage: nice -n 19 bash scripts/cpu_accuracy_queue2.sh
set -u
cd "$(dirname "$0")/.."
log() { echo "$(date -u +%FT%TZ) $*" | tee -a cpu_accuracy_queue.log; }

run_one() {  # outfile, env...
  out=$1; shift
  if [ -s "$out" ]; then log "$out exists, skipping"; return 0; fi
  log "$out start"
  timeout 10800 env -u PYTHONPATH JAX_PLATFORMS=cpu BENCH_ACCURACY_ONLY=1 "$@" \
    python bench.py > "$out.tmp" 2> "${out%.json}.err"
  rc=$?
  if [ $rc -eq 0 ] && [ -s "$out.tmp" ]; then mv "$out.tmp" "$out"; fi
  log "$out rc=$rc $(tail -c 300 "$out" 2>/dev/null)"
  return $rc
}

log "=== cpu_accuracy_queue2 (eager backend + 8/8/16 ladder) start ==="
run_one BENCH_r05_cpu_accuracy_eager.json
run_one BENCH_r05_cpu_accuracy_eager_double_circle.json \
  BENCH_TRAJECTORY=double_circle
log "=== cpu_accuracy_queue2 done ==="
