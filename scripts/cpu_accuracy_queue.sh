#!/bin/bash
# Round-5 CPU accuracy validations, in priority order; each record is
# written as it completes (the 1-core host takes ~1-2 h per 170-scan run,
# so the queue must survive being cut off at any point).
#
# 1. shipped defaults through the NEW fused dlo+lfa chain (the headline
#    path this round) — revalidates devkit_t_err + n_loops at full density
# 2. NONE+stride — the advisor-required record gating ab_none_stride in
#    scripts/chip_sweep3.sh (zero-sort prefilter, most accuracy-risky A/B)
# 3. reference DBoW3 vocabulary at its native scale (VERDICT r4 #8)
# 4. double-circle multi-loop workload, 300 scans (VERDICT r4 #7)
#
# Usage: nice -n 19 bash scripts/cpu_accuracy_queue.sh
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

log "=== cpu_accuracy_queue start ==="
# (the shipped-defaults fused-chain accuracy is already validated ON CHIP at
# full density — bench_runs/r05/full_170.json devkit_t_err 0.00049 — so the
# queue leads with the records that GATE unmeasured A/B variants)
run_one BENCH_r05_cpu_accuracy_none_stride.json \
  BENCH_DOWNSAMPLE=NONE BENCH_SUBSAMPLE=stride
run_one BENCH_r05_cpu_accuracy_lfa_stride2.json BENCH_LFA_STRIDE=2
run_one BENCH_r05_cpu_accuracy_refvocab.json \
  BENCH_VOCAB=/root/reference/config/vocabulary.yml.gz
run_one BENCH_r05_cpu_accuracy_dedup_stride.json BENCH_DOWNSAMPLE=DEDUP
run_one BENCH_r05_cpu_accuracy_double_circle.json \
  BENCH_TRAJECTORY=double_circle
log "=== cpu_accuracy_queue done ==="
