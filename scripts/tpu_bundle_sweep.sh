#!/bin/bash
# Bundled blind rotation (REDSEC_BUNDLE=2) vs plain, at small_v2_tpu and
# small_v2_tpu2, back-to-back in ONE session (throughput drifts ~1.6x between
# sessions; in-session ratios are stable). Run SOLO.
set -u
cd "$(dirname "$0")/.."
log=results/tpu_bundle_sweep.log
: > "$log"
run() {
  echo "=== $1  [$(date +%H:%M:%S)]" >> "$log"
  shift
  timeout 1200 "$@" 2>&1 | grep -v WARNING | tail -2 >> "$log"
  echo "" >> "$log"
}
B="env REDSEC_BENCH_BATCH=512 REDSEC_BENCH_ITERS=4"
run "tpu plain"      $B REDSEC_BENCH_PARAMS=small_v2_tpu python bench.py
run "tpu bundled"    $B REDSEC_BENCH_PARAMS=small_v2_tpu REDSEC_BUNDLE=2 python bench.py
run "tpu2 plain"     $B REDSEC_BENCH_PARAMS=small_v2_tpu2 python bench.py
run "tpu2 bundled"   $B REDSEC_BENCH_PARAMS=small_v2_tpu2 REDSEC_BUNDLE=2 python bench.py
run "tpu plain again" $B REDSEC_BENCH_PARAMS=small_v2_tpu python bench.py
echo "BUNDLE_SWEEP_DONE" >> "$log"
