#!/bin/bash
# Perf sweep round 2: rotation is the lever (~70% of round time). Higher
# select radices, the gather formulation, and combos with the best round-1
# settings. Plus a full-traceback repro of the blind-kernel failure.
# Run SOLO. Appends to results/tpu_perf_sweep2.log.
set -u
cd "$(dirname "$0")/.."
log=results/tpu_perf_sweep2.log
: > "$log"

run() {
  echo "=== $1  [$(date +%H:%M:%S)]" >> "$log"
  shift
  timeout 1200 "$@" 2>&1 | grep -v WARNING | tail -2 >> "$log"
  echo "" >> "$log"
}
B="env REDSEC_BENCH_PARAMS=small_v2_tpu REDSEC_BENCH_BATCH=512 REDSEC_BENCH_ITERS=3"

run "rot radix 8"              $B REDSEC_ROT_RADIX=8 python bench.py
run "rot radix 16"             $B REDSEC_ROT_RADIX=16 python bench.py
run "rot radix 32"             $B REDSEC_ROT_RADIX=32 python bench.py
run "rot gather"               $B REDSEC_ROT_MODE=gather python bench.py
run "radix4 + unroll2"         $B REDSEC_ROT_RADIX=4 REDSEC_UNROLL=2 python bench.py
run "radix8 + unroll2"         $B REDSEC_ROT_RADIX=8 REDSEC_UNROLL=2 python bench.py
run "radix4 + matmul/gemm u5"  $B REDSEC_ROT_RADIX=4 REDSEC_NTT=matmul REDSEC_UNROLL=5 python bench.py
run "radix8 + matmul/gemm u5"  $B REDSEC_ROT_RADIX=8 REDSEC_NTT=matmul REDSEC_UNROLL=5 python bench.py

echo "=== blind kernel t64 FULL TRACEBACK  [$(date +%H:%M:%S)]" >> "$log"
env REDSEC_BENCH_PARAMS=small_v2_tpu REDSEC_BENCH_BATCH=512 REDSEC_BENCH_ITERS=1 \
    REDSEC_NTT=matmul REDSEC_BLIND_KERNEL=1 REDSEC_BLIND_TILE=64 \
    JAX_TRACEBACK_FILTERING=off \
    timeout 1200 python bench.py 2>&1 | grep -v WARNING | tail -40 >> "$log"

echo "SWEEP2_DONE" >> "$log"
