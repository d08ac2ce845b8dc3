#!/bin/bash
# Perf sweep 3: the repaired blind mega-kernel (block-spec fix), radix-4
# default confirmation at higher iters, and in-context ablation attribution
# at the new default. Run SOLO. Appends to results/tpu_perf_sweep3.log.
set -u
cd "$(dirname "$0")/.."
log=results/tpu_perf_sweep3.log
: > "$log"

run() {
  echo "=== $1  [$(date +%H:%M:%S)]" >> "$log"
  shift
  timeout 1200 "$@" 2>&1 | grep -v WARNING | tail -3 >> "$log"
  echo "" >> "$log"
}
B="env REDSEC_BENCH_PARAMS=small_v2_tpu REDSEC_BENCH_BATCH=512 REDSEC_BENCH_ITERS=3"

run "default (radix4) iters6"  env REDSEC_BENCH_PARAMS=small_v2_tpu REDSEC_BENCH_BATCH=512 REDSEC_BENCH_ITERS=6 python bench.py
run "blind kernel t32"         $B REDSEC_NTT=matmul REDSEC_BLIND_KERNEL=1 REDSEC_BLIND_TILE=32 python bench.py
run "blind kernel t64"         $B REDSEC_NTT=matmul REDSEC_BLIND_KERNEL=1 REDSEC_BLIND_TILE=64 python bench.py
run "blind kernel t128"        $B REDSEC_NTT=matmul REDSEC_BLIND_KERNEL=1 REDSEC_BLIND_TILE=128 python bench.py
run "ABLATE rotate (radix4)"   $B REDSEC_ABLATE=rotate python bench.py
run "ABLATE extprod (radix4)"  $B REDSEC_ABLATE=extprod python bench.py
run "ABLATE pointwise"         $B REDSEC_ABLATE=pointwise python bench.py
run "ABLATE intt"              $B REDSEC_ABLATE=intt python bench.py

echo "SWEEP3_DONE" >> "$log"
