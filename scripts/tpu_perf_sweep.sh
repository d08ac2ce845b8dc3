#!/bin/bash
# Roofline-gap sweep on the real chip (VERDICT r1 item 3): loop unrolling,
# NTT flavors, mega-kernel tiles. Run SOLO. Appends to /tmp/tpu_perf.log.
set -u
cd "$(dirname "$0")/.."
log=results/tpu_perf_sweep.log
: > "$log"

run() {
  echo "=== $1  [$(date +%H:%M:%S)]" >> "$log"
  shift
  timeout 1200 "$@" 2>&1 | grep -v WARNING | tail -2 >> "$log"
  echo "" >> "$log"
}
B="env REDSEC_BENCH_PARAMS=small_v2_tpu REDSEC_BENCH_BATCH=512 REDSEC_BENCH_ITERS=3"

run "baseline radix2/lazy u1"      $B python bench.py
run "unroll 2"                     $B REDSEC_UNROLL=2 python bench.py
run "unroll 5"                     $B REDSEC_UNROLL=5 python bench.py
run "unroll 10"                    $B REDSEC_UNROLL=10 python bench.py
run "matmul ntt + gemm"            $B REDSEC_NTT=matmul python bench.py
run "matmul + gemm + u5"           $B REDSEC_NTT=matmul REDSEC_UNROLL=5 python bench.py
run "blind kernel t32"             $B REDSEC_NTT=matmul REDSEC_BLIND_KERNEL=1 REDSEC_BLIND_TILE=32 python bench.py
run "blind kernel t64"             $B REDSEC_NTT=matmul REDSEC_BLIND_KERNEL=1 REDSEC_BLIND_TILE=64 python bench.py
run "blind kernel t128"            $B REDSEC_NTT=matmul REDSEC_BLIND_KERNEL=1 REDSEC_BLIND_TILE=128 python bench.py
run "rot radix 4 u1"               $B REDSEC_ROT_RADIX=4 python bench.py
run "batch 256 best-pending"       env REDSEC_BENCH_PARAMS=small_v2_tpu REDSEC_BENCH_BATCH=256 REDSEC_BENCH_ITERS=6 python bench.py
run "batch 768"                    env REDSEC_BENCH_PARAMS=small_v2_tpu REDSEC_BENCH_BATCH=768 REDSEC_BENCH_ITERS=2 python bench.py
echo "SWEEP_DONE" >> "$log"
