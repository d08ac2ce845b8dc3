#!/bin/bash
# Round-3 probe session: (a) REDSEC_NARROW uint16 fusion-boundary sweep —
# the pass-floor conjecture (PERFORMANCE.md bundle-sweep section) predicts
# halving the two largest per-round tensors' bytes moves throughput;
# (b) small_v2_n2048 retry at tiny batch — round 2's N=2048 crashes used
# batch>=16 whole-model programs; sigma_units halves (7.64 -> 3.82), the
# single biggest accuracy lever if the backend can run it at all.
# Run SOLO. Appends to results/tpu_r3_probe.log.
set -u
cd "$(dirname "$0")/.."
log=results/tpu_r3_probe.log
: > "$log"

run() {
  echo "=== $1  [$(date +%H:%M:%S)]" >> "$log"
  shift
  timeout 1200 "$@" 2>&1 | grep -v WARNING | tail -8 >> "$log"
  echo "" >> "$log"
}

run "plain control b512" env REDSEC_BENCH_ANCHOR=0 REDSEC_BENCH_PARAMS=small_v2_tpu \
    REDSEC_BENCH_BATCH=512 REDSEC_BENCH_ITERS=4 python bench.py
run "narrow b512" env REDSEC_BENCH_ANCHOR=0 REDSEC_NARROW=1 REDSEC_BENCH_PARAMS=small_v2_tpu \
    REDSEC_BENCH_BATCH=512 REDSEC_BENCH_ITERS=4 python bench.py
run "narrow b1024" env REDSEC_BENCH_ANCHOR=0 REDSEC_NARROW=1 REDSEC_BENCH_PARAMS=small_v2_tpu \
    REDSEC_BENCH_BATCH=1024 REDSEC_BENCH_ITERS=3 python bench.py
run "plain control b1024" env REDSEC_BENCH_ANCHOR=0 REDSEC_BENCH_PARAMS=small_v2_tpu \
    REDSEC_BENCH_BATCH=1024 REDSEC_BENCH_ITERS=3 python bench.py

# N=2048 retry: bench first (single PBS program), then a tiny e2e run
run "n2048 bench b128" env REDSEC_BENCH_ANCHOR=0 REDSEC_BENCH_PARAMS=small_v2_n2048 \
    REDSEC_BENCH_BATCH=128 REDSEC_BENCH_ITERS=2 python bench.py
run "n2048 sign1024x1 4img" env REDSEC_INPUT_GAIN=1 python scripts/run_encrypted_mnist.py \
    --images 4 --batch 2 --params small_v2_n2048 --jit staged

echo "R3_PROBE_DONE" >> "$log"
