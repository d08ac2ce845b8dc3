#!/bin/bash
# Round-2b measurement session: the encrypted workloads still missing from
# PERFORMANCE.md — sign1024x2/x3 (staged, under the program-size ceiling),
# relu1024x1 with forced FDFB, and cifar/binarynet with encoding gains.
# Run SOLO. BEST env below is filled from the sweep-2 winner.
set -u
cd "$(dirname "$0")/.."
log=results/tpu_r2b_session.log
: > "$log"

# best rotation config from results/tpu_perf_sweep2.log (set before running)
BEST="${BEST:-}"

run() {
  echo "=== $1  [$(date +%H:%M:%S)]" >> "$log"
  shift
  timeout 2400 env $BEST "$@" 2>&1 | grep -v WARNING | tail -8 >> "$log"
  echo "" >> "$log"
}

R="python scripts/run_encrypted_mnist.py --params small_v2_tpu"

run "sign1024x2 32img staged"  $R --model mnist/sign1024x2 --images 32 --jit staged --batch 8
run "sign1024x3 32img staged"  $R --model mnist/sign1024x3 --images 32 --jit staged --batch 8
run "relu1024x1 32img FDFB"    env REDSEC_RELU_MODE=full $R --model mnist/relu1024x1 --images 32 --batch 8
run "cifar binarynet 2img gains" $R --model cifar/binarynet --images 2 --jit staged --batch 1
run "bench final"              env REDSEC_BENCH_BATCH=512 REDSEC_BENCH_ITERS=3 python bench.py

echo "SESSION_DONE" >> "$log"
