#!/bin/bash
# Round-3 session A: the encrypted per-net MNIST matrix at the recommended
# operating point (small_v2_tpu, input gains, flip-optimal sign gains,
# parity tie-break), plus the VPU roofline anchor and a bench control.
# Run SOLO (one tunneled chip). Appends to results/tpu_r3_mnist.log.
set -u
cd "$(dirname "$0")/.."
log=results/tpu_r3_mnist.log
: > "$log"

run() {
  echo "=== $1  [$(date +%H:%M:%S)]" >> "$log"
  shift
  timeout 3000 "$@" 2>&1 | grep -v WARNING | tail -14 >> "$log"
  echo "" >> "$log"
}

export REDSEC_INPUT_GAIN=1

run "bench control + anchor" env REDSEC_BENCH_PARAMS=small_v2_tpu \
    REDSEC_BENCH_BATCH=512 REDSEC_BENCH_ITERS=4 python bench.py
run "vpu anchor (standalone)" python scripts/bench_vpu_anchor.py

run "sign1024x1 100img" python scripts/run_encrypted_mnist.py \
    --images 100 --batch 16 --params small_v2_tpu
run "sign1024x2 32img" python scripts/run_encrypted_mnist.py \
    --images 32 --batch 8 --model mnist/sign1024x2 --params small_v2_tpu --jit layer
run "sign1024x3 32img" python scripts/run_encrypted_mnist.py \
    --images 32 --batch 8 --model mnist/sign1024x3 --params small_v2_tpu --jit layer
run "relu1024x1 32img" python scripts/run_encrypted_mnist.py \
    --images 32 --batch 8 --model mnist/relu1024x1 --params small_v2_tpu
run "relu1024x2 32img" python scripts/run_encrypted_mnist.py \
    --images 32 --batch 4 --model mnist/relu1024x2 --params small_v2_tpu
run "relu1024x3 32img" python scripts/run_encrypted_mnist.py \
    --images 32 --batch 4 --model mnist/relu1024x3 --params small_v2_tpu
run "sample net 32img" python scripts/run_encrypted_mnist.py \
    --images 32 --batch 8 --model sample/sample --params small_v2_tpu --jit layer

echo "R3_MNIST_DONE" >> "$log"
