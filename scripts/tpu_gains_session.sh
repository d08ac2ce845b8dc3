#!/bin/bash
# Measure the encoding-gain accuracy improvement + the staged n2048 point
# (the whole-model n2048 program crashed the worker; staged keeps programs
# small). Run SOLO. Appends to /tmp/tpu_gains.log.
set -u
cd "$(dirname "$0")/.."
log=/tmp/tpu_gains.log
: > "$log"

run() {
  echo "=== $1  [$(date +%H:%M:%S)]" >> "$log"
  shift
  timeout 3000 "$@" 2>&1 | grep -v WARNING | tail -12 >> "$log"
  echo "" >> "$log"
}

run "sign1024x1 small_v2_tpu 100img GAINS" python scripts/run_encrypted_mnist.py \
    --images 100 --batch 20 --params small_v2_tpu
run "sign1024x1 small_v2 100img GAINS" python scripts/run_encrypted_mnist.py \
    --images 100 --batch 20 --params small_v2
run "sign1024x1 small_v2_n2048 100img staged" python scripts/run_encrypted_mnist.py \
    --images 100 --batch 20 --params small_v2_n2048 --jit staged
run "relu1024x2 small_v2_tpu 16img GAINS" python scripts/run_encrypted_mnist.py \
    --images 16 --batch 4 --model mnist/relu1024x2 --params small_v2_tpu
run "relu1024x3 small_v2_tpu 8img GAINS" python scripts/run_encrypted_mnist.py \
    --images 8 --batch 4 --model mnist/relu1024x3 --params small_v2_tpu
run "sign1024x3 small_v2_tpu 32img GAINS" python scripts/run_encrypted_mnist.py \
    --images 32 --batch 16 --model mnist/sign1024x3 --params small_v2_tpu
run "cifar binarynet_small small_v2_tpu 2img GAINS" python scripts/run_encrypted_mnist.py \
    --images 2 --batch 1 --model cifar/binarynet_small --params small_v2_tpu

echo "SESSION_DONE" >> "$log"
