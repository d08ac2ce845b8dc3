#!/bin/bash
# Round-2 serial TPU measurement session. Run SOLO (one tunneled chip).
# Produces: measured encrypted accuracy at three parameter points (VERDICT
# item 2), encrypted relu nets at production params (item 4), and encrypted
# CIFAR end-to-end (item 1). Appends to /tmp/tpu_r2.log.
set -u
cd "$(dirname "$0")/.."
log=/tmp/tpu_r2.log
: > "$log"

run() {
  echo "=== $1  [$(date +%H:%M:%S)]" >> "$log"
  shift
  timeout 3000 "$@" 2>&1 | grep -v WARNING | tail -14 >> "$log"
  echo "" >> "$log"
}

# encrypted MNIST accuracy over the full 100-row set, three operating points
run "sign1024x1 small_v2_tpu 100img" python scripts/run_encrypted_mnist.py \
    --images 100 --batch 20 --params small_v2_tpu
run "sign1024x1 small_v2 100img" python scripts/run_encrypted_mnist.py \
    --images 100 --batch 20 --params small_v2
run "sign1024x1 small_v2_n2048 100img" python scripts/run_encrypted_mnist.py \
    --images 100 --batch 20 --params small_v2_n2048

# encrypted relu nets at production params (quarter + FDFB full-range paths)
run "relu1024x1 small_v2_tpu 32img" python scripts/run_encrypted_mnist.py \
    --images 32 --batch 16 --model mnist/relu1024x1 --params small_v2_tpu
run "relu1024x2 small_v2_tpu 16img" python scripts/run_encrypted_mnist.py \
    --images 16 --batch 4 --model mnist/relu1024x2 --params small_v2_tpu

# encrypted CIFAR end-to-end (staged runtime; the flagship workload)
run "cifar binarynet_small small_v2_tpu 2img" python scripts/run_encrypted_mnist.py \
    --images 2 --batch 1 --model cifar/binarynet_small --params small_v2_tpu
run "cifar binarynet small_v2_tpu 1img" python scripts/run_encrypted_mnist.py \
    --images 1 --batch 1 --model cifar/binarynet --params small_v2_tpu

echo "SESSION_DONE" >> "$log"
