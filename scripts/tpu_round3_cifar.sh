#!/bin/bash
# Round-3 session B: encrypted CIFAR at n>=16 (binarynet_small) and n>=8
# (binarynet), WITH input gains + flip-optimal sign gains + parity
# tie-break (VERDICT r2 #1). Staged runtime streams the 262k-521k
# bootstraps/image through 16k-bootstrap macro programs.
# Run SOLO after tpu_round3_mnist.sh. Appends to results/tpu_r3_cifar.log.
set -u
cd "$(dirname "$0")/.."
log=results/tpu_r3_cifar.log
: > "$log"

run() {
  echo "=== $1  [$(date +%H:%M:%S)]" >> "$log"
  shift
  timeout 14000 "$@" 2>&1 | grep -v WARNING | tail -14 >> "$log"
  echo "" >> "$log"
}

export REDSEC_INPUT_GAIN=1

run "cifar binarynet_small 16img" python scripts/run_encrypted_mnist.py \
    --images 16 --batch 4 --model cifar/binarynet_small \
    --params small_v2_tpu --jit staged
run "cifar binarynet 8img" python scripts/run_encrypted_mnist.py \
    --images 8 --batch 2 --model cifar/binarynet \
    --params small_v2_tpu --jit staged

echo "R3_CIFAR_DONE" >> "$log"
