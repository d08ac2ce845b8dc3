#!/bin/bash
# Round-3 CIFAR stage B: full binarynet at n=8 WITH gains + the
# simulator-chosen per-layer majority plan (VERDICT r2 #1/#3).  Forecast
# comparison on the same 16 rows (trials=3): plain 0.75, this plan 0.8125,
# n2048 plain 0.83, n2048+maj3 0.81 — i.e. the plan reaches the cascade
# ceiling at 1.62x cost instead of 7.5-30x.  L7/L8 votes are ~free (1k
# boots each); L6's maj5 is the main cost.
# Run SOLO. Appends to results/tpu_r3_cifar_b.log.
set -u
cd "$(dirname "$0")/.."
log=results/tpu_r3_cifar_b.log
: > "$log"

run() {
  echo "=== $1  [$(date +%H:%M:%S)]" >> "$log"
  shift
  timeout 14000 "$@" 2>&1 | grep -v WARNING | tail -14 >> "$log"
  echo "" >> "$log"
}

export REDSEC_INPUT_GAIN=1

run "cifar binarynet 8img mplan 5:3,6:5,7:9,8:9" env \
    REDSEC_MAJORITY_PLAN="5:3,6:5,7:9,8:9" python scripts/run_encrypted_mnist.py \
    --images 8 --batch 2 --model cifar/binarynet \
    --params small_v2_tpu --jit staged

echo "R3_CIFAR_B_DONE" >> "$log"
