#!/bin/bash
# Round-3 CIFAR flagship rerun: full binarynet at n=2 WITH gains + the
# simulator-chosen per-layer majority plan (the configuration the margin
# analysis selected; forecast 0.81 on 16 rows).  The n=2 run is the
# largest that fits a single session on this tunneled chip (~2250 s:
# first 2-image staged batch compiles+runs in ~2011 s, results/
# tpu_r3_cifar_b.log); it completes the measured-flagship row in
# PERFORMANCE.md.  Run SOLO.  Writes results/tpu_r3_cifar_b2.log.
set -u -o pipefail  # EXIT= line must reflect python/timeout, not tail
cd "$(dirname "$0")/.."
log=results/tpu_r3_cifar_b2.log
: > "$log"
export REDSEC_INPUT_GAIN=1
echo "=== cifar binarynet 2img mplan 5:3,6:5,7:9,8:9  [$(date +%H:%M:%S)]" >> "$log"
timeout 3000 env REDSEC_TIME_MODE=cold REDSEC_MAJORITY_PLAN="5:3,6:5,7:9,8:9" \
  python scripts/run_encrypted_mnist.py \
  --images 2 --batch 2 --model cifar/binarynet \
  --params small_v2_tpu --jit staged 2>&1 | grep -v WARNING | tail -20 >> "$log"
echo "EXIT=$? R3_CIFAR_B2_DONE [$(date +%H:%M:%S)]" >> "$log"
