#!/bin/bash
# Round-4 Stage-A rerun (VERDICT r3 #2): UNTRAINED (shipped) binarynet_small
# at gains, n=8 — the low-regime simulator validation (forecast 0.27 at 16
# images with the r4 sim fixes; the shipped binarynet_small weights are
# near-random, oracle accuracy 0.188).  Resumable in 2-image batches: any
# batches completed before a session/round boundary are preserved in the
# checkpoint and the run continues next session.  Run SOLO.
set -u -o pipefail
cd "$(dirname "$0")/.."
log=results/tpu_r4_cifar_stage_a.log
echo "=== cifar binarynet_small SHIPPED 8img  [$(date +%H:%M:%S)]" >> "$log"
timeout 11000 env REDSEC_INPUT_GAIN=1 REDSEC_TIME_MODE=cold REDSEC_MAX_FLIP=0.5 \
  python scripts/run_encrypted_mnist.py \
  --images 8 --batch 2 --model cifar/binarynet_small \
  --params small_v2_tpu --jit staged \
  --checkpoint results/ck_cifar_stage_a.json 2>&1 | grep -v WARNING | tail -30 >> "$log"
echo "EXIT=$? R4_CIFAR_STAGE_A_DONE [$(date +%H:%M:%S)]" >> "$log"
