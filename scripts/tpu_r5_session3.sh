#!/bin/bash
# Round-5 session-3 queue (after the 12:38 tunnel collision wedged the
# session-2 stage 4 and the worker recovered — see results/tpu_r5_queue.log):
#  A. TRAINED full binarynet encrypted @8 — calibration comes from the
#     CPU-precomputed artifact (nets_trained/cifar/binarynet/calibration.npz,
#     rows 8:100 held out from eval 0:8), so the only pre-eval device work
#     is the 8-row ptxt oracle.  VERDICT r4 #5 measurement leg.
#  B. flagship (shipped weights) n=8 -> n=16 extension, resumable per
#     2-image batch — runs until the session-end cut.  VERDICT r4 #3.
set -u -o pipefail
cd "$(dirname "$0")/.."
log=results/tpu_r5_queue.log
: >> "$log"

echo "=== STAGE binarynet TRAINED heldout(artifact) eval 0:8  [$(date +%H:%M:%S)]" >> "$log"
timeout 10000 env REDSEC_INPUT_GAIN=1 REDSEC_TIME_MODE=cold \
  python scripts/run_encrypted_mnist.py \
  --images 8 --batch 2 --model cifar/binarynet \
  --varprep nets_trained/cifar/binarynet/var_prep.dat \
  --params small_v2_tpu --jit staged \
  --load-calib nets_trained/cifar/binarynet/calibration.npz \
  --checkpoint results/ck_r5_binarynet_trained.json \
  2>&1 | grep -v WARNING | tail -25 >> "$log"
echo "EXIT=$? [$(date +%H:%M:%S)]" >> "$log"

echo "=== STAGE flagship binarynet n=16 extension  [$(date +%H:%M:%S)]" >> "$log"
timeout 11000 env REDSEC_INPUT_GAIN=1 REDSEC_TIME_MODE=cold \
  REDSEC_MAJORITY_PLAN="5:3,6:5,7:9,8:9" \
  python scripts/run_encrypted_mnist.py \
  --images 16 --batch 2 --model cifar/binarynet \
  --params small_v2_tpu --jit staged \
  --checkpoint results/ck_cifar_flagship.json \
  2>&1 | grep -v WARNING | tail -30 >> "$log"
echo "EXIT=$? [$(date +%H:%M:%S)]" >> "$log"

echo "R5_SESSION3_DONE [$(date +%H:%M:%S)]" >> "$log"
