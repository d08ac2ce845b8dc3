#!/bin/bash
# Round-5 session-4 queue: after the 14:19 RESOURCE_EXHAUSTED crash (device
# worker out of memory after ~85 min of large staged programs; batches
# 0/2/4 of the trained-binarynet run are checkpointed), re-ordered by
# value-at-risk while the worker is healthy again (b512 control 799.9,
# vs_passfloor 0.958):
#  A. finish TRAINED binarynet @8 (resume: one 2-image batch)
#  B. pointwise-fix A/B probe + n2048 letter re-run (tpu_r5_fixprobe.sh)
#  C. flagship n=16 extension — runs last, until the session-end cut;
#     every 2-image batch is checkpointed.
set -u -o pipefail
cd "$(dirname "$0")/.."
log=results/tpu_r5_queue.log
: >> "$log"

echo "=== STAGE binarynet TRAINED resume (batch 6 of 8)  [$(date +%H:%M:%S)]" >> "$log"
timeout 4000 env REDSEC_INPUT_GAIN=1 REDSEC_TIME_MODE=cold \
  python scripts/run_encrypted_mnist.py \
  --images 8 --batch 2 --model cifar/binarynet \
  --varprep nets_trained/cifar/binarynet/var_prep.dat \
  --params small_v2_tpu --jit staged \
  --load-calib nets_trained/cifar/binarynet/calibration.npz \
  --checkpoint results/ck_r5_binarynet_trained.json \
  2>&1 | grep -v WARNING | tail -16 >> "$log"
echo "EXIT=$? [$(date +%H:%M:%S)]" >> "$log"

echo "=== STAGE fixprobe+letter  [$(date +%H:%M:%S)]" >> "$log"
bash scripts/tpu_r5_fixprobe.sh
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

echo "R5_SESSION4_DONE [$(date +%H:%M:%S)]" >> "$log"
