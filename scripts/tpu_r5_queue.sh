#!/bin/bash
# Round-5 TPU work queue (run SOLO, after tpu_r5_heldout.sh):
#  1. relu1024x1 BYON-TRAINED encrypted @32 (VERDICT #6 measurement leg)
#  2. n2048 anomaly batch sweep (VERDICT #2)
#  3. full cifar/binarynet training on the chip (VERDICT #5 train leg)
#  4. flagship n=8 -> n=16 extension (VERDICT #3; resumable checkpoint)
#  5. TRAINED full binarynet encrypted @8 (VERDICT #5 measurement leg)
# Everything resumable/bracketed; a wedge costs at most one stage.
set -u -o pipefail
cd "$(dirname "$0")/.."
log=results/tpu_r5_queue.log
: >> "$log"

stage() { echo "=== STAGE $1  [$(date +%H:%M:%S)]" >> "$log"; }

# 1. relu-trained encrypted: calibrate on (training) rows 32:100, eval 0:32
stage "relu1024x1 TRAINED heldout-calib eval 0:32"
timeout 3600 env REDSEC_INPUT_GAIN=1 python scripts/run_encrypted_mnist.py \
  --images 32 --batch 16 --model mnist/relu1024x1 \
  --varprep nets_trained/mnist/relu1024x1/var_prep.dat \
  --params small_v2_tpu --calib-rows 32:100 \
  --save-calib nets_trained/mnist/relu1024x1/calibration.npz \
  --checkpoint results/ck_r5_relu_trained.json \
  2>&1 | grep -v WARNING | tail -25 >> "$log"
echo "EXIT=$? [$(date +%H:%M:%S)]" >> "$log"

# 2. n2048 sweep (writes its own log)
stage "n2048 sweep -> results/tpu_r5_n2048.log"
bash scripts/tpu_r5_n2048.sh
echo "EXIT=$? [$(date +%H:%M:%S)]" >> "$log"

# 3. full binarynet training on the chip (scan-chunked steps)
stage "train cifar/binarynet on TPU"
timeout 7000 python scripts/train_cifar_small.py \
  --model cifar/binarynet --device tpu --steps 1500 \
  2>&1 | grep -v WARNING | tail -25 >> "$log"
echo "EXIT=$? [$(date +%H:%M:%S)]" >> "$log"

# 4. flagship extension to n=16 (reuses the r4 checkpoint's 8 images)
stage "flagship binarynet n=16 extension"
timeout 11000 env REDSEC_INPUT_GAIN=1 REDSEC_TIME_MODE=cold \
  REDSEC_MAJORITY_PLAN="5:3,6:5,7:9,8:9" \
  python scripts/run_encrypted_mnist.py \
  --images 16 --batch 2 --model cifar/binarynet \
  --params small_v2_tpu --jit staged \
  --checkpoint results/ck_cifar_flagship.json \
  2>&1 | grep -v WARNING | tail -30 >> "$log"
echo "EXIT=$? [$(date +%H:%M:%S)]" >> "$log"

# 5. TRAINED full binarynet encrypted @8, held-out calibration
stage "binarynet TRAINED heldout eval 0:8 calib 8:100"
timeout 11000 env REDSEC_INPUT_GAIN=1 REDSEC_TIME_MODE=cold \
  python scripts/run_encrypted_mnist.py \
  --images 8 --batch 2 --model cifar/binarynet \
  --varprep nets_trained/cifar/binarynet/var_prep.dat \
  --params small_v2_tpu --jit staged --calib-rows 8:100 \
  --save-calib nets_trained/cifar/binarynet/calibration.npz \
  --checkpoint results/ck_r5_binarynet_trained.json \
  2>&1 | grep -v WARNING | tail -25 >> "$log"
echo "EXIT=$? [$(date +%H:%M:%S)]" >> "$log"

echo "R5_QUEUE_DONE [$(date +%H:%M:%S)]" >> "$log"
