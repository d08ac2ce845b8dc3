#!/bin/bash
# Round-4 positive control (VERDICT r3 #1): encrypted run of the BYON-
# TRAINED margin-healthy cifar/binarynet_small weights at >= 16 images.
# The margin-limited diagnosis predicts ~1.0 agreement here (vs 0.33
# forecast for the shipped weights on the same topology/engine).  Weights:
# nets_trained/cifar/binarynet_small/ (scripts/train_cifar_small.py — the
# full train -> var.dat1 -> weight_convert -> var_prep.dat toolchain).
# Resumable via checkpoint; ~262k bootstraps/image.  Run SOLO.
set -u -o pipefail
cd "$(dirname "$0")/.."
log=results/tpu_r4_cifar_trained.log
echo "=== cifar binarynet_small TRAINED 16img  [$(date +%H:%M:%S)]" >> "$log"
timeout 11000 env REDSEC_INPUT_GAIN=1 REDSEC_TIME_MODE=cold \
  python scripts/run_encrypted_mnist.py \
  --images 16 --batch 4 --model cifar/binarynet_small \
  --varprep nets_trained/cifar/binarynet_small/var_prep.dat \
  --params small_v2_tpu --jit staged \
  --checkpoint results/ck_cifar_trained.json 2>&1 | grep -v WARNING | tail -30 >> "$log"
echo "EXIT=$? R4_CIFAR_TRAINED_DONE [$(date +%H:%M:%S)]" >> "$log"
