#!/bin/bash
# Round-5 relu BYON re-measurement: the first trained relu1024x1
# (logit_margin 24, hidden_noise 1.0 — archived in
# nets_trained/mnist/relu1024x1_margin24/) measured 0.750 encrypted; the
# simulator reproduced the regime (0.6875 forecast) and the retrained
# config (logit_margin 80, hidden_noise 2.0, lam_edge 2.0) forecasts
# 1.000 mean/min over 5 trials.  Measure it.  Run SOLO after the queue.
set -u -o pipefail
cd "$(dirname "$0")/.."
log=results/tpu_r5_queue.log
echo "=== STAGE relu1024x1 TRAINED-v2 heldout eval 0:32  [$(date +%H:%M:%S)]" >> "$log"
timeout 3600 env REDSEC_INPUT_GAIN=1 python scripts/run_encrypted_mnist.py \
  --images 32 --batch 16 --model mnist/relu1024x1 \
  --varprep nets_trained/mnist/relu1024x1/var_prep.dat \
  --params small_v2_tpu --calib-rows 32:100 \
  --save-calib nets_trained/mnist/relu1024x1/calibration.npz \
  --checkpoint results/ck_r5_relu_trained_v2.json \
  2>&1 | grep -v WARNING | tail -12 >> "$log"
echo "EXIT=$? [$(date +%H:%M:%S)]" >> "$log"
