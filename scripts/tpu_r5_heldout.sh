#!/bin/bash
# Round-5 #1 (VERDICT r4 Missing #1): HELD-OUT calibration measurements.
# Every prior agreement number calibrated gains/centers/tie-breaks on the
# rows it then evaluated; these runs derive calibration from rows DISJOINT
# from evaluation and persist it as the public artifact the CLI consumes.
#
# 1+2. sign1024x1 @ small_v2_tpu, 2-fold over the 100 shipped rows:
#      fold A calibrates on 50:100 / evaluates 0:50, fold B the reverse.
#      Pooled: all 100 rows evaluated under disjoint calibration.
#      (r2's leaky-calibration number on the same rows/params: 0.99.)
# 3.   BYON-trained binarynet_small: calibrate on training rows 16:100,
#      evaluate 0:16 (r4's leaky number: 1.000@16).  Artifact saved next
#      to var_prep.dat (nets_trained/.../calibration.npz).
# Run SOLO.  All resumable.
set -u -o pipefail
cd "$(dirname "$0")/.."
log=results/tpu_r5_heldout.log

run() {
  echo "=== $1  [$(date +%H:%M:%S)]" >> "$log"
  shift
  timeout 7200 "$@" 2>&1 | grep -v WARNING | tail -30 >> "$log"
  echo "EXIT=$? [$(date +%H:%M:%S)]" >> "$log"
}

run "sign1024x1 sv2_tpu foldA eval 0:50 calib 50:100" \
  env REDSEC_INPUT_GAIN=1 python scripts/run_encrypted_mnist.py \
  --images 50 --batch 16 --model mnist/sign1024x1 --params small_v2_tpu \
  --calib-rows 50:100 \
  --save-calib results/calib_sign1024x1_sv2tpu_foldA.npz \
  --checkpoint results/ck_r5_sign_foldA.json

run "sign1024x1 sv2_tpu foldB eval 50:100 calib 0:50" \
  env REDSEC_INPUT_GAIN=1 python scripts/run_encrypted_mnist.py \
  --images 50 --batch 16 --model mnist/sign1024x1 --params small_v2_tpu \
  --eval-offset 50 --calib-rows 0:50 \
  --checkpoint results/ck_r5_sign_foldB.json

run "binarynet_small TRAINED heldout eval 0:16 calib 16:100" \
  env REDSEC_INPUT_GAIN=1 REDSEC_TIME_MODE=cold \
  python scripts/run_encrypted_mnist.py \
  --images 16 --batch 4 --model cifar/binarynet_small \
  --varprep nets_trained/cifar/binarynet_small/var_prep.dat \
  --params small_v2_tpu --jit staged \
  --calib-rows 16:100 \
  --save-calib nets_trained/cifar/binarynet_small/calibration.npz \
  --checkpoint results/ck_r5_trained_heldout.json

echo "R5_HELDOUT_DONE [$(date +%H:%M:%S)]" >> "$log"
