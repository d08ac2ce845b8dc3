#!/bin/bash
# Round-4: close the BASELINE bit-exactness letter on MNIST (VERDICT r3 #3a).
# sign1024x1 at small_v2_n2048 (halved mod-switch sigma), 100 images —
# the r3 probe measured 1.000 oracle agreement at 4 images / 9.69 s/image;
# this is the full-dataset run (~16-20 min) it forecast.  Resumable via
# --checkpoint (scripts/run_encrypted_mnist.py).  Run SOLO.
# Appends to results/tpu_r4_sign_n2048.log.
set -u -o pipefail
cd "$(dirname "$0")/.."
log=results/tpu_r4_sign_n2048.log
echo "=== sign1024x1 small_v2_n2048 100img  [$(date +%H:%M:%S)]" >> "$log"
timeout 4000 env REDSEC_INPUT_GAIN=1 python scripts/run_encrypted_mnist.py \
  --images 100 --batch 4 --params small_v2_n2048 --jit staged \
  --checkpoint results/ck_sign_n2048.json 2>&1 | grep -v WARNING | tail -40 >> "$log"
echo "EXIT=$? R4_SIGN_N2048_DONE [$(date +%H:%M:%S)]" >> "$log"
