#!/bin/bash
# Round-3 session C: sign1024x1 at 100 images with majority-3 voting on
# every sign boundary — the BASELINE north-star workload ("encrypted MNIST
# sign1024x1 decrypted outputs bit-exact vs the CPU reference"): round-3
# plain run measured 0.98 (2/100 flips, both at the predicted 0.1-0.3%
# boundary rates); maj3 collapses p to ~3p^2 and the simulator forecasts
# 1.000.  Cost: 4x bootstraps (all boundaries are sign-type) ~ 6.3 s/img.
# Run SOLO. Appends to results/tpu_r3_sign_maj.log.
set -u
cd "$(dirname "$0")/.."
log=results/tpu_r3_sign_maj.log
: > "$log"

run() {
  echo "=== $1  [$(date +%H:%M:%S)]" >> "$log"
  shift
  timeout 3600 "$@" 2>&1 | grep -v WARNING | tail -12 >> "$log"
  echo "" >> "$log"
}

export REDSEC_INPUT_GAIN=1 REDSEC_MAJORITY=3

run "sign1024x1 100img maj3" python scripts/run_encrypted_mnist.py \
    --images 100 --batch 32 --model mnist/sign1024x1 \
    --params small_v2_tpu --jit staged

# deeper sign nets already at 1.000 plain (32 img); re-confirm x2 at the
# voted point over the SAME 32 images for the operating-point table
run "sign1024x2 32img maj3" python scripts/run_encrypted_mnist.py \
    --images 32 --batch 32 --model mnist/sign1024x2 \
    --params small_v2_tpu --jit staged

echo "R3_SIGN_MAJ_DONE" >> "$log"
