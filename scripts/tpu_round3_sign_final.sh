#!/bin/bash
# Round-3 session D: (a) sign1024x1 at 100 images with majority-5 — maj3
# measured 0.990 (one argmax flip; the residual ~3 activation flips match
# 122k draws x 3p^2 at p=0.0014-0.0032); maj5's p -> 10p^3 forecasts ~0.04
# activation flips over the whole run, i.e. 1.000 agreement (the BASELINE
# "bit-exact MNIST sign1024x1" north star).  (b) on-chip demo of
# per-boundary parameter escalation: sign1024x1's L1 (84% of bootstraps)
# through the N=2048 key, L0/L2 on the fast key — CPU-tested bit-exact;
# this proves the mixed-key dispatch on real silicon.
# Run SOLO. Appends to results/tpu_r3_sign_final.log.
set -u
cd "$(dirname "$0")/.."
log=results/tpu_r3_sign_final.log
: > "$log"

run() {
  echo "=== $1  [$(date +%H:%M:%S)]" >> "$log"
  shift
  timeout 7000 "$@" 2>&1 | grep -v WARNING | tail -14 >> "$log"
  echo "" >> "$log"
}

export REDSEC_INPUT_GAIN=1

run "sign1024x1 100img maj5" env REDSEC_MAJORITY=5 python scripts/run_encrypted_mnist.py \
    --images 100 --batch 32 --model mnist/sign1024x1 \
    --params small_v2_tpu --jit staged

run "sign1024x1 8img escalate L1" env REDSEC_ESCALATE=1 python scripts/run_encrypted_mnist.py \
    --images 8 --batch 8 --model mnist/sign1024x1 \
    --params small_v2_tpu --jit staged

echo "R3_SIGN_FINAL_DONE" >> "$log"
