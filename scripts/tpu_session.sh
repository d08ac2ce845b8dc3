#!/bin/bash
# Serial TPU measurement session: final bench + encrypted E2E runs. Run SOLO
# (one chip; concurrent jobs contend and can fault the tunnel backend).
# Appends to /tmp/tpu_session.log.
set -u
cd "$(dirname "$0")/.."
log=/tmp/tpu_session.log
: > "$log"

run() {
  echo "=== $1" >> "$log"
  shift
  timeout 2400 "$@" 2>&1 | grep -v WARNING | tail -12 >> "$log"
  echo "" >> "$log"
}

run "bench both points b512 (headline small_v2_tpu)" env REDSEC_BENCH_BATCH=512 REDSEC_BENCH_ITERS=3 python bench.py
run "mnist sign1024x1 small_v2_tpu 32img" python scripts/run_encrypted_mnist.py --images 32 --params small_v2_tpu
run "mnist sign1024x1 small_v2 16img" python scripts/run_encrypted_mnist.py --images 16
run "mnist relu1024x2 small_v2_tpu 8img" python scripts/run_encrypted_mnist.py --images 8 --model mnist/relu1024x2 --params small_v2_tpu
run "cifar binarynet_small small_v2_tpu 1img" python scripts/run_encrypted_mnist.py --images 1 --model cifar/binarynet_small --params small_v2_tpu
echo "SESSION_DONE" >> "$log"
