#!/bin/bash
# Serial TPU measurement session: final bench + MNIST E2E at both parameter
# sets. Run solo (one chip); each step appends to /tmp/tpu_session.log.
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

run "bench small_v2 b256 (final)" env REDSEC_BENCH_BATCH=256 REDSEC_BENCH_ITERS=3 python bench.py
run "mnist sign1024x1 small_v2 32img" python scripts/run_encrypted_mnist.py --images 32
run "mnist sign1024x1 n2048 16img" python scripts/run_encrypted_mnist.py --images 16 --params small_v2_n2048
run "bench n2048 b256" env REDSEC_BENCH_PARAMS=small_v2_n2048 REDSEC_BENCH_BATCH=256 REDSEC_BENCH_ITERS=3 python bench.py
echo "SESSION_DONE" >> "$log"
