#!/bin/bash
# Round-4 relu1024x3 throughput bisection (VERDICT r3 weak #3: 368 -> 78
# boots/s regression r2->r3, unexplained).  Candidate factors: whole-jit vs
# staged dispatch, FDFB (3-PBS) vs quarter (1-PBS) relu, image count.
# Each RESULT line carries s/image; compare pairwise.  Run SOLO.
set -u -o pipefail
cd "$(dirname "$0")/.."
log=results/tpu_r4_relu_probe.log
: > "$log"

run() {
  echo "=== $1  [$(date +%H:%M:%S)]" >> "$log"
  shift
  timeout 2400 "$@" 2>&1 | grep -v WARNING | tail -6 >> "$log"
  echo "" >> "$log"
}

# r2 reproduction: 8 images, whole-model jit (auto at this size), FDFB modes
# (24.6k static bootstraps — r2 measured this size safe; lift the 24k guard)
run "8img auto (r2 repro)" env REDSEC_INPUT_GAIN=1 REDSEC_MAX_PROGRAM_BOOTS=26000 \
  python scripts/run_encrypted_mnist.py --images 8 --model mnist/relu1024x3 \
  --params small_v2_tpu --jit auto
# same size, staged dispatch: isolates the staged-path cost
run "8img staged" env REDSEC_INPUT_GAIN=1 \
  python scripts/run_encrypted_mnist.py --images 8 --model mnist/relu1024x3 \
  --params small_v2_tpu --jit staged
# 32 images staged, quarter forced: isolates FDFB (3-PBS + per-activation
# tvs) from the staged dispatch
run "32img staged quarter" env REDSEC_INPUT_GAIN=1 REDSEC_RELU_MODE=quarter \
  python scripts/run_encrypted_mnist.py --images 32 --model mnist/relu1024x3 \
  --params small_v2_tpu --jit staged
# r3 reproduction at half size (the 78 boots/s configuration)
run "16img staged fdfb (r3 repro)" env REDSEC_INPUT_GAIN=1 \
  python scripts/run_encrypted_mnist.py --images 16 --model mnist/relu1024x3 \
  --params small_v2_tpu --jit staged

echo "R4_RELU_PROBE_DONE [$(date +%H:%M:%S)]" >> "$log"
