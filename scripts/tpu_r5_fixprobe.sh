#!/bin/bash
# Round-5 pointwise-fix A/B probe + n2048 letter re-run (VERDICT r4 #2 close).
# Run SOLO at session end, after the flagship extension is cut.
#
# The sweep (results/tpu_r5_n2048.log) measured the OLD lazy path this
# morning; these probes bracket the fixed auto path (GEMM on n2048's
# degenerate 20-pass 40961 branch) in the same session window:
#   - control tpu b512 (drift bracket)
#   - n2048 b256 lazy (in-window control of the old path)
#   - n2048 b64/b128/b256/b512 auto (the fix; b64 also checks lane padding)
#   - tpu2-bundled b512 (re-measure: today's 167 vs r4's 340 on identical
#     code is a session-variance outlier; auto keeps this config lazy)
# Then the MNIST n2048 letter at the fixed rate: 50 images, HELD-OUT
# calibration artifact (results/calib_sign1024x1_n2048_foldA.npz, rows
# 50:100, precomputed on CPU), batch 4 as in r4 (9.72 s/image then).
set -u -o pipefail
cd "$(dirname "$0")/.."
log=results/tpu_r5_fixprobe.log
: > "$log"

run() {
  echo "=== $1  [$(date +%H:%M:%S)]" >> "$log"
  shift
  timeout 1200 env REDSEC_BENCH_ANCHOR=0 "$@" python bench.py \
    2>&1 | grep -v WARNING | tail -4 >> "$log"
}

run "control tpu b512"      REDSEC_BENCH_PARAMS=small_v2_tpu   REDSEC_BENCH_BATCH=512 REDSEC_BENCH_ITERS=4
run "control tpu b256"      REDSEC_BENCH_PARAMS=small_v2_tpu   REDSEC_BENCH_BATCH=256 REDSEC_BENCH_ITERS=4
run "n2048 b256 lazy"       REDSEC_POINTWISE=lazy REDSEC_BENCH_PARAMS=small_v2_n2048 REDSEC_BENCH_BATCH=256 REDSEC_BENCH_ITERS=4
run "n2048 b256 auto"       REDSEC_BENCH_PARAMS=small_v2_n2048 REDSEC_BENCH_BATCH=256 REDSEC_BENCH_ITERS=4
run "n2048 b128 auto"       REDSEC_BENCH_PARAMS=small_v2_n2048 REDSEC_BENCH_BATCH=128 REDSEC_BENCH_ITERS=6
run "n2048 b512 auto"       REDSEC_BENCH_PARAMS=small_v2_n2048 REDSEC_BENCH_BATCH=512 REDSEC_BENCH_ITERS=3
run "n2048 b64 auto"        REDSEC_BENCH_PARAMS=small_v2_n2048 REDSEC_BENCH_BATCH=64  REDSEC_BENCH_ITERS=8
run "tpu2-bundled b512"     REDSEC_BENCH_PARAMS=small_v2_tpu2  REDSEC_BUNDLE=2 REDSEC_BENCH_BATCH=512 REDSEC_BENCH_ITERS=4

echo "=== STAGE n2048 letter 50img heldout-calib (fixed rate)  [$(date +%H:%M:%S)]" >> "$log"
timeout 2400 env REDSEC_INPUT_GAIN=1 python scripts/run_encrypted_mnist.py \
  --images 50 --batch 4 --model mnist/sign1024x1 \
  --params small_v2_n2048 --jit staged \
  --load-calib results/calib_sign1024x1_n2048_foldA.npz \
  --checkpoint results/ck_r5_sign_n2048_fixed.json \
  2>&1 | grep -v WARNING | tail -12 >> "$log"
echo "EXIT=$? [$(date +%H:%M:%S)]" >> "$log"

echo "R5_FIXPROBE_DONE [$(date +%H:%M:%S)]" >> "$log"
