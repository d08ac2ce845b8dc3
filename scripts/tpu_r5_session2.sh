#!/bin/bash
# Round-5 session-2 TPU queue (continues the interrupted tpu_r5_queue.sh):
#  1. relu1024x1 TRAINED-v2 (noise-scaled margins) encrypted @32 — the
#     measurement leg of VERDICT r4 #6 after the retrain (forecast 1.000).
#  2. n2048 anomaly sweep CONTINUATION (b128..b1024 + controls + tpu2) —
#     VERDICT r4 #2; b64 already measured (73.5 boots/s, vs_passfloor 0.36).
#  3. full cifar/binarynet training on the chip (VERDICT r4 #5 train leg;
#     also the second-topology TrainConfig validation, Weak #6).
#  4. TRAINED full binarynet encrypted @8, held-out calibration
#     (VERDICT r4 #5 measurement leg).
#  5. flagship (shipped weights) n=8 -> n=16 extension, resumable — runs
#     until the session ends; every finished 2-image batch is checkpointed
#     (VERDICT r4 #3 second half).
# Everything bracketed; a wedge costs at most one stage.  Run SOLO.
set -u -o pipefail
cd "$(dirname "$0")/.."
log=results/tpu_r5_queue.log
: >> "$log"

stage() { echo "=== STAGE $1  [$(date +%H:%M:%S)]" >> "$log"; }

# 1. relu-v2: trained weights now in nets_trained/mnist/relu1024x1 (the
#    margin-24 first attempt is archived in relu1024x1_margin24/)
stage "relu1024x1 TRAINED-v2 heldout eval 0:32"
timeout 3600 env REDSEC_INPUT_GAIN=1 python scripts/run_encrypted_mnist.py \
  --images 32 --batch 16 --model mnist/relu1024x1 \
  --varprep nets_trained/mnist/relu1024x1/var_prep.dat \
  --params small_v2_tpu --calib-rows 32:100 \
  --save-calib nets_trained/mnist/relu1024x1/calibration.npz \
  --checkpoint results/ck_r5_relu_trained_v2.json \
  2>&1 | grep -v WARNING | tail -12 >> "$log"
echo "EXIT=$? [$(date +%H:%M:%S)]" >> "$log"

# 2. n2048 sweep continuation (appends to the existing log; control-a and
#    b64 already landed there)
nlog=results/tpu_r5_n2048.log
nrun() {
  echo "=== $1  [$(date +%H:%M:%S)]" >> "$nlog"
  shift
  timeout 1200 env REDSEC_BENCH_ANCHOR=0 "$@" python bench.py \
    2>&1 | grep -v WARNING | tail -4 >> "$nlog"
}
stage "n2048 sweep continuation -> results/tpu_r5_n2048.log"
nrun "n2048 b128"          REDSEC_BENCH_PARAMS=small_v2_n2048 REDSEC_BENCH_BATCH=128  REDSEC_BENCH_ITERS=6
nrun "n2048 b256"          REDSEC_BENCH_PARAMS=small_v2_n2048 REDSEC_BENCH_BATCH=256  REDSEC_BENCH_ITERS=4
nrun "n2048 b512"          REDSEC_BENCH_PARAMS=small_v2_n2048 REDSEC_BENCH_BATCH=512  REDSEC_BENCH_ITERS=3
nrun "n2048 b1024"         REDSEC_BENCH_PARAMS=small_v2_n2048 REDSEC_BENCH_BATCH=1024 REDSEC_BENCH_ITERS=2
nrun "control-b tpu b512"  REDSEC_BENCH_PARAMS=small_v2_tpu   REDSEC_BENCH_BATCH=512  REDSEC_BENCH_ITERS=4
nrun "tpu2-bundled b512"   REDSEC_BENCH_PARAMS=small_v2_tpu2  REDSEC_BUNDLE=2 REDSEC_BENCH_BATCH=512 REDSEC_BENCH_ITERS=4
nrun "tpu2 b512"           REDSEC_BENCH_PARAMS=small_v2_tpu2  REDSEC_BENCH_BATCH=512  REDSEC_BENCH_ITERS=4
echo "R5_N2048_CONT_DONE [$(date +%H:%M:%S)]" >> "$nlog"
echo "EXIT=0 [$(date +%H:%M:%S)]" >> "$log"

# 3. full binarynet training on the chip (scan-chunked steps)
stage "train cifar/binarynet on TPU"
timeout 5400 python scripts/train_cifar_small.py \
  --model cifar/binarynet --device tpu --steps 1500 \
  2>&1 | grep -v WARNING | tail -25 >> "$log"
echo "EXIT=$? [$(date +%H:%M:%S)]" >> "$log"

# 4. TRAINED full binarynet encrypted @8, held-out calibration
stage "binarynet TRAINED heldout eval 0:8 calib 8:100"
timeout 11000 env REDSEC_INPUT_GAIN=1 REDSEC_TIME_MODE=cold \
  python scripts/run_encrypted_mnist.py \
  --images 8 --batch 2 --model cifar/binarynet \
  --varprep nets_trained/cifar/binarynet/var_prep.dat \
  --params small_v2_tpu --jit staged --calib-rows 8:100 \
  --save-calib nets_trained/cifar/binarynet/calibration.npz \
  --checkpoint results/ck_r5_binarynet_trained.json \
  2>&1 | grep -v WARNING | tail -25 >> "$log"
echo "EXIT=$? [$(date +%H:%M:%S)]" >> "$log"

# 5. flagship extension to n=16 (reuses the r4 checkpoint's 8 images;
#    checkpointed per 2-image batch — safe to cut at session end)
stage "flagship binarynet n=16 extension"
timeout 11000 env REDSEC_INPUT_GAIN=1 REDSEC_TIME_MODE=cold \
  REDSEC_MAJORITY_PLAN="5:3,6:5,7:9,8:9" \
  python scripts/run_encrypted_mnist.py \
  --images 16 --batch 2 --model cifar/binarynet \
  --params small_v2_tpu --jit staged \
  --checkpoint results/ck_cifar_flagship.json \
  2>&1 | grep -v WARNING | tail -30 >> "$log"
echo "EXIT=$? [$(date +%H:%M:%S)]" >> "$log"

echo "R5_SESSION2_DONE [$(date +%H:%M:%S)]" >> "$log"
