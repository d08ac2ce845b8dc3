#!/bin/bash
# Round-4 flagship measurement (VERDICT r3 #2): cifar/binarynet with gains +
# the simulator-chosen majority plan at n=8 images — the statistically
# meaningful run r3 could not fit in one session (forecast 0.81 on 16 rows,
# results/predict_full_tpu_mplan.log).  Resumable: per-2-image batches
# checkpoint to results/ck_cifar_flagship.json; re-running this script
# continues where the previous session died.  ~605k bootstraps/image incl.
# votes; expect ~12 min/image warm.  Run SOLO.
set -u -o pipefail
cd "$(dirname "$0")/.."
log=results/tpu_r4_cifar_flagship.log
echo "=== cifar binarynet 8img mplan 5:3,6:5,7:9,8:9  [$(date +%H:%M:%S)]" >> "$log"
timeout 11000 env REDSEC_INPUT_GAIN=1 REDSEC_TIME_MODE=cold \
  REDSEC_MAJORITY_PLAN="5:3,6:5,7:9,8:9" \
  python scripts/run_encrypted_mnist.py \
  --images 8 --batch 2 --model cifar/binarynet \
  --params small_v2_tpu --jit staged \
  --checkpoint results/ck_cifar_flagship.json 2>&1 | grep -v WARNING | tail -30 >> "$log"
echo "EXIT=$? R4_CIFAR_FLAGSHIP_DONE [$(date +%H:%M:%S)]" >> "$log"
