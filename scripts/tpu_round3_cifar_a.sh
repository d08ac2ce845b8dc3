#!/bin/bash
# Round-3 CIFAR stage A: binarynet_small at n=16 WITH input gains +
# flip-optimal sign gains + parity tie-break (VERDICT r2 #1's required
# measurement).  The Monte-Carlo forecast for this exact configuration is
# 0.27 mean agreement (results/predict_cifar_small_ig.log) with the flip
# diagnosis L7/L8 cascade-dominated: the shipped binarynet_small weights
# are near-random (plaintext oracle accuracy 0.188 on these rows), so deep
# margins are sub-noise — this run validates the simulator's forecast at
# n>=16, which carries the margin analysis (PERFORMANCE.md round-3 CIFAR
# section).
#
# REDSEC_MAX_FLIP is raised DELIBERATELY: binarynet_small's hotspot
# boundary exceeds the default 5% local-flip guard at every shipped
# geometry because the weights' own margins are sub-noise (sigma-halving
# moves it barely — see the margin analysis); the guard would otherwise
# correctly refuse a run whose purpose is to measure exactly that.
# Budget: ~16 x 305 s/image ~ 82 min at the r2 staged throughput.
# Run SOLO. Appends to results/tpu_r3_cifar_a.log.
set -u
cd "$(dirname "$0")/.."
log=results/tpu_r3_cifar_a.log
: > "$log"

run() {
  echo "=== $1  [$(date +%H:%M:%S)]" >> "$log"
  shift
  timeout 10000 "$@" 2>&1 | grep -v WARNING | tail -14 >> "$log"
  echo "" >> "$log"
}

export REDSEC_INPUT_GAIN=1
export REDSEC_MAX_FLIP=0.25

run "cifar binarynet_small 16img plain+gains" python scripts/run_encrypted_mnist.py \
    --images 16 --batch 4 --model cifar/binarynet_small \
    --params small_v2_tpu --jit staged

echo "R3_CIFAR_A_DONE" >> "$log"
