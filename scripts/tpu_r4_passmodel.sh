#!/bin/bash
# Round-4 pass-floor model sweep (VERDICT r3 #4): measure EVERY point the
# model must predict in ONE session (cross-session drift is ~1.6x on this
# tunneled chip, so only same-session fits are meaningful).  Controls
# bracket the sweep to measure in-session drift.  ~20 min.  Run SOLO.
# Appends to results/tpu_r4_passmodel.log; fit with scripts/fit_passmodel.py.
set -u -o pipefail
cd "$(dirname "$0")/.."
log=results/tpu_r4_passmodel.log
: > "$log"

run() {
  echo "=== $1  [$(date +%H:%M:%S)]" >> "$log"
  shift
  timeout 1200 "$@" 2>&1 | grep -v WARNING | tail -4 >> "$log"
}

B() { # name, extra env...
  local name="$1"; shift
  run "$name" env REDSEC_BENCH_ANCHOR=0 "$@" python bench.py
}

B "control-a tpu b512"   REDSEC_BENCH_PARAMS=small_v2_tpu  REDSEC_BENCH_BATCH=512 REDSEC_BENCH_ITERS=4
B "tpu b128"             REDSEC_BENCH_PARAMS=small_v2_tpu  REDSEC_BENCH_BATCH=128 REDSEC_BENCH_ITERS=8
B "tpu b256"             REDSEC_BENCH_PARAMS=small_v2_tpu  REDSEC_BENCH_BATCH=256 REDSEC_BENCH_ITERS=6
B "tpu b384"             REDSEC_BENCH_PARAMS=small_v2_tpu  REDSEC_BENCH_BATCH=384 REDSEC_BENCH_ITERS=4
B "tpu b768"             REDSEC_BENCH_PARAMS=small_v2_tpu  REDSEC_BENCH_BATCH=768 REDSEC_BENCH_ITERS=3
B "tpu b1024"            REDSEC_BENCH_PARAMS=small_v2_tpu  REDSEC_BENCH_BATCH=1024 REDSEC_BENCH_ITERS=3
B "sv2 b512"             REDSEC_BENCH_PARAMS=small_v2      REDSEC_BENCH_BATCH=512 REDSEC_BENCH_ITERS=4
B "tpu2 b512"            REDSEC_BENCH_PARAMS=small_v2_tpu2 REDSEC_BENCH_BATCH=512 REDSEC_BENCH_ITERS=4
B "tpu bundled b512"     REDSEC_BENCH_PARAMS=small_v2_tpu  REDSEC_BUNDLE=2 REDSEC_BENCH_BATCH=512 REDSEC_BENCH_ITERS=4
B "tpu2 bundled b512"    REDSEC_BENCH_PARAMS=small_v2_tpu2 REDSEC_BUNDLE=2 REDSEC_BENCH_BATCH=512 REDSEC_BENCH_ITERS=4
B "tpu bundled b256"     REDSEC_BENCH_PARAMS=small_v2_tpu  REDSEC_BUNDLE=2 REDSEC_BENCH_BATCH=256 REDSEC_BENCH_ITERS=6
B "narrow b512"          REDSEC_BENCH_PARAMS=small_v2_tpu  REDSEC_NARROW=1 REDSEC_BENCH_BATCH=512 REDSEC_BENCH_ITERS=4
B "n2048 b128"           REDSEC_BENCH_PARAMS=small_v2_n2048 REDSEC_BENCH_BATCH=128 REDSEC_BENCH_ITERS=2
B "control-b tpu b512"   REDSEC_BENCH_PARAMS=small_v2_tpu  REDSEC_BENCH_BATCH=512 REDSEC_BENCH_ITERS=4

echo "R4_PASSMODEL_DONE [$(date +%H:%M:%S)]" >> "$log"
