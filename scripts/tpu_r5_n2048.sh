#!/bin/bash
# Round-5 n2048 anomaly probe (VERDICT r4 #2): the pass-floor model says
# small_v2_n2048 b128 leaves ~3x on the table (99.7 measured vs 280.9
# modeled).  Discriminate per-PROGRAM overhead (rate = B/(B/r_inf + c),
# rises with batch) from a structural per-BOOT cost (flat in batch) by
# sweeping the per-program batch at fixed total work, bracketed by
# small_v2_tpu controls for session drift.  The r3 "crash above ~128
# boots/program at N=2048" note is stale — the r4 staged letter ran
# 4096-boot N=2048 programs (build_staged_forward macro2) — but step UP
# through 256/512/1024 anyway so a wedge, if any, costs one small probe.
# Also re-probes tpu2+bundled b512 (the -30% point).  ~20 min.  Run SOLO.
set -u -o pipefail
cd "$(dirname "$0")/.."
log=results/tpu_r5_n2048.log
: > "$log"

run() {
  echo "=== $1  [$(date +%H:%M:%S)]" >> "$log"
  shift
  timeout 1200 "$@" 2>&1 | grep -v WARNING | tail -4 >> "$log"
}

B() {
  local name="$1"; shift
  run "$name" env REDSEC_BENCH_ANCHOR=0 "$@" python bench.py
}

B "control-a tpu b512"  REDSEC_BENCH_PARAMS=small_v2_tpu   REDSEC_BENCH_BATCH=512  REDSEC_BENCH_ITERS=4
B "n2048 b64"           REDSEC_BENCH_PARAMS=small_v2_n2048 REDSEC_BENCH_BATCH=64   REDSEC_BENCH_ITERS=8
B "n2048 b128"          REDSEC_BENCH_PARAMS=small_v2_n2048 REDSEC_BENCH_BATCH=128  REDSEC_BENCH_ITERS=6
B "n2048 b256"          REDSEC_BENCH_PARAMS=small_v2_n2048 REDSEC_BENCH_BATCH=256  REDSEC_BENCH_ITERS=4
B "n2048 b512"          REDSEC_BENCH_PARAMS=small_v2_n2048 REDSEC_BENCH_BATCH=512  REDSEC_BENCH_ITERS=3
B "n2048 b1024"         REDSEC_BENCH_PARAMS=small_v2_n2048 REDSEC_BENCH_BATCH=1024 REDSEC_BENCH_ITERS=2
B "n2048 b2048"         REDSEC_BENCH_PARAMS=small_v2_n2048 REDSEC_BENCH_BATCH=2048 REDSEC_BENCH_ITERS=2
B "control-b tpu b512"  REDSEC_BENCH_PARAMS=small_v2_tpu   REDSEC_BENCH_BATCH=512  REDSEC_BENCH_ITERS=4
B "tpu2-bundled b512"   REDSEC_BENCH_PARAMS=small_v2_tpu2  REDSEC_BUNDLE=2 REDSEC_BENCH_BATCH=512 REDSEC_BENCH_ITERS=4
B "tpu2 b512"           REDSEC_BENCH_PARAMS=small_v2_tpu2  REDSEC_BENCH_BATCH=512  REDSEC_BENCH_ITERS=4
B "control-c tpu b512"  REDSEC_BENCH_PARAMS=small_v2_tpu   REDSEC_BENCH_BATCH=512  REDSEC_BENCH_ITERS=4

echo "R5_N2048_DONE [$(date +%H:%M:%S)]" >> "$log"
