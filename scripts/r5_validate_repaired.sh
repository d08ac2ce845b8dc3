#!/bin/bash
# Round-5 repaired-recipe validation (VERDICT r4 #4 'Done' criterion):
# medium_v2 / large_v2 at n>=32 native bootstraps, EXACT decode expected
# (predicted output noise: exactly 0 in the torus32 engines — both
# decompositions exact, all alphas sub-lsb).  CPU-only; large keygen is
# ~10 min and bootstraps are slow single-digit/s — run when the 2 cores
# are otherwise free.
set -u -o pipefail
cd "$(dirname "$0")/.."
log=results/repaired_sets_validation.log
: > "$log"
for s in medium_v2 large_v2; do
  echo "=== $s  [$(date +%H:%M:%S)]" >> "$log"
  timeout 5000 python -u scripts/validate_full_geometry.py --set "$s" --count 32 \
    2>&1 | grep -v WARNING | tail -12 >> "$log"
  echo "EXIT=$? [$(date +%H:%M:%S)]" >> "$log"
done
echo "R5_REPAIRED_DONE [$(date +%H:%M:%S)]" >> "$log"
