#!/bin/bash
# Continuation of the batched sf10 sweep after the b1 heap OOM:
# 48g driver heap (exact-percentile and approx-distinct aggregates over
# 60M-row lineitem need it in single-JVM local mode) + the patched
# verify_sf1.py that restarts the session on gateway death.
set -u
cd /root/repo
export SPARK_GRAFT_DRIVER_MEM=48g
# RUNTIME-only exclusion — see run_sf10_sweep.sh; both are
# digest-verified at sf10 by dedicated long runs (r11).
EXCL="dedup_fuzzy_levenshtein,dedup_winnowing_pairs"
run () {
  echo "=== batch $1 start $(date +%H:%M:%S) ===" >> /tmp/sf10_sweep.log
  python scripts/verify_sf1.py --sf-dir testdata_sf10 --sf 10 \
    --mode digest --only "$2" --exclude "$EXCL" \
    --out "/tmp/sf10_part_$1.json" >> /tmp/sf10_sweep.log 2>&1
  python scripts/merge_sf10_parts.py >> /tmp/sf10_sweep.log 2>&1
}
run b1r "$(cat /tmp/b1r.txt)"
run b3 "$(cat /tmp/b3.txt)"
run b4 "$(cat /tmp/b4.txt)"
run b5 "dedup_components_best_quality,dedup_minhash_components,$EXCL"
echo "=== sweep done $(date +%H:%M:%S) ===" >> /tmp/sf10_sweep.log
