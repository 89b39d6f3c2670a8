#!/bin/bash
# Round-close gate (VERDICT r9 item 1: the full unit suite is part of
# the gate, so plan-shape drift like the r9 split-leakage test can't
# ship again).  Run AFTER the final operator commit of the round:
#
#     bash scripts/round_close.sh <round-number>
#
# Order matters: the cheap structural gates run first, the full unit
# suite next (it is the slowest deterministic gate), and the
# full-registry driver-contract sweep LAST so the committed
# CORRECTNESS_FULL_r{N}.json is stamped at the true round close with
# every query added during the round (VERDICT r9 missing item 1).
# Nothing here mutates state except the regenerated artifact.
set -euo pipefail
ROUND="${1:?usage: round_close.sh <round-number>}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"

# Gate 0 (VERDICT r10 item 7): refuse to stamp close artifacts on a
# dirty tree — three r10 SCALE_sf1 truncations and an uncommitted
# BENCH_LOCAL re-run were all working-tree drift.  The artifacts this
# script writes must describe a COMMIT, not a moving tree.
echo "== gate 0/4: clean working tree =="
if [ -n "$(git -C "$REPO" status --porcelain)" ]; then
    git -C "$REPO" status --short
    echo "round_close: working tree is dirty — commit or stash first" >&2
    exit 1
fi

echo "== gate 1/4: zero-row oracle audit =="
python "$REPO/scripts/zero_row_audit.py"

echo "== gate 2/4: physical-plan regression check =="
python "$REPO/scripts/plan_audit.py" --check

echo "== gate 3/4: full unit suite =="
python -m pytest "$REPO/tests/" -q

echo "== gate 4/4: full-registry driver-contract sweep (from /tmp) =="
(cd /tmp && python "$REPO/scripts/full_sweep.py" \
    --out "$REPO/CORRECTNESS_FULL_r${ROUND}.json")

echo "round ${ROUND} close gates: ALL GREEN"
