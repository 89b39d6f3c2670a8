#!/usr/bin/env python
"""Pre-snapshot gate: refuse to snapshot against stale assumptions.

Round 2 shipped with 2 red parity tests because the driver regenerated
/root/testdata between rounds (timestamp[ns] -> timestamp[us]) and the
suite wasn't re-run against the CURRENT data.  This script is the gate:

1. Probe the dtypes the engine depends on (events.ts et al.) directly
   from the parquet footers and fail loudly if they changed.
2. Zero-row audit (scripts/zero_row_audit.py): every registered oracle
   must return >0 rows at the driver's gate scale, or carry an explicit
   justified waiver — a hash-match over an empty result verifies
   nothing (VERDICT r7: q20 sat green for six rounds on 0 rows).
3. Plan-regression check (scripts/plan_audit.py --check): every
   registered query's exchange/scan/Python counts vs the COMMITTED
   PLANS.md — silently grown shuffles fail the gate (VERDICT r7 item 7;
   waive intentional changes with $SPARK_GRAFT_PLAN_ALLOW and
   regenerate PLANS.md in the same commit).
4. Re-run the full pytest suite against the current testdata.

Run it immediately before every end-of-round snapshot:

    python scripts/presnapshot_gate.py          # probe + audit + suite
    python scripts/presnapshot_gate.py --probe  # dtype probe only

Exit code 0 = safe to snapshot.
"""

from __future__ import annotations

import subprocess
import sys

import pyarrow.parquet as pq

TESTDATA = "/root/testdata"
SFS = ("sf0.001", "sf0.01", "sf0.1")

# (table, column) -> set of acceptable arrow types.  events.ts is the one
# that has already changed under us once; pin everything time-typed.
EXPECTED = {
    ("events", "ts"): {"timestamp[us]"},
    ("orders", "o_orderdate"): {"timestamp[us]"},
    ("lineitem", "l_shipdate"): {"timestamp[us]"},
    ("embeddings", "embedding"): {"list<element: float>", "list<item: float>"},
}


def probe() -> list[str]:
    errors = []
    for sf in SFS:
        for (tbl, col), ok in EXPECTED.items():
            path = f"{TESTDATA}/{sf}/{tbl}.parquet"
            try:
                schema = pq.read_schema(path)
            except Exception as e:  # missing sf dir is a driver change too
                errors.append(f"{path}: unreadable ({e})")
                continue
            if col not in schema.names:
                errors.append(f"{path}: column {col!r} missing")
                continue
            got = str(schema.field(col).type)
            if got not in ok:
                errors.append(
                    f"{path}: {col} is {got!r}, expected one of {sorted(ok)} "
                    "— testdata regenerated with new types; re-audit every "
                    "timestamp/date call site before snapshotting"
                )
    return errors


def main() -> int:
    errors = probe()
    if errors:
        print("DTYPE PROBE FAILED:")
        for e in errors:
            print("  " + e)
        return 1
    print(f"dtype probe OK ({len(EXPECTED)} pinned columns x {len(SFS)} SFs)")
    if "--probe" in sys.argv:
        return 0
    import os

    rc = subprocess.call(
        [sys.executable, os.path.join(os.path.dirname(__file__), "zero_row_audit.py")]
    )
    if rc != 0:
        print("presnapshot gate: RED (zero-row audit)")
        return rc
    rc = subprocess.call(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "plan_audit.py"), "--check"]
    )
    if rc != 0:
        print("presnapshot gate: RED (plan regression)")
        return rc
    rc = subprocess.call([sys.executable, "-m", "pytest", "tests/", "-q"])
    print("presnapshot gate:", "GREEN — safe to snapshot" if rc == 0 else "RED")
    return rc


if __name__ == "__main__":
    sys.exit(main())
