#!/usr/bin/env python
"""Zero-row audit: no registered query may verify vacuously at the gate
scale (VERDICT r7 item 1 / "What's wrong" #1).

A hash-match over an EMPTY result proves nothing about the query's
values — ``q20_heavy_shippers_of_green_parts`` sat green for six rounds
while returning 0 rows at every verified scale because its TPC-H
predicate ('%green%') doesn't exist in the synthetic part vocabulary.
This audit makes that class structurally impossible to ship again:

  For every name in ``oracle_sql()``, run the DuckDB oracle at the
  driver's gate scale (sf0.01) and FAIL if it returns 0 rows, unless
  the name carries an explicit, individually-justified waiver below.

Only the ORACLE side runs (no Spark session): the driver's hash gate
already proves spark_rows == oracle_rows for every green query, so the
oracle's row count alone decides vacuity — and a DuckDB-only sweep
keeps the audit fast enough to sit inside the presnapshot gate.

    python scripts/zero_row_audit.py                  # audit sf0.01
    python scripts/zero_row_audit.py --sf-dir PATH    # audit elsewhere

Exit 0 = every registered oracle returns rows (or is waived).
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ALL_TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

#: name -> justification.  Every waiver must say WHY an empty result at
#: the gate scale is the correct, content-verified-elsewhere answer.
#: Keep this empty unless a query's semantics genuinely define an empty
#: set at sf0.01 (and then link where nonzero content IS verified).
WAIVERS: dict[str, str] = {}


def audit(sf_dir: str) -> int:
    import duckdb

    from hotdog_spark.queries import all_oracles

    con = duckdb.connect()
    for t in ALL_TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    oracles = all_oracles()
    zeros, errors, waived = [], [], []
    t0 = time.time()
    for name in sorted(oracles):
        try:
            n = con.execute(
                f"SELECT count(*) FROM ({oracles[name]})"
            ).fetchone()[0]
        except Exception as e:  # an unrunnable oracle is its own failure
            errors.append(f"{name}: oracle error: {e}")
            continue
        if n == 0:
            if name in WAIVERS:
                waived.append(f"{name}: {WAIVERS[name]}")
            else:
                zeros.append(name)
    print(
        f"zero-row audit: {len(oracles)} oracles at {sf_dir} "
        f"in {time.time() - t0:.1f}s — "
        f"{len(zeros)} vacuous, {len(errors)} errors, {len(waived)} waived"
    )
    for line in waived:
        print("  WAIVED " + line)
    for name in zeros:
        print(f"  VACUOUS {name}: 0 rows at gate scale — a hash-match "
              "here verifies nothing; retune the predicate or add a "
              "justified waiver")
    for line in errors:
        print("  ERROR " + line)
    return 1 if (zeros or errors) else 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()
    return audit(args.sf_dir)


if __name__ == "__main__":
    sys.exit(main())
