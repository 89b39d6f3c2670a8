#!/usr/bin/env python
"""Sweep every registered oracle for DuckDB result types that the driver's
hasher canonicalizes differently from Spark's output types.

The known trap (VERDICT r1): DuckDB promotes SUM(INTEGER/BIGINT) -> HUGEINT
(also window SUMs), which pandas renders as object/float while Spark emits
BIGINT -- values identical, hashes different.  Any oracle whose result set
contains a HUGEINT/UHUGEINT column is a latent driver hash failure and must
CAST the offending expression.

Usage:  python scripts/oracle_type_sweep.py [sf_dir]   (default sf0.001)
Exit code 1 if any oracle emits a flagged type.
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

FLAGGED = {"HUGEINT", "UHUGEINT"}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import __spark_entry__ as entry

    oracles = entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            rel = con.sql(sql)
            types = [str(t).upper() for t in rel.types]
        except Exception as exc:  # pragma: no cover - diagnostic path
            print(f"ERROR  {name}: {exc}")
            bad += 1
            continue
        hits = [
            f"{col}:{typ}"
            for col, typ in zip(rel.columns, types)
            if any(f in typ for f in FLAGGED)
        ]
        if hits:
            print(f"FLAG   {name}: {', '.join(hits)}")
            bad += 1
    print(f"swept {len(oracles)} oracles, {bad} flagged")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
