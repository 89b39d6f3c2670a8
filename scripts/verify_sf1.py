"""Correctness AT scale: run Spark-vs-DuckDB oracle comparison on the
sf1 (10x) dataset for every query whose oracle is tractable there.

The driver's correctness gate runs at sf0.01; the sf1 bench proves
throughput but not answers.  This script closes that gap: same
comparator (sorted columns, type-prefixed canonical values, exact
match), 10x the rows.  Queries whose DuckDB oracle was MEASURED
intractably slow at sf1 are excluded with the measurement recorded —
their semantics are already pinned at three smaller SFs.

    python scripts/gen_sf1.py           # once
    python scripts/verify_sf1.py        # writes SCALE_sf1_correctness.json
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.path.join(REPO, "testdata_sf1")

# DuckDB-oracle cost is the criterion, not importance.  Round 5 closed
# the last exclusion: dedup_fuzzy_levenshtein's oracle runs ~172 s at
# sf1 (441 k blocked candidates × full-matrix levenshtein over ~2 KB
# texts; measured, and no lossless prune exists — the corpus perturbs
# by word shuffles, so char-frequency lower bounds prune 0 of 441 k and
# length bands prune nothing within same-token-count blocks).  ~3 min
# once per round buys 148/148 oracle coverage at 10x scale.
EXCLUDE: dict[str, str] = {}


def canon(df):
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False):
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append(None)
            else:
                if hasattr(v, "item"):
                    v = v.item()
                vals.append(f"{v:.10g}" if isinstance(v, float) else str(v))
        out.append(tuple(vals))
    return cols, sorted(out)


def main() -> None:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as mod

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs, os_ = mod.queries(), mod.oracle_sql()
    results, bad = {}, []
    for name in sorted(qs):
        if name not in os_:
            results[name] = {"status": "rows_only"}
            continue
        if name in EXCLUDE:
            results[name] = {"status": "excluded", "reason": EXCLUDE[name]}
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR).toPandas()
            odf = con.execute(os_[name]).fetchdf()
            sc, sr = canon(sdf)
            dc, dr = canon(odf)
            ok = sc == dc and sr == dr
        except Exception as e:
            results[name] = {"status": "error", "error": str(e)[:300]}
            bad.append(name)
            print(f"ERROR {name}: {str(e)[:200]}", file=sys.stderr)
            continue
        finally:
            # operators persist multi-consumer intermediates; a 148-query
            # session would otherwise accumulate every query's cache
            from hotdog_spark.operators import release_tracked_persists

            release_tracked_persists()
        results[name] = {
            "status": "match" if ok else "MISMATCH",
            "rows": len(sr),
            "sec": round(time.time() - t0, 1),
        }
        if not ok:
            bad.append(name)
            print(f"MISMATCH {name}", file=sys.stderr)
    n_match = sum(1 for r in results.values() if r["status"] == "match")
    payload = {
        "sf": 1.0,
        "checked": n_match + len(bad),
        "matched": n_match,
        "mismatched_or_error": bad,
        "excluded_heavy_oracle": len(EXCLUDE),
        "queries": results,
    }
    with open(os.path.join(REPO, "SCALE_sf1_correctness.json"), "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({k: v for k, v in payload.items() if k != "queries"}))
    spark.stop()


if __name__ == "__main__":
    main()
