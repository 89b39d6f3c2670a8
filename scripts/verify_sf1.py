"""Correctness AT scale: run Spark-vs-DuckDB oracle comparison on a
scaled dataset for every query whose tables exist and whose oracle is
tractable there.

The driver's correctness gate runs at sf0.01; the scale benches prove
throughput but not answers.  This script closes that gap: same
comparator (sorted columns, type-prefixed canonical values, exact
match), 10x-100x the rows.

    python scripts/gen_sf1.py                     # once
    python scripts/verify_sf1.py                  # SCALE_sf1_correctness.json

    python scripts/gen_sf1.py --sf 10 --out testdata_sf10 \
        --tables documents,embeddings,events      # once
    python scripts/verify_sf1.py --sf-dir testdata_sf10 --sf 10 \
        --out SCALE_sf10_correctness.json \
        --exclude dedup_winnowing_pairs,dedup_fuzzy_levenshtein

Queries touching tables absent from the directory are recorded as
``skipped_missing_table`` (the sf10 set carries only the
superlinear-risk families' tables).  Queries whose DuckDB oracle was
MEASURED intractably slow are excluded via --exclude with the
measurement recorded in the committed artifact's notes — their
semantics stay pinned at every smaller SF.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


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


ALL_TABLES = ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.path.join(REPO, "testdata_sf1"))
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default="SCALE_sf1_correctness.json")
    ap.add_argument("--exclude", default="",
                    help="comma-separated query names with measured-heavy oracles")
    args = ap.parse_args()
    sf_dir = args.sf_dir if os.path.isabs(args.sf_dir) else os.path.join(REPO, args.sf_dir)
    exclude = {n for n in args.exclude.split(",") if n}

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
    present = {t for t in ALL_TABLES if os.path.exists(f"{sf_dir}/{t}.parquet")}
    missing = [t for t in ALL_TABLES if t not in present]

    def fresh_con():
        """A NEW connection per query: DuckDB's buffer pool grows toward
        its memory_limit and caches aggressively — a 100+-query sweep
        over 100x data on one connection exhausted the box alongside the
        Spark JVM (every post-OOM query then failed on kB-sized
        allocations).  Reconnecting releases the pool; the explicit
        limit keeps DuckDB + JVM + Arrow inside physical memory."""
        c = duckdb.connect()
        c.execute("SET memory_limit='32GB'")
        for t in present:
            c.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return c

    qs, os_ = mod.queries(), mod.oracle_sql()
    results, bad = {}, []
    n_skipped = 0
    for name in sorted(qs):
        if name not in os_:
            results[name] = {"status": "rows_only"}
            continue
        if name in exclude:
            results[name] = {"status": "excluded_heavy_oracle"}
            continue
        t0 = time.time()
        print(f"... {name}", file=sys.stderr, flush=True)
        con = None
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
            con = fresh_con()
            odf = con.execute(os_[name]).fetchdf()
            sc, sr = canon(sdf)
            dc, dr = canon(odf)
            ok = sc == dc and sr == dr
        except Exception as e:
            msg = str(e)
            # a query over a table the subset directory doesn't carry is
            # out of scope, not a failure
            if missing and any(
                f"{t}.parquet" in msg or f"Table with name {t}" in msg
                or f"{os.sep}{t}.parquet" in msg
                for t in missing
            ) or "PATH_NOT_FOUND" in msg:
                results[name] = {"status": "skipped_missing_table"}
                n_skipped += 1
                continue
            results[name] = {"status": "error", "error": msg[:300]}
            bad.append(name)
            print(f"ERROR {name}: {msg[:200]}", file=sys.stderr)
            continue
        finally:
            if con is not None:
                con.close()
            # operators persist multi-consumer intermediates; a 149-query
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
        "sf": args.sf,
        "checked": n_match + len(bad),
        "matched": n_match,
        "mismatched_or_error": bad,
        "excluded_heavy_oracle": len(exclude),
        "skipped_missing_table": n_skipped,
        "queries": results,
    }
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({k: v for k, v in payload.items() if k != "queries"}))
    spark.stop()


if __name__ == "__main__":
    main()
