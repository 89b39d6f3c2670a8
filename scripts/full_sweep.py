"""Full-registry correctness sweep in the DRIVER'S artifact format.

The external driver samples ~50 queries per round into
``CORRECTNESS_r{N}.json``; across 8 rounds it had cumulatively sampled
only 83 of 209 distinct registered queries.  This script closes that
evidence gap: it drives the exact driver contract (``__spark_entry__``'s
``queries()`` / ``oracle_sql()``) for EVERY registered query at sf0.01
in one session, compares against DuckDB with the historical full-mode
canonicalization (sorted columns, %.10g floats, sorted row tuples —
shared with scripts/verify_sf1.py, one source of truth), and writes one
driver-format row per query:

    {"<query>": {"rows_match": bool, "schema_match": bool,
                 "hash_match": bool, "spark_rows": int,
                 "oracle_rows": int, "err": str | null}, ...}

- ``schema_match``  = sorted column-name lists equal (the driver sorts
  columns by name before hashing, so names are the schema contract).
- ``hash_match``    = md5 over the canonical sorted rows equal — exactly
  the driver's value-hash semantics.
- ``rows_match``    = row counts equal.
- Queries registered WITHOUT an oracle get ``{"rows_only": true,
  "spark_rows": N, "err": ...}`` (the driver's weaker rows-only check).

Run it from ANYWHERE (it inserts the repo on sys.path, like the driver
does); the round-close gate runs it from /tmp so executor-import and
cwd bugs can't hide:

    cd /tmp && python /root/repo/scripts/full_sweep.py \
        --out /root/repo/CORRECTNESS_FULL_r9.json

A ``_meta`` key records sf, totals and wall time; every other key is a
query row.  Exit code is non-zero if any row is red.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from verify_sf1 import ALL_TABLES, canon, oracle_table_deps  # noqa: E402

_SEP = "\x1f"
_RSEP = "\x1e"


def canon_hash(rows) -> str:
    """md5 over the canonical sorted rows (null sentinel inside canon's
    tuples is None; encode it distinctly from the string 'None')."""
    h = hashlib.md5()
    for row in rows:
        h.update(
            _SEP.join("\x00N" if v is None else v for v in row)
            .encode("utf-8", "surrogatepass")
        )
        h.update(_RSEP.encode())
    return h.hexdigest()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--sf", type=float, default=0.01)
    ap.add_argument("--out", default=os.path.join(REPO, "CORRECTNESS_FULL.json"))
    ap.add_argument("--only", default="",
                    help="comma-separated query names to restrict to")
    args = ap.parse_args()
    only = {n for n in args.only.split(",") if n}

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as mod

    def make_spark():
        s = (
            SparkSession.builder.master(
                f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
            )
            .config("spark.sql.shuffle.partitions", "32")
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.driver.memory",
                    os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        s.sparkContext.setLogLevel("ERROR")
        return s

    def gateway_dead(exc: Exception) -> bool:
        msg = f"{type(exc).__name__}: {exc}"
        return any(
            s in msg
            for s in (
                "Connection refused", "Py4JNetworkError",
                "Answer from Java side is empty",
                "Java gateway process exited", "Py4JError",
            )
        )

    spark = make_spark()
    present = {t for t in ALL_TABLES
               if os.path.exists(f"{args.sf_dir}/{t}.parquet")}

    def fresh_con():
        c = duckdb.connect()
        c.execute("SET memory_limit='8GB'")
        for t in present:
            c.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{args.sf_dir}/{t}.parquet')"
            )
        return c

    qs, oracles = mod.queries(), mod.oracle_sql()
    results: dict = {}
    n_green = n_red = n_rows_only = 0
    t_start = time.time()
    for name in sorted(qs):
        if only and name not in only:
            continue
        t0 = time.time()
        print(f"... {name}", file=sys.stderr, flush=True)
        row = {"rows_match": False, "schema_match": False,
               "hash_match": False, "spark_rows": None,
               "oracle_rows": None, "err": None}
        for attempt in (1, 2):
            con = None
            try:
                sdf = qs[name](spark, args.sf_dir)
                sc, sr = canon(sdf.toPandas())
                row["spark_rows"] = len(sr)
                if name not in oracles:
                    row = {"rows_only": True, "spark_rows": len(sr),
                           "err": None}
                    break
                con = fresh_con()
                dc, dr = canon(con.execute(oracles[name]).fetchdf())
                row["oracle_rows"] = len(dr)
                row["rows_match"] = len(sr) == len(dr)
                row["schema_match"] = sc == dc
                row["hash_match"] = (
                    row["schema_match"] and canon_hash(sr) == canon_hash(dr)
                )
                row["err"] = None
                break
            except Exception as e:
                row["err"] = f"{type(e).__name__}: {e}"[:300]
                if gateway_dead(e) and attempt == 1:
                    print(f"RESTARTING Spark after gateway death on {name}",
                          file=sys.stderr, flush=True)
                    try:
                        spark.stop()
                    except Exception:
                        pass
                    spark = make_spark()
                    continue
                break
            finally:
                if con is not None:
                    con.close()
                try:
                    from hotdog_spark.operators import release_tracked_persists

                    release_tracked_persists()
                except Exception:
                    pass
        row["sec"] = round(time.time() - t0, 1)
        results[name] = row
        if row.get("rows_only"):
            n_rows_only += 1
        elif row.get("hash_match") and row.get("rows_match") \
                and row.get("schema_match") and row.get("err") is None:
            n_green += 1
        else:
            n_red += 1
            print(f"RED {name}: {json.dumps(row)}", file=sys.stderr)

    out = {"_meta": {
        "sf": args.sf, "sf_dir": args.sf_dir, "mode": "full",
        "queries": len(results), "green": n_green,
        "rows_only": n_rows_only, "red": n_red,
        "total_sec": round(time.time() - t_start, 1),
        "canon": "sorted columns, %.10g floats, sorted rows "
                 "(scripts/verify_sf1.py::canon)",
    }}
    out.update(results)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["_meta"]))
    sys.exit(1 if n_red else 0)


if __name__ == "__main__":
    main()
