"""Correctness AT scale: run Spark-vs-DuckDB oracle comparison on a
scaled dataset for every query whose tables exist and whose oracle is
tractable there.

The driver's correctness gate runs at sf0.01; the scale benches prove
throughput but not answers.  This script closes that gap: same
canonicalization (sorted columns, %.10g floats, null sentinel), 10x-100x
the rows.

Two comparison modes:

``--mode digest`` (default) — order-insensitive multiset digest:
  per row, canonicalize (identical branch logic to the full comparator),
  md5 the joined cells, and sum the 128-bit hashes mod the Mersenne
  prime 2^127-1, alongside an exact row count.  The Spark side computes
  partial digests INSIDE the engine via a mapInPandas kernel (one
  Arrow-batched pass per partition; the driver receives one tiny row per
  partition and combines), so driver memory is O(partitions), not
  O(result).  The DuckDB side streams ``fetch_record_batch`` chunks
  through the SAME canonicalization function — DuckDB is in-process, so
  "in-engine" there means bounded-batch streaming, never a full
  ``fetchdf`` materialization.  This retires the r5 harness failure mode
  where 43 sf10 queries died in driver-side numpy/DuckDB allocation
  (500 k-row ``toPandas()`` + 32 GB-capped oracle), not in either engine.

  Why not a pure-SQL digest (``sum(xxhash64(cast(...)))`` in both
  dialects)?  Float canonicalization parity: Java's Formatter ``%g``
  (Spark ``format_string``) disagrees with C/Python ``%g`` (DuckDB
  ``printf``) on precision/trailing-zero rules, which is exactly the
  false-mismatch class the Python canonicalizer exists to avoid.  The
  mapInPandas kernel keeps the hash computation distributed and
  Arrow-batched while sharing one formatting code path with the oracle
  side.

``--mode full`` — the original comparator (full result through pandas,
  sorted-row exact match).  ``--mode both`` runs the two side-by-side
  and records any disagreement; used once at sf0.1 to prove the digest
  equivalent on all 150 queries (DIGEST_EQUIVALENCE.json).

    python scripts/gen_sf1.py                     # once
    python scripts/verify_sf1.py                  # SCALE_sf1_correctness.json

    python scripts/gen_sf1.py --sf 10 --out testdata_sf10  # once (all tables)
    python scripts/verify_sf1.py --sf-dir testdata_sf10 --sf 10 \
        --out SCALE_sf10_correctness.json \
        --exclude dedup_winnowing_pairs,dedup_fuzzy_levenshtein

Queries over tables absent from the directory are classified as
``skipped_missing_table`` UP FRONT, from the table names referenced in
the query's oracle SQL — never by pattern-matching runtime error text
(the r5 approach could silently file a genuine failure as a skip).
Queries whose DuckDB oracle was MEASURED intractably slow are excluded
via --exclude with the measurement recorded in the committed artifact's
notes — their semantics stay pinned at every smaller SF.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import math
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

M127 = (1 << 127) - 1  # Mersenne prime: digest sums live in Z/M127
_NULL = "\x00N"        # canonical cell for SQL NULL / NaN
_SEP = "\x1f"          # cell joiner; synthetic data carries no control chars


def canon(df):
    """Full-materialization canonicalizer (``--mode full``): sorted
    columns, %.10g floats, sorted row tuples.  Unchanged from r1-r5 so
    `both` mode proves the digest against the exact historical gate."""
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


def batch_digest(pdf, cols):
    """(sum-of-row-hashes mod M127, row count) for one pandas batch.

    Cell canonicalization is branch-for-branch the logic in
    :func:`canon` (None/NaN -> sentinel, numpy scalar unwrap, %.10g for
    floats, str otherwise), so digest equality <=> sorted-row equality
    up to md5 collisions.  Runs inside Spark executors (mapInPandas)
    and over DuckDB record batches alike."""
    s = 0
    n = 0
    for row in pdf[cols].itertuples(index=False):
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append(_NULL)
            else:
                if hasattr(v, "item"):
                    v = v.item()
                vals.append(f"{v:.10g}" if isinstance(v, float) else str(v))
        h = hashlib.md5(_SEP.join(vals).encode("utf-8", "surrogatepass"))
        s = (s + int.from_bytes(h.digest(), "big")) % M127
        n += 1
    return s, n


def spark_digest(sdf):
    """(sorted cols, count, digest) computed inside the engine: each
    partition reduces to one (partial_sum, partial_n) row; the driver
    combines P tiny rows.  O(Arrow batch) executor memory, O(partitions)
    driver memory at any scale factor."""
    import pandas as pd

    cols = sorted(sdf.columns)

    def kernel(batches):
        s, n = 0, 0
        for pdf in batches:
            ps, pn = batch_digest(pdf, cols)
            s = (s + ps) % M127
            n += pn
        yield pd.DataFrame({"part_sum": [str(s)], "part_n": [n]})

    parts = sdf.mapInPandas(kernel, "part_sum string, part_n long").collect()
    s, n = 0, 0
    for r in parts:
        s = (s + int(r["part_sum"])) % M127
        n += r["part_n"]
    return cols, n, s


def duck_digest(con, sql, batch_rows=65536):
    """Same digest over the oracle, streamed in Arrow record batches —
    no full-result fetchdf, so the 32 GB DuckDB cap bounds the QUERY,
    not query + query + result-frame + numpy copies.

    Spill-to-disk: an in-memory ``duckdb.connect()`` has NO
    temp_directory, so DuckDB's larger-than-memory operators are
    silently disabled and any join/aggregate that crosses memory_limit
    hard-OOMs instead of spilling (round-6 sf10 finding: the PPJoin
    oracle died at 32 GB solo).  Point temp_directory at a repo-local
    scratch dir so the cap becomes a working-set bound, not a query
    death sentence."""
    try:
        tmp = os.path.join(REPO, ".tmp")
        os.makedirs(tmp, exist_ok=True)
        con.execute(f"SET temp_directory='{tmp}'")
        con.execute("SET max_temp_directory_size='60GiB'")
    except Exception:
        pass  # older DuckDB without the setting: behave as before
    reader = con.execute(sql).fetch_record_batch(batch_rows)
    cols = sorted(reader.schema.names)
    s, n = 0, 0
    for batch in reader:
        pdf = batch.to_pandas()
        ps, pn = batch_digest(pdf, cols)
        s = (s + ps) % M127
        n += pn
    return cols, n, s


def duck_digest_isolated(sf_dir, present, sql, mem):
    """duck_digest in a CHILD process.  Round-6 sf10 finding: one
    OOM-ing oracle (dedup_prefix_filter_jaccard's PPJoin SQL) poisons
    the PARENT process — after DuckDB's std::bad_alloc, every later
    ``duckdb.connect()`` in the same process fails instantly on 8-byte
    allocations (the died instance's pool is never returned to the
    process heap), which burned all 43 queries of batch b3 twice.
    Fresh-connection-per-query cannot fix that; a subprocess boundary
    makes the blast radius exactly one query by construction.  ~1 s
    spawn overhead per query, noise against sf10 oracle runtimes."""
    import subprocess

    payload = json.dumps({
        "sf_dir": sf_dir, "tables": sorted(present), "sql": sql, "mem": mem,
    })
    prog = (
        "import sys, json\n"
        "sys.path.insert(0, " + repr(REPO) + ")\n"
        "sys.path.insert(0, " + repr(os.path.join(REPO, "scripts")) + ")\n"
        "from verify_sf1 import duck_digest\n"
        "import duckdb\n"
        "cfg = json.loads(sys.stdin.read())\n"
        "con = duckdb.connect()\n"
        "con.execute(\"SET memory_limit='%s'\" % cfg['mem'])\n"
        # slow oracles draw a \r progress bar on stdout that corrupts
        # the result line (measured: 'Extra data' JSON errors)
        "con.execute(\"SET enable_progress_bar=false\")\n"
        "for t in cfg['tables']:\n"
        "    con.execute(\"CREATE VIEW %s AS SELECT * FROM "
        "read_parquet('%s/%s.parquet')\" % (t, cfg['sf_dir'], t))\n"
        "cols, n, s = duck_digest(con, cfg['sql'])\n"
        "print(json.dumps({'cols': cols, 'n': n, 's': str(s)}))\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", prog], input=payload, capture_output=True,
        text=True, timeout=3600,
    )
    if r.returncode != 0:
        tail = (r.stderr or "").strip().splitlines()
        raise RuntimeError(
            "oracle subprocess failed (rc %s): %s"
            % (r.returncode, " | ".join(tail[-3:])[:280])
        )
    lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(
            "oracle subprocess produced no result line: %r" % r.stdout[-200:]
        )
    out = json.loads(lines[-1])
    return out["cols"], out["n"], int(out["s"])


ALL_TABLES = ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split()


def oracle_table_deps(sql: str) -> set:
    """Tables a query needs, decided from the oracle text up front
    (word-boundary match against the registered view names).  Replaces
    the r5 error-text pattern-match that could misfile a real failure
    as skipped_missing_table."""
    return {t for t in ALL_TABLES if re.search(rf"\b{t}\b", sql)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.path.join(REPO, "testdata_sf1"))
    ap.add_argument("--sf", type=float, default=1.0)
    # REQUIRED (r10 lesson): the old default was the COMMITTED
    # SCALE_sf1_correctness.json, so a quick `--only x` spot-check run
    # without --out silently truncated the 213-query artifact to the
    # spot-checked subset (caught via git history, restored + re-merged)
    ap.add_argument("--out", required=True,
                    help="output path; use /tmp/sf1_part_*.json partials "
                         "and scripts/merge_sf1_parts.py for the artifact")
    ap.add_argument("--mode", choices=("digest", "full", "both"), default="digest")
    ap.add_argument("--only", default="",
                    help="comma-separated query names to restrict the sweep to")
    ap.add_argument("--exclude", default="",
                    help="comma-separated query names with measured-heavy oracles")
    args = ap.parse_args()
    sf_dir = args.sf_dir if os.path.isabs(args.sf_dir) else os.path.join(REPO, args.sf_dir)
    exclude = {n for n in args.exclude.split(",") if n}
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
            .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        s.sparkContext.setLogLevel("ERROR")
        return s

    def gateway_dead(exc: Exception) -> bool:
        """One OOM'd query must not doom the rest of a 150-query sweep:
        when the local-mode JVM dies, every later Py4J call fails with a
        connection error.  Detect that class and restart the session."""
        msg = f"{type(exc).__name__}: {exc}"
        return any(
            s in msg
            for s in (
                "Connection refused",
                "Py4JNetworkError",
                "Answer from Java side is empty",
                "Java gateway process exited",
                "Py4JError",
            )
        )

    spark = make_spark()
    present = {t for t in ALL_TABLES if os.path.exists(f"{sf_dir}/{t}.parquet")}
    missing = {t for t in ALL_TABLES if t not in present}

    def fresh_con():
        """A NEW connection per query: DuckDB's buffer pool grows toward
        its memory_limit and caches aggressively — a 100+-query sweep
        over 100x data on one connection exhausted the box alongside the
        Spark JVM (every post-OOM query then failed on kB-sized
        allocations).  Reconnecting releases the pool; the explicit
        limit keeps DuckDB + JVM + Arrow inside physical memory."""
        c = duckdb.connect()
        c.execute(f"SET memory_limit='{os.environ.get('SPARK_GRAFT_DUCK_MEM', '32GB')}'")
        for t in present:
            c.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return c

    qs, os_ = mod.queries(), mod.oracle_sql()
    results, bad, disagree = {}, [], []
    n_skipped = 0
    for name in sorted(qs):
        if only and name not in only:
            continue
        if name not in os_:
            results[name] = {"status": "rows_only"}
            continue
        if name in exclude:
            results[name] = {"status": "excluded_heavy_oracle"}
            continue
        deps = oracle_table_deps(os_[name])
        if deps & missing:
            results[name] = {"status": "skipped_missing_table",
                             "needs": sorted(deps & missing)}
            n_skipped += 1
            continue
        t0 = time.time()
        print(f"... {name}", file=sys.stderr, flush=True)
        err = None
        for attempt in (1, 2):
            con = None
            try:
                rec = {}
                sdf = qs[name](spark, sf_dir)
                if args.mode in ("digest", "both"):
                    sc, sn, ss = spark_digest(sdf)
                    dc, dn, ds = duck_digest_isolated(
                        sf_dir, present, os_[name],
                        os.environ.get("SPARK_GRAFT_DUCK_MEM", "32GB"),
                    )
                    ok = sc == dc and sn == dn and ss == ds
                    rec.update(rows=sn, oracle_rows=dn,
                               cols_match=sc == dc, digest_match=ss == ds)
                if args.mode in ("full", "both"):
                    con = fresh_con()
                    fsc, fsr = canon(sdf.toPandas())
                    fdc, fdr = canon(con.execute(os_[name]).fetchdf())
                    full_ok = fsc == fdc and fsr == fdr
                    rec["full_status"] = "match" if full_ok else "MISMATCH"
                    if args.mode == "full":
                        ok = full_ok
                        rec["rows"] = len(fsr)
                    elif full_ok != ok:
                        disagree.append(name)
                        rec["MODE_DISAGREEMENT"] = True
                err = None
                break
            except Exception as e:
                err = e
                if gateway_dead(e) and attempt == 1:
                    # the JVM died (heap OOM, typically); restart and
                    # retry this one query on a fresh session so the
                    # remainder of the sweep isn't burned
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
                # operators persist multi-consumer intermediates; a
                # 150-query session would otherwise accumulate every
                # query's cache (guarded: unpersist needs a live JVM)
                try:
                    from hotdog_spark.operators import release_tracked_persists

                    release_tracked_persists()
                except Exception:
                    pass
        if err is not None:
            msg = str(err)
            results[name] = {"status": "error", "error": msg[:300]}
            bad.append(name)
            print(f"ERROR {name}: {msg[:200]}", file=sys.stderr)
            if gateway_dead(err):
                # second strike on a fresh session: record and move on,
                # but make sure the next query starts against a live JVM
                try:
                    spark.stop()
                except Exception:
                    pass
                spark = make_spark()
            continue
        rec["status"] = "match" if ok else "MISMATCH"
        rec["sec"] = round(time.time() - t0, 1)
        results[name] = rec
        if not ok:
            bad.append(name)
            print(f"MISMATCH {name}", file=sys.stderr)
    # Stamp provenance AT RECORD TIME (ADVICE r7): /tmp partials may be
    # merged several commits later, and the merge scripts previously
    # re-stamped every row with merge-time HEAD, misattributing which
    # code produced a record.  The merge scripts now preserve this.
    try:
        import subprocess

        head = subprocess.run(
            ["git", "-C", REPO, "rev-parse", "HEAD"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
        for r in results.values():
            r.setdefault("commit", head)
    except Exception:
        pass  # provenance is best-effort; the record itself still lands
    n_match = sum(1 for r in results.values() if r["status"] == "match")
    payload = {
        "sf": args.sf,
        "mode": args.mode,
        "checked": n_match + len(bad),
        "matched": n_match,
        "mismatched_or_error": bad,
        "mode_disagreements": disagree,
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
