"""A/B the stopword-count implementation (HOF filter vs single regexp)
on the stopword-dependent text queries — the measurement VERDICT r5
item 3 asked for: the r5 HOF→regexp swap claimed an sf10 win that was
never recorded, while costing 1.71x/1.31x at sf0.1.

Runs each query median-of-3 per implementation per scale directory,
forcing the impl via HOTDOG_STOPWORD_IMPL (read at expression-build
time, so each run re-builds the plan).  Tracked persists are released
between runs so no cache warms the second arm.

    python scripts/ab_textops.py --sf-dirs /root/testdata/sf0.1,testdata_sf10 \
        --out AB_TEXTOPS.json
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = [
    "text_quality_score",        # 1x _stopword_hits (en)
    "text_language_id",          # 5x (all languages)
    "text_clean_corpus_pipeline",  # stopword ratio inside the wash
    "text_token_count",          # NO stopwords — bench-wobble control
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dirs", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="AB_TEXTOPS.json")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import __spark_entry__ as mod
    from hotdog_spark.operators import release_tracked_persists

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
    qs = mod.queries()
    out = {}
    for sf_dir in args.sf_dirs.split(","):
        sf_dir = sf_dir if os.path.isabs(sf_dir) else os.path.join(REPO, sf_dir)
        key = os.path.basename(sf_dir.rstrip("/"))
        out[key] = {}
        for name in QUERIES:
            out[key][name] = {}
            for impl in ("hof", "regexp"):
                os.environ["HOTDOG_STOPWORD_IMPL"] = impl
                times = []
                for _ in range(args.reps):
                    t0 = time.time()
                    # Force full evaluation of every column: agg over a
                    # hash of all columns so nothing is pruned.  The hash
                    # is reduced mod a 30-bit prime before SUM — ANSI
                    # mode makes a raw sum(xxhash64) overflow fatal.
                    df = qs[name](spark, sf_dir)
                    from pyspark.sql import functions as F

                    df.select(
                        F.sum(F.pmod(F.xxhash64(*df.columns),
                                     F.lit(1_073_741_789))).alias("h")
                    ).collect()
                    times.append(time.time() - t0)
                    release_tracked_persists()
                out[key][name][impl] = round(statistics.median(times), 3)
                print(f"{key} {name} {impl}: {out[key][name][impl]}s",
                      file=sys.stderr, flush=True)
            h, r = out[key][name]["hof"], out[key][name]["regexp"]
            out[key][name]["regexp_over_hof"] = round(r / h, 3) if h else None
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
