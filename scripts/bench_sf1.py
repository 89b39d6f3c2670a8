"""Scale-proof bench: the headline query set at sf1 (10x the driver's
bench sf) with per-query SHUFFLE and SPILL bytes, not just wall time.

VERDICT r3 item 1: "run the headline set at sf1 on local[32], record
per-query times + peak shuffle sizes ... Done = sf1 run completes with no
OOM/spill cliff, per-query time growth ~ linear."  This script is that
run.  It reuses bench.py's HEADLINE list and warmup, enables the local
status REST API, and attributes completed stages to the query that ran
them — summing shuffle write/read and memory/disk spill per query.

    python scripts/gen_sf1.py                 # once: writes testdata_sf1/
    python scripts/bench_sf1.py               # writes SCALE_sf1.json

Output: BENCH-style JSON with per-query {sec, shuffle_write_mb,
shuffle_read_mb, spill_disk_mb, ratio_vs_sf01} plus a linearity verdict
per query (ratio <= 10x rows => sublinear-or-linear).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (HEADLINE + _prev_bench live there)

UI_PORT = int(os.environ.get("SPARK_GRAFT_UI_PORT", "4050"))

# Baseline rows for the sf10 relational/window decade (VERDICT r5 item
# 2): queries NOT in bench.py's driver-facing HEADLINE (so its total
# stays round-comparable) whose sf1 sec anchors bench_sf10's
# ratio_vs_sf1.  Window functions over full orders/lineitem are the
# single-partition-window risk class; set-ops and the gap-fill exercise
# distinct/union exchanges; sessionize was sf1's slowest single query.
EXTRA = [
    "window_rank_dense_lag",
    "window_value_functions",
    "window_running_customer_spend",
    "window_ntile_distribution",
    "window_range_frame_rolling_revenue",
    "set_intersect_union_nations",
    "set_except_nations",
    "sessionize_user_events",
    "agg_cube_priority_status",
    "pivot_status_by_priority",
    "orders_above_customer_avg",
    "q13_customer_order_distribution",
    "scd2_user_state_history",
    # Round-6 continuation-session additions
    "dedup_semantic_exemplar",
    "kmeans_embedding_clusters",
    "corpus_cluster_diversity",
    "embedding_pq_codebook",
    "ann_pq_adc",
    "ann_ivf_pq",
    "split_leakage_report",
    "winsorize_event_values",
    "anomaly_mad_hourly_rates",
    "profile_source_length_histogram",
    "ann_pq_recall_report",
    # Round-7 additions (bpe_*/kmv/jpeg/fuzzy-sampled/pack-bpe ride the
    # headline list; these are the non-headline round-7 queries)
    "dedup_winnowing_pair_stats",
    "dedup_minhash_components",
    "dedup_components_best_quality",
    "decontaminate_semantic_cosine",
    "bpe_encode_stats",
    "dedup_provenance_report",
]


def _api(app_id: str, path: str):
    url = f"http://127.0.0.1:{UI_PORT}/api/v1/applications/{app_id}/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def _stage_metrics(app_id: str) -> dict[int, dict]:
    out = {}
    for st in _api(app_id, "stages?status=complete"):
        sid = (st["stageId"], st["attemptId"])
        out[sid] = {
            "sw": st.get("shuffleWriteBytes", 0),
            "sr": st.get("shuffleReadBytes", 0),
            "spill_mem": st.get("memoryBytesSpilled", 0),
            "spill_disk": st.get("diskBytesSpilled", 0),
        }
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", os.path.join(REPO, "testdata_sf1"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("hotdog-spark-bench-sf1")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    from hotdog_spark.queries import bench_only_queries

    queries.update(bench_only_queries())

    # same warmup discipline as bench.py
    spark.range(100_000).selectExpr("sum(id)").write.mode("overwrite").format("noop").save()
    queries["hotdog_route_cascade"](spark, sf_dir).write.mode("overwrite").format("noop").save()
    from pyspark.sql.functions import pandas_udf

    _warm = pandas_udf(lambda s: s, "long")
    spark.range(10_000).repartition(int(cpus)).select(_warm("id")).write.mode(
        "overwrite"
    ).format("noop").save()

    # sf0.1 reference times for the linearity check
    prev = bench._prev_bench()
    sf01 = (prev[1].get("queries", {}) if prev else {})

    from hotdog_spark.operators import release_tracked_persists

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    results: dict[str, dict] = {}
    seen = set(_stage_metrics(app_id))
    names = bench.HEADLINE + EXTRA
    # SPARK_GRAFT_BENCH_ONLY=a,b,c — re-bench just those queries and
    # MERGE into the existing artifact (totals recomputed over the
    # merged set), so adding N queries doesn't cost a full re-run.
    only = {n for n in os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").split(",") if n}
    if only:
        names = [n for n in names if n in only]
    for name in names:
        fn = queries[name]
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
            release_tracked_persists()
        stages = _stage_metrics(app_id)
        new = [m for sid, m in stages.items() if sid not in seen]
        seen = set(stages)
        mb = 1024 * 1024
        entry = {
            "sec": round(best, 3),
            # metrics cover all `runs` executions of this query
            "shuffle_write_mb": round(sum(m["sw"] for m in new) / mb / runs, 1),
            "shuffle_read_mb": round(sum(m["sr"] for m in new) / mb / runs, 1),
            "spill_disk_mb": round(sum(m["spill_disk"] for m in new) / mb / runs, 1),
        }
        if name in sf01 and sf01[name]:
            entry["ratio_vs_sf01"] = round(best / sf01[name], 2)
        results[name] = entry
        print(f"  {name}: {entry}", file=sys.stderr)

    out = os.environ.get("SPARK_GRAFT_BENCH_OUT", os.path.join(REPO, "SCALE_sf1.json"))
    if only and os.path.exists(out):
        with open(out) as f:
            merged = json.load(f).get("queries", {})
        merged.update(results)
        results = merged
    total = round(sum(r["sec"] for r in results.values()), 3)
    superlinear = sorted(
        n for n, r in results.items() if r.get("ratio_vs_sf01", 0) > 10
    )
    payload = {
        "metric": "headline_query_set_total_sf1",
        "value": total,
        "unit": "sec",
        "sf": 1.0,
        "rows_scale_vs_sf01": 10,
        "runs_per_query": runs,
        "queries": results,
        "superlinear_queries": superlinear,
        "total_spill_disk_mb": round(
            sum(r["spill_disk_mb"] for r in results.values()), 1
        ),
    }
    out = os.environ.get("SPARK_GRAFT_BENCH_OUT", os.path.join(REPO, "SCALE_sf1.json"))
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({k: v for k, v in payload.items() if k != "queries"}))
    spark.stop()


if __name__ == "__main__":
    main()
