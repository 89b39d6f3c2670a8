"""Second-order-of-magnitude stress: the superlinear-risk query families
at sf10 (100x the driver's bench sf, 10x the round-4 sf1 proof), with
per-query shuffle and spill bytes.

VERDICT r4 item 2: sf1 caught three scale bugs sf0.1 could not (knn cell
saturation, winnowing recompute, prefix-filter shuffle blowup); this run
buys the next decade for the families where risk concentrates — dedup,
ANN/knn, winnowing, text pipelines, packing, and the event windows —
plus, since r6 (VERDICT r5 item 2), the relational decade: TPC-H core
joins/aggs over 60 M lineitem rows, the window-function families, and
set-ops.

    python scripts/gen_sf1.py --sf 10 --out testdata_sf10   # once (~2 GB)
    python scripts/bench_sf10.py                      # writes SCALE_sf10.json

Output: BENCH-style JSON with per-query {sec, shuffle_write_mb,
shuffle_read_mb, spill_disk_mb, ratio_vs_sf1} plus a linearity verdict
(ratio <= 10x rows => sublinear-or-linear) and a spill tally.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

UI_PORT = int(os.environ.get("SPARK_GRAFT_UI_PORT", "4060"))

# The superlinear-risk subset: every query here has a candidate-pair,
# blocking, bucketing, or window mechanism whose constant could hide an
# n² term.  All run on documents/embeddings/events only.
SUBSET = [
    "template_block_helpers",
    "template_dotted_paths",
    "template_partials",
    "multimodal_jpeg_progressive_decode_stats",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_prefix_filter_jaccard",
    "dedup_winnowing_pairs",
    "dedup_chunk_boilerplate",
    "dedup_embedding_cosine",
    "ann_cosine_topk",
    "ann_lsh_bucketed",
    "ann_ivf",
    "knn_graph_ivf",
    "text_clean_corpus_pipeline",
    "text_token_count",
    "text_quality_score",
    "text_top_terms",
    "text_pii_scrub",
    "text_repetition_stats",
    "decontaminate_ngram_overlap",
    "decontaminate_canary_exact",
    "pack_token_budget_bins",
    "pack_sharded_bins",
    "window_tumbling_events",
    "window_session_events",
    "agg_approx_distinct_users_sketch_only",
    "dedup_image_ahash",
    "multimodal_jpeg_color_decode_stats",
    "quality_lm_bigram",
    "curation_importance_weights",
    # Relational/window decade (VERDICT r5 item 2) — runs once gen_sf1
    # --sf 10 produced the full table set.  TPC-H core joins/aggs over
    # 60 M lineitem, the window-function single-partition risk class,
    # set-ops, and the event-table windows that were previously the only
    # relational rows.
    "q1_pricing_summary",
    "q3_segment_revenue",
    "q5_regional_revenue",
    "q6_forecast_revenue",
    "q9_product_profit",
    "q10_returned_item_revenue",
    "q13_customer_order_distribution",
    "q18_large_volume_customers",
    "q21_waiting_suppliers",
    "topk_orders_global",
    "agg_rollup_returnflag",
    "agg_cube_priority_status",
    "pivot_status_by_priority",
    "orders_above_customer_avg",
    "window_topk_orders_per_customer",
    "window_rank_dense_lag",
    "window_value_functions",
    "window_running_customer_spend",
    "window_ntile_distribution",
    "window_range_frame_rolling_revenue",
    "set_intersect_union_nations",
    "set_except_nations",
    "sessionize_user_events",
    "scd2_user_state_history",
    "asof_click_attribution",
    "range_join_error_window_clicks",
    "merge_exact_deep",
    "syslog_parse_5424",
    "hotdog_route_payload",
    # Round-6 continuation families
    "graph_pagerank_lsh",
    "graph_degree_distribution_lsh",
    "incremental_hourly_event_rollup",
    "quantile_exact_multipass_price",
    "seq_frequent_event_bigrams",
    "stats_join_key_profile",
    "stats_numeric_correlations",
    "chunk_documents_overlap",
    "basket_part_pairs",
    "stats_revenue_trend_by_nation",
    "embedding_pca_top_component",
    # Round-6 continuation-session additions: the kmeans-backed family
    # (kernel trainers), PQ/IVF-PQ search, the LSH-composed leakage
    # audit, and the quantile-composed winsorize — each has a kernel,
    # LUT-fanout, candidate-pair, or multi-pass mechanism worth a decade
    # check.
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
    # Round-7 additions: the sampled/aggregate twins (same joins as
    # their excluded full-result siblings), the now-tractable component
    # queries, BPE (train loop + encode kernel + tokenizer-unit
    # packing), the KMV sketch merge, and the JPEG decode kernel.
    "dedup_fuzzy_levenshtein_sampled",
    "dedup_winnowing_pair_stats",
    "dedup_cdc_chunk_stats",
    "dedup_minhash_components",
    "dedup_components_best_quality",
    "decontaminate_semantic_cosine",
    "multimodal_jpeg_decode_stats",
    "agg_distinct_users_kmv_sketch",
    "bpe_train_merges",
    "bpe_encode_stats",
    "pack_bpe_token_bins",
    "dedup_provenance_report",
    # Round-8 additions: sketch set algebra (k-array self-join), the
    # token-position-sized substring scan, the blocked Hamming pair
    # search (answer-proportional under the saturated corpus — cap
    # guard), popcount ANN, the dhash decode kernel, and the bounded
    # k-anonymity aggregate.
    "agg_kmv_set_jaccard",
    "dedup_repeated_ngram_spans",
    "dedup_simhash_hamming",
    "ann_binary_hamming_topk",
    "dedup_image_dhash",
    "privacy_k_anonymity_report",
    "wordpiece_train_merges",
    "wordpiece_encode_stats",
    "privacy_l_diversity_report",
    "privacy_t_closeness_report",
    "dedup_audio_energy_fp",
    "dedup_video_frame_signature",
    "ann_binary_recall_report",
    "dedup_simhash_components",
]


def _api(app_id: str, path: str):
    url = f"http://127.0.0.1:{UI_PORT}/api/v1/applications/{app_id}/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def _stage_metrics(app_id: str) -> dict[tuple, dict]:
    out = {}
    for st in _api(app_id, "stages?status=complete"):
        out[(st["stageId"], st["attemptId"])] = {
            "sw": st.get("shuffleWriteBytes", 0),
            "sr": st.get("shuffleReadBytes", 0),
            "spill_disk": st.get("diskBytesSpilled", 0),
        }
    return out


def main() -> None:
    sf_dir = os.environ.get(
        "SPARK_GRAFT_SF_DIR", os.path.join(REPO, "testdata_sf10")
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("hotdog-spark-bench-sf10")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    import __spark_entry__ as entry_mod

    from hotdog_spark.operators import release_tracked_persists

    queries = entry_mod.queries()
    from hotdog_spark.queries import bench_only_queries

    queries.update(bench_only_queries())

    # warmup (JVM, codegen, python worker pool)
    spark.range(100_000).selectExpr("sum(id)").write.mode("overwrite").format("noop").save()
    from pyspark.sql.functions import pandas_udf

    _warm = pandas_udf(lambda s: s, "long")
    spark.range(10_000).repartition(int(cpus)).select(_warm("id")).write.mode(
        "overwrite"
    ).format("noop").save()

    # sf1 reference times for the 10x-linearity check (override the
    # anchor file for alternate corpora, e.g. the Zipf fixtures)
    sf1 = {}
    try:
        anchor = os.environ.get(
            "SPARK_GRAFT_SF1_ANCHOR", os.path.join(REPO, "SCALE_sf1.json")
        )
        with open(anchor) as f:
            sf1 = {k: v["sec"] for k, v in json.load(f)["queries"].items()}
    except Exception:
        pass

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    results: dict[str, dict] = {}
    seen = set(_stage_metrics(app_id))
    import warnings

    names = SUBSET
    # SPARK_GRAFT_BENCH_ONLY=a,b,c — bench just those and merge into the
    # existing artifact (totals recomputed over the merged set).
    only = {n for n in os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").split(",") if n}
    if only:
        names = [n for n in names if n in only]
    for name in names:
        fn = queries[name]
        best = None
        caught: list = []
        try:
            for _ in range(runs):
                t0 = time.perf_counter()
                # record operator-emitted UserWarnings (e.g. the winnowing
                # saturation guard, VERDICT r5 item 5) into the artifact so
                # the "warns at sf10" claim is evidenced, not asserted
                with warnings.catch_warnings(record=True) as w:
                    warnings.simplefilter("always")
                    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                    caught = [str(x.message)[:300] for x in w
                              if issubclass(x.category, UserWarning)]
                el = time.perf_counter() - t0
                best = el if best is None else min(best, el)
                release_tracked_persists()
        except Exception as e:
            results[name] = {"error": str(e)[:300]}
            print(f"  {name}: ERROR {str(e)[:200]}", file=sys.stderr)
            seen = set(_stage_metrics(app_id))
            continue
        stages = _stage_metrics(app_id)
        new = [m for sid, m in stages.items() if sid not in seen]
        seen = set(stages)
        mb = 1024 * 1024
        entry = {
            "sec": round(best, 3),
            "shuffle_write_mb": round(sum(m["sw"] for m in new) / mb / runs, 1),
            "shuffle_read_mb": round(sum(m["sr"] for m in new) / mb / runs, 1),
            "spill_disk_mb": round(sum(m["spill_disk"] for m in new) / mb / runs, 1),
        }
        if name in sf1 and sf1[name]:
            entry["ratio_vs_sf1"] = round(best / sf1[name], 2)
        if caught:
            entry["operator_warnings"] = caught
        results[name] = entry
        print(f"  {name}: {entry}", file=sys.stderr)

    out_path = os.environ.get("SPARK_GRAFT_BENCH_OUT", os.path.join(REPO, "SCALE_sf10.json"))
    if only and os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f).get("queries", {})
        merged.update(results)
        results = merged
    ok = {n: r for n, r in results.items() if "sec" in r}
    total = round(sum(r["sec"] for r in ok.values()), 3)
    superlinear = sorted(
        n for n, r in ok.items() if r.get("ratio_vs_sf1", 0) > 10
    )
    payload = {
        "metric": "superlinear_risk_subset_total_sf10",
        "value": total,
        "unit": "sec",
        "sf": 10.0,
        "rows_scale_vs_sf1": 10,
        "runs_per_query": runs,
        "queries": results,
        "superlinear_queries": superlinear,
        "errors": sorted(n for n, r in results.items() if "error" in r),
        "total_spill_disk_mb": round(
            sum(r.get("spill_disk_mb", 0) for r in ok.values()), 1
        ),
    }
    out = os.environ.get("SPARK_GRAFT_BENCH_OUT", os.path.join(REPO, "SCALE_sf10.json"))
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({k: v for k, v in payload.items() if k != "queries"}))
    spark.stop()


if __name__ == "__main__":
    main()
