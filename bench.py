"""Benchmark harness: runs the headline query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}

Execution is measured with the no-op sink (df.write.format("noop")) so
timings capture scan→compute→shuffle, not driver-side collection.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _current_round() -> int | None:
    """The in-progress round number: VERDICT.md is written at the END of
    round N, so its header 'round N' means we are now in round N+1."""
    try:
        with open(os.path.join(REPO, "VERDICT.md")) as f:
            m = re.search(r"VERDICT\s*[—-]+\s*round\s*(\d+)", f.read(2000))
        return int(m.group(1)) + 1 if m else None
    except Exception:
        return None


def _prev_bench() -> tuple[str, dict] | None:
    """Latest BENCH_r{N}.json from a round STRICTLY BELOW the current one
    (the driver writes BENCH_r{current} mid-round; comparing against it
    would report all-1.0 deltas and mask regressions).  Override with
    $SPARK_GRAFT_BENCH_BASELINE=<path>."""
    override = os.environ.get("SPARK_GRAFT_BENCH_BASELINE")
    cur = _current_round()

    def _load(path):
        try:
            with open(path) as f:
                data = json.load(f)
            # the driver wraps our JSON line: {n, rc, ..., parsed: {payload}}
            if "parsed" in data and isinstance(data["parsed"], dict):
                data = data["parsed"]
            # a truncated capture (r3's head was cut) parses but has no
            # queries map — useless as a baseline, treat as unreadable
            if not data.get("queries"):
                return None
            return os.path.basename(path), data
        except Exception:
            return None

    if override:
        return _load(override)
    # prefer the driver's file for a round, fall back to the locally
    # recorded BENCH_LOCAL_r{N}.json when the driver capture is unusable
    benches = []
    for pat in ("BENCH_r*.json", "BENCH_LOCAL_r*.json"):
        for p in glob.glob(os.path.join(REPO, pat)):
            m = re.search(r"BENCH(_LOCAL)?_r(\d+)\.json$", p)
            if m and (cur is None or int(m.group(2)) < cur):
                benches.append((int(m.group(2)), m.group(1) is None, p))
    for _, _, path in sorted(benches, reverse=True):
        loaded = _load(path)
        if loaded is not None:
            return loaded
    return None

# The headline set: one representative per operator family, stable across
# rounds for comparability.
HEADLINE = [
    "hotdog_route_payload",        # parse → cascade → route (native merge)
    "template_block_helpers",      # {{#if}}/{{#each}} → CASE WHEN/transform
    "template_dotted_paths",       # {{a.b.c}} → get_json_object
    "template_partials",           # {{> name}} compile-time inlining
    "decontaminate_canary_exact",  # Aho-Corasick exact-substring scan
    "merge_exact_deep",            # Arrow-batched UDF merge path
    "syslog_parse_5424",           # regexp parse + PRI decode
    "q1_pricing_summary",          # wide hash aggregation
    "q3_segment_revenue",          # 3-way fact join + agg
    "q5_regional_revenue",         # 6-way join with broadcast dims
    "q6_forecast_revenue",         # selective pushdown scan
    "window_topk_orders_per_customer",  # ranking window
    "topk_orders_global",          # global top-k
    "agg_rollup_returnflag",       # grouping sets
    "dedup_exact",                 # hash dedup
    "dedup_minhash_lsh",           # shingle → minhash → bucket join
    "dedup_simhash",               # simhash aggregation
    "ann_cosine_topk",             # brute-force vector top-k
    "ann_lsh_bucketed",            # bucketed ANN
    "text_quality_score",          # text feature extraction
    "text_token_count",            # tokenization counts
    "window_tumbling_events",      # event-time tumbling windows
    "window_session_events",       # session windows
    "asof_click_attribution",      # as-of join (union + keyed sort)
    "range_join_error_window_clicks",  # bucketed range join
    "ann_ivf",                     # IVF cell-pruned vector search
    "dedup_embedding_cosine",      # sign-bucketed embedding near-dup
    "text_clean_corpus_pipeline",  # composed one-scan cleaning pipeline
    "q10_returned_item_revenue",   # 4-way join top-k
    "q18_large_volume_customers",  # HAVING aggregate + back-joins
    "q9_product_profit",           # 5-way join + LIKE-filtered broadcast
    "q21_waiting_suppliers",       # co-partitioned semi/anti self-joins
    "text_top_terms",              # TF ranking window over explode
    "pack_token_budget_bins",      # window cumsum packing
    "array_higher_order_stats",    # JVM lambda array math
    "text_pii_scrub",              # PII/denylist regex redaction audit
    "text_repetition_stats",       # islands run-detection repetition filters
    "decontaminate_ngram_overlap", # broadcast benchmark-gram decontamination
    "pipeline_corpus_build",       # composed scrub→gate→dedup→pack pipeline
    "dedup_chunk_boilerplate",     # sub-document repeated-span removal
    "dedup_cdc_chunk_stats",       # Rabin CDC chunking + cross-doc chunk sharing
    "export_shard_manifest",       # deterministic shard + order manifest
    "dedup_winnowing_pairs",       # MOSS stage-2 fingerprint pair join
    "agg_approx_distinct_users_sketch_only",  # HLL rollup, sketch cost only
    "knn_graph_ivf",               # all-nodes kNN graph, cell-keyed join
    "pack_sharded_bins",           # (lang, shard)-parallel packing
    "dedup_prefix_filter_jaccard", # PPJoin rare-prefix set-similarity join
    "multimodal_audio_pcm_chunks", # WAV synth → real PCM decode → frame-aligned chunk stats
    "dedup_semantic_exemplar",     # SemDeDup: kmeans + O(n) exemplar screen
    "dedup_lsh_recall_report",     # LSH recall/precision vs exact-Jaccard sample
    "dedup_image_ahash",           # PNG decode → 8x8 aHash → hash-group dedup
    "quality_lm_bigram",           # corpus bigram LM familiarity scoring
    "curation_importance_weights", # DSIR-style hashed-ngram importance weights
    "graph_pagerank_lsh",          # integer-exact Pregel PageRank over LSH graph
    "incremental_hourly_event_rollup",  # mergeable-state view maintenance
    "quantile_exact_multipass_price",   # exact quantiles, no global sort
    "seq_frequent_event_bigrams",  # transition support+lift sequence mining
    "stats_numeric_correlations",  # one-pass exact-moment correlation matrix
    "chunk_documents_overlap",     # RAG sliding-window chunking
    "stats_join_key_profile",      # pre-join NDV/skew planner report
    "basket_part_pairs",           # within-order co-occurrence self-join
    "embedding_pca_top_component", # one-pass Gram kernel + driver eigensolve
    "anomaly_mad_hourly_rates",    # median/MAD robust rate anomaly (integer-exact)
    "corpus_cluster_diversity",    # kmeans occupancy Simpson/effective-clusters report
    "split_leakage_report",        # cross-split exact+LSH contamination audit
    "embedding_pq_codebook",       # PQ training, one shared kernel scan per round
    "ann_pq_adc",                  # compressed-domain ADC top-k (LUT projection)
    "ann_ivf_pq",                  # coarse cells + residual-PQ ADC (full IVFPQ shape)
    "ann_pq_recall_report",        # ADC recall@3 vs exact integer-L2 baseline
    "bpe_train_merges",            # iterative BPE trainer (argmax-and-rewrite loop)
    "dedup_fuzzy_levenshtein_sampled",  # sampled-key blocked edit-distance join
    "multimodal_jpeg_decode_stats",     # baseline JPEG huffman+IDCT decode
    "agg_distinct_users_kmv_sketch",    # mergeable KMV sketch, k-array shuffle only
    "pack_bpe_token_bins",              # BPE-token-budget packing (train→encode→pack)
    "multimodal_jpeg_color_decode_stats",  # 4:2:0 colour JPEG MCU-interleaved decode
    "multimodal_jpeg_progressive_decode_stats",  # SOF2 ten-scan progressive decode
    "matryoshka_truncation_recall",     # embedding-prefix truncation quality report
    "bpe_fertility_by_lang",            # tokens-per-word tokenizer equity metric
    "agg_kmv_set_jaccard",              # KMV sketch set algebra (union/Jaccard)
    "dedup_repeated_ngram_spans",       # cross-doc repeated-substring span report
    "dedup_simhash_hamming",            # blocked Manku Hamming-ball pair search
    "ann_binary_hamming_topk",          # sign-bit binary embeddings, popcount top-k
    "dedup_image_dhash",                # PNG decode → 9x8 gradient hash dedup
    "privacy_k_anonymity_report",       # quasi-identifier class-size audit
    "wordpiece_train_merges",           # likelihood-argmax tokenizer trainer
    "wordpiece_encode_stats",           # WordPiece-table encode kernel
    "privacy_l_diversity_report",       # homogeneity-attack audit
    "privacy_t_closeness_report",       # skewness-attack TVD audit
    "dedup_audio_energy_fp",            # WAV decode → energy-contour dedup
    "dedup_video_frame_signature",      # AVI demux → frame-checksum dedup
    "ann_binary_recall_report",         # sign-bit recall@5 vs exact cosine
    "dedup_simhash_components",         # Hamming pairs → clusters → canonical
]


def _run_paired_baseline(spec: str, head_timings: dict, head_total: float):
    """Run the baseline round's bench.py in a git worktree, in THIS
    window, and return per-query HEAD/baseline ratios.  ``spec`` is a
    commit-ish, or "1" to auto-resolve the latest driver round commit
    ("round N: verdict/...").  Returns None (with a stderr note) on any
    failure — a paired record must never take down the primary bench."""
    import subprocess

    try:
        if spec == "1":
            out = subprocess.run(
                ["git", "-C", REPO, "log", "--grep", "^round [0-9]*:",
                 "-n1", "--format=%H %s"],
                capture_output=True, text=True, check=True,
            ).stdout.strip()
            commit, msg = out.split(" ", 1)
            rnd = int(re.match(r"round (\d+):", msg).group(1))
        else:
            commit = subprocess.run(
                ["git", "-C", REPO, "rev-parse", spec],
                capture_output=True, text=True, check=True,
            ).stdout.strip()
            rnd = (_current_round() or 1) - 1
        short = commit[:8]
        wt = f"/tmp/bench_baseline_{short}"
        if os.path.isdir(wt):
            # A leftover worktree may be dirty (baseline runs write
            # artifacts into it) or even sitting at a different commit;
            # silently benching that would mis-attribute the baseline.
            # Verify HEAD and restore tracked files before reuse.
            at = subprocess.run(
                ["git", "-C", wt, "rev-parse", "HEAD"],
                capture_output=True, text=True,
            ).stdout.strip()
            dirty = subprocess.run(
                ["git", "-C", wt, "status", "--porcelain",
                 "--untracked-files=no"],
                capture_output=True, text=True,
            ).stdout.strip()
            if at != commit:
                subprocess.run(
                    ["git", "-C", wt, "checkout", "--detach", commit],
                    capture_output=True, text=True, check=True,
                )
            if dirty:
                subprocess.run(
                    ["git", "-C", wt, "checkout", "--", "."],
                    capture_output=True, text=True, check=True,
                )
        else:
            subprocess.run(
                ["git", "-C", REPO, "worktree", "add", "--detach", wt, commit],
                capture_output=True, text=True, check=True,
            )
        env = dict(os.environ)
        env["_SPARK_GRAFT_BENCH_IS_BASELINE"] = "1"
        env["SPARK_GRAFT_BENCH_RECORD"] = "0"
        env.pop("SPARK_GRAFT_BENCH_PAIRED", None)
        t0 = time.perf_counter()
        proc = subprocess.run(
            [sys.executable, "bench.py"], cwd=wt, env=env,
            capture_output=True, text=True, timeout=5400,
        )
        line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
        base = json.loads(line)
        base_q = base.get("queries", {})
        common = sorted(set(head_timings) & set(base_q))
        if not common:
            raise RuntimeError("no common queries with baseline bench")
        head_c = sum(head_timings[n] for n in common)
        base_c = sum(base_q[n] for n in common)
        return {
            "baseline_round": rnd,
            "baseline_commit": short,
            "n_common": len(common),
            "head_total_common": round(head_c, 3),
            "baseline_total_common": round(base_c, 3),
            "total_ratio_common": round(head_c / base_c, 3),
            "queries": {
                n: round(head_timings[n] / base_q[n], 2)
                for n in common if base_q[n]
            },
            "baseline_window_sec": round(time.perf_counter() - t0, 1),
        }
    except Exception as e:  # noqa: BLE001 — diagnostics only
        print(f"paired baseline failed: {e}", file=sys.stderr)
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)$", os.path.basename(sf_dir.rstrip("/")))
    sf = float(m.group(1)) if m else 0.1

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("hotdog-spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    # bench-only plans (no possible oracle — sketch estimates): timed here,
    # excluded from the driver contract by design
    from hotdog_spark.queries import bench_only_queries

    queries.update(bench_only_queries())
    # SPARK_GRAFT_BENCH_ONLY=a,b,c — re-bench just those headline queries
    # and MERGE into the existing local snapshot (totals recomputed over
    # the merged set); mirrors the scale-bench scripts.
    only = {n for n in os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").split(",") if n}

    # Warm-up: JVM/codegen init, package shipping, parquet footer reads,
    # and the executor Python-worker pool (pandas import per worker) —
    # one-time session costs that would otherwise land on the first timed
    # query instead of the session as a whole.
    spark.range(100_000).selectExpr("sum(id)").write.mode("overwrite").format("noop").save()
    queries["hotdog_route_cascade"](spark, sf_dir).write.mode("overwrite").format("noop").save()
    # Python workers must warm AFTER ensure_shipped's addPyFile (inside the
    # query above) — adding a pyFile changes the worker env key and would
    # abandon any pool spawned earlier.
    from pyspark.sql.functions import pandas_udf

    _warm = pandas_udf(lambda s: s, "long")
    spark.range(10_000).repartition(int(cpus)).select(_warm("id")).write.mode(
        "overwrite"
    ).format("noop").save()

    # Median-of-N per query (default 3): single-shot timings on a shared
    # box are dominated by first-run effects (JIT, page cache, codegen
    # compile) — re-measuring showed 3x "regressions" that were pure
    # cold-start, and best-of-2 still left 1.1-1.26x wobble between
    # rounds on queries with no plan change.  The median of 3 is robust
    # to one outlier in EITHER direction, which min-of-2 is not.
    from statistics import median

    from hotdog_spark.operators import release_tracked_persists

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    # Measurement-bug fix (r12, VERDICT r11 item 3): this query's median-of-3
    # has cried wolf for two rounds (driver bench 1.51x, paired leg 2.5x,
    # c8 scaling ratio 0.28 — all ABA-refuted as noise): its ~1.2 s of
    # Python decode work is small enough that one host stall in 3 reps
    # moves the median.  Median-of-9 keeps the same timed action and the
    # same estimator, just more reps for THIS query; every other query's
    # methodology is unchanged.
    extra_runs = {"multimodal_audio_pcm_chunks": max(runs, 9)}
    timings: dict[str, float] = {}
    for name in [n for n in HEADLINE if n in only] if only else HEADLINE:
        fn = queries[name]
        samples = []
        for _ in range(extra_runs.get(name, runs)):
            start = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            samples.append(time.perf_counter() - start)
            # operators persist multi-consumer intermediates; release them
            # so query N+1's timing never rides query N's cached blocks
            # (and so a 42-query loop doesn't accumulate storage memory)
            release_tracked_persists()
        timings[name] = round(median(samples), 3)

    carry_paired = {}
    if only:
        cur_ = _current_round()
        snap = os.path.join(REPO, f"BENCH_LOCAL_r{cur_:02d}.json") if cur_ else None
        if snap and os.path.exists(snap):
            with open(snap) as f:
                prev_snap = json.load(f)
            merged = prev_snap.get("queries", {})
            merged.update(timings)
            timings = merged
            # a partial re-bench must not erase the full run's
            # paired-window record — carry it (and its provenance) over
            carry_paired = {
                k: v for k, v in prev_snap.items()
                if k.startswith("paired_ratio_vs_r")
            }
    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "headline_query_set_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_queries": len(timings),
        "runs_per_query": runs,
        # Round 5 methodology change, affecting round-over-round ratios:
        # (a) median-of-3 replaces best-of-2 (medians sit above minima,
        # especially for sub-second queries); (b) operator-persisted
        # intermediates are RELEASED between runs — previously a query's
        # 2nd run could time against the 1st run's still-cached
        # signature/fingerprint tables, flattering exactly the dedup
        # family.  Ratios vs r4-and-earlier recordings therefore mix
        # real deltas with honest-measurement correction.
        "methodology": "median-of-N, tracked persists released per run",
    }
    prev = _prev_bench()
    if prev is not None:
        prev_name, prev_data = prev
        prev_q = prev_data.get("queries", {})
        payload["delta_vs_prev"] = {
            "baseline": prev_name,
            "total_ratio": round(total / prev_data["value"], 3)
            if prev_data.get("value")
            else None,
            "queries": {
                n: round(t / prev_q[n], 2)
                for n, t in timings.items()
                if prev_q.get(n)
            },
        }
    # PAIRED-WINDOW mode (VERDICT r6 item 4, the standard artifact): the
    # sandbox host drifts ~2x on identical code across a day
    # (BENCH_VARIANCE_r06.json), so cross-window round-over-round totals
    # are untrustworthy.  With SPARK_GRAFT_BENCH_PAIRED=1 (or =<commit>),
    # the PREVIOUS round's bench.py runs first in a git worktree, in THIS
    # same window, and the payload records per-query HEAD/baseline ratios
    # measured back-to-back — the only comparison the variance study
    # showed to be reliable.  delta_vs_prev (cross-window) stays for
    # continuity but the paired block is the one to read.
    payload.update(carry_paired)
    paired = os.environ.get("SPARK_GRAFT_BENCH_PAIRED", "")
    if paired and not os.environ.get("_SPARK_GRAFT_BENCH_IS_BASELINE"):
        block = _run_paired_baseline(paired, timings, total)
        if block is not None:
            payload[f"paired_ratio_vs_r{block.pop('baseline_round'):02d}"] = block
    # Always record the complete payload in-repo: the driver's BENCH_r{N}
    # capture keeps only the output tail, which has truncated the
    # per-query head in past rounds and silently re-based round-over-round
    # comparisons.  The local file is the durable full recording.
    cur = _current_round()
    if cur is not None and str(os.environ.get("SPARK_GRAFT_BENCH_RECORD", "1")) != "0":
        try:
            with open(os.path.join(REPO, f"BENCH_LOCAL_r{cur:02d}.json"), "w") as f:
                json.dump(payload, f, indent=1)
        except OSError:
            pass  # read-only checkout: BENCH_LOCAL is the durable recording
    # The printed machine line carries ONLY the driver contract
    # (metric/value/unit/queries/sf): the driver's capture keeps a bounded
    # output tail, and the r10 line — grown fat with delta_vs_prev and the
    # paired block — was truncated past parseability (BENCH_r10.json
    # `parsed: null`), costing that round its official round-over-round
    # comparison (VERDICT r11 item 2).  Everything else lives in
    # BENCH_LOCAL_r{N}.json above.
    machine = {k: payload[k] for k in ("metric", "value", "unit", "queries", "sf")}
    print(json.dumps(machine))
    spark.stop()


if __name__ == "__main__":
    main()
