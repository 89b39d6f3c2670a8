"""Plan-shape regression tests: the scale properties README promises
(pushdown, JVM-only hot paths, broadcasts, no nested-loop joins) asserted
against the actual physical plans, so a refactor that silently breaks one
fails CI rather than a 100 TB run."""

import sys

import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    import __spark_entry__ as mod

    return mod.queries()[name](spark, SF)._jdf.queryExecution().executedPlan().toString()


def test_q6_filters_reach_parquet(spark):
    plan = _plan(spark, "q6_forecast_revenue")
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1].split("]")[0]


def test_native_cascade_has_no_python(spark):
    """merge_mode=native keeps the whole rule cascade JVM-side."""
    plan = _plan(spark, "hotdog_route_payload")
    assert "EvalPython" not in plan  # no Arrow/Batch Python eval nodes


def test_exact_merge_uses_arrow_not_row_python(spark):
    plan = _plan(spark, "merge_exact_deep")
    assert "ArrowEvalPython" in plan        # vectorized
    assert "BatchEvalPython" not in plan    # never row-at-a-time


def test_dim_joins_broadcast(spark):
    plan = _plan(spark, "q5_regional_revenue")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_join_is_equi_join(spark):
    """The bucketed range join must never fall back to a nested loop."""
    plan = _plan(spark, "range_join_error_window_clicks")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_join_is_single_keyed_sort(spark):
    plan = _plan(spark, "asof_click_attribution")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the carry-forward window sorts within user_id partitions
    assert "WindowExec" in plan or "Window" in plan


def test_clean_corpus_is_one_scan(spark):
    """The composed pipeline must not re-scan documents per stage."""
    plan = _plan(spark, "text_clean_corpus_pipeline")
    assert plan.count("Scan parquet") == 1


def test_scans_prune_columns(spark):
    """Column pruning: q6 reads only the 4 columns it needs."""
    plan = _plan(spark, "q6_forecast_revenue")
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    for col in ("l_quantity", "l_extendedprice", "l_discount", "l_shipdate"):
        assert col in read
    for col in ("l_orderkey", "l_partkey", "l_returnflag", "l_tax"):
        assert col not in read


@pytest.fixture(autouse=True)
def _quiet(spark):
    spark.sparkContext.setLogLevel("ERROR")
    yield


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Bucketing both sides on the join key makes the sort-merge join
    co-located: zero Exchange nodes in the joined plan — the strategy the
    engine prescribes for repeated fact-fact joins at 100 TB."""
    import uuid

    from pyspark.sql import functions as F

    db = f"bck_{uuid.uuid4().hex[:8]}"
    spark.sql(f"CREATE DATABASE {db} LOCATION '{tmp_path}/wh'")
    # disable broadcast so the small test tables take the sort-merge path
    # that real fact-fact joins take
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(10_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("va")
        )
        b = spark.range(10_000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
        )
        for name, df in (("ta", a), ("tb", b)):
            (
                df.write.bucketBy(8, "k")
                .sortBy("k")
                .mode("overwrite")
                .saveAsTable(f"{db}.{name}")
            )
        joined = spark.table(f"{db}.ta").join(spark.table(f"{db}.tb"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle at all
        assert joined.count() == 10_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql(f"DROP DATABASE {db} CASCADE")


def test_runtime_bloom_filter_injected(spark, tmp_path):
    """With runtime bloom filters on (the engine's recommended large-scale
    conf), a selective dim filter injects a bloom_filter_agg semi-filter
    into the fact side — rows are pruned before the shuffle, the key
    scan-reduction lever when the dim filter is not broadcastable."""
    from pyspark.sql import functions as F

    spark.range(100_000).select(
        F.col("id").alias("k"), (F.col("id") % 100).alias("v")
    ).write.mode("overwrite").parquet(str(tmp_path / "fact"))
    spark.range(1_000).select(
        F.col("id").alias("k2"), (F.col("id") % 7).alias("w")
    ).write.mode("overwrite").parquet(str(tmp_path / "dim"))

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB"
        )
        fact = spark.read.parquet(str(tmp_path / "fact"))
        dim = spark.read.parquet(str(tmp_path / "dim")).filter(F.col("w") == 3)
        plan = (
            fact.join(dim, fact.k == dim.k2)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Writing partitionBy(event_type) then filtering on it must prune at
    planning time: the scan's PartitionFilters carries the predicate and
    only the matching directory is read — the layout the streaming parquet
    sink produces (partitionBy topic) and the reason topic filters are
    ~free at 100 TB."""
    from pyspark.sql import functions as F

    from hotdog_spark.sources.batch import table

    out = str(tmp_path / "by_type")
    table(spark, "/root/testdata/sf0.001", "events").write.partitionBy(
        "event_type"
    ).parquet(out)

    df = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the predicate must appear in PartitionFilters, not as a data Filter
    pf = [seg for seg in plan.split("PartitionFilters: [")[1:]]
    assert pf and "event_type" in pf[0].split("]")[0]
    n_click = df.count()
    assert n_click > 0
    # pruned scan reads exactly the one partition's rows
    total = spark.read.parquet(out).count()
    assert n_click < total


def test_q19_disjunction_pushes_both_sides(spark):
    """q19's OR-of-conjunction predicate spans the join, but Catalyst
    derives the single-side implications and pushes them into BOTH scans:
    the quantity-range disjunction reaches the lineitem scan and the
    brand/size disjunction reaches the part scan — neither side reads
    rows no branch could accept."""
    from hotdog_spark.queries.tpch_extra import q19_disjunctive_revenue

    plan = (
        q19_disjunctive_revenue(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    li_scan = next(ln for ln in scans if "lineitem" in ln)
    part_scan = next(ln for ln in scans if "part.parquet" in ln)
    assert "l_quantity" in li_scan.split("DataFilters:")[1]
    assert "p_brand" in part_scan.split("DataFilters:")[1]


def test_minhash_index_join_has_no_signature_shuffle(spark, tmp_path):
    """The materialized (bucketed) MinHash index makes the LSH candidate
    self-join co-located: no Exchange below the join, and the candidates
    match the direct (unmaterialized) path exactly."""
    import uuid

    from pyspark.sql import functions as F

    from hotdog_spark.operators.dedup import (
        lsh_pairs_from_index,
        materialize_minhash_index,
        minhash_lsh_pairs,
    )

    db = f"mh_{uuid.uuid4().hex[:8]}"
    spark.sql(f"CREATE DATABASE {db} LOCATION '{tmp_path}/wh'")
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        docs = spark.createDataFrame(
            [(i, f"alpha beta gamma delta {'x' if i % 3 else 'epsilon'} {i % 5}")
             for i in range(60)],
            ["doc_id", "text"],
        )
        materialize_minhash_index(
            docs, "text", "doc_id", f"{db}.sigs", bands=4, buckets=4
        )
        pairs = lsh_pairs_from_index(spark, f"{db}.sigs")
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        join_part = plan[plan.find("SortMergeJoin"):]
        # the only exchange allowed is for the final distinct(), above the join
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(band" not in plan
        expected = {
            (r.id_a, r.id_b)
            for r in minhash_lsh_pairs(docs, "text", "doc_id", bands=4).collect()
        }
        got = {(r.id_a, r.id_b) for r in pairs.collect()}
        assert got == expected and len(got) > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql(f"DROP DATABASE {db} CASCADE")


def test_winnowing_pairs_plan_shape(spark):
    """dedup_winnowing_pairs' scale discipline, asserted on the physical
    plan: (1) NO join ever touches the fingerprint stream — the pair
    pipeline is groupBy(fp) → map-side pair explosion from bounded
    id-lists, so the only joins in the plan are the per-doc size
    join-backs onto the tiny post-threshold result; (2) the hot-fp cap
    is a post-aggregate filter on the grouped list size (not a separate
    aggregate + anti-join); (3) no Generate-inferred filter re-evaluates
    the winnowing expression below the explode (the
    InferFiltersFromGenerate pathology — a regexp_replace appearing
    inside a Filter means the staged chain got inlined and per-row cost
    explodes k×positions-fold)."""
    from hotdog_spark.operators.textops import winnowing_pairs

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta eta theta {i % 7}")
         for i in range(40)],
        ["doc_id", "text"],
    )
    pairs = winnowing_pairs(docs, "text", "doc_id", k=12, w=4,
                            max_df=10, min_shared=2)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    saw_df_filter = False
    for line in plan.splitlines():
        stripped = line.strip().lstrip(":+- ")
        if "Join" in line:
            # the only fp-keyed join allowed is the eligibility
            # semi-filter against the COUNT aggregate — a join that
            # ships collected id-lists means pair generation regressed
            # to a list-carrying self-join
            assert "ids#" not in line, (
                "collected id-lists crossed a join:\n" + line[:500]
            )
        if stripped.startswith("Filter"):
            assert "regexp_replace" not in line, (
                "winnowing chain inlined into a Filter:\n" + line[:500]
            )
            # the cap must precede list collection: a post-collect
            # size(ids) filter means unbounded aggregation buffers
            assert "size(ids" not in line, (
                "hot-fp cap regressed to a post-collect_list filter:\n"
                + line[:500]
            )
            if "_df#" in line:
                saw_df_filter = True
    assert saw_df_filter, (
        "count-first hot-fingerprint cap (filter on _df) missing — "
        "collect_list would materialize unbounded lists:\n" + plan[:2000]
    )


def test_ivf_index_probe_prunes_partitions(spark, tmp_path):
    """A materialized IVF index (partitionBy cell) turns probing into a
    partition-pruned scan: PartitionFilters on `cell`, and the candidate
    set equals the unmaterialized assignment path."""
    from pyspark.sql import functions as F

    from hotdog_spark.operators.similarity import (
        _sorted_cells_expr,
        ivf_candidates_from_index,
        materialize_ivf_index,
        with_quantized,
    )

    vecs = spark.createDataFrame(
        [(i, [float(i % 7) + 1.0, float((i * 3) % 5) + 1.0]) for i in range(80)],
        ["vec_id", "embedding"],
    )
    path = str(tmp_path / "ivf_idx")
    cents = materialize_ivf_index(
        vecs, "embedding", "vec_id", path, centroid_filter=F.col("vid") < 3
    )
    assert len(cents) == 3
    probe_cells = [cents[0][0], cents[1][0]]
    cand = ivf_candidates_from_index(spark, path, probe_cells)
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters")[1][:120]
    # parity with the direct (unmaterialized) assignment
    base = with_quantized(vecs, "embedding", "vec_id")
    assigned = base.withColumn(
        "cell", F.element_at(_sorted_cells_expr(cents), 1).getField("cid")
    )
    expected = {r.vid for r in assigned.filter(F.col("cell").isin(probe_cells)).collect()}
    got = {r.vid for r in cand.collect()}
    assert got == expected and len(got) > 0


def test_aqe_splits_skewed_join(spark, tmp_path):
    """AQE skew-join handling is the engine's answer to hot keys when
    salting isn't configured: with skew thresholds scaled to the test
    data, the final adaptive plan marks the sort-merge join skew=true
    (runtime partition splitting) — the safety net under every big join
    at 100 TB."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "32",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # 95% of the fact rows share one key; dim side is uniform
        fact = spark.range(2_000_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(7)).otherwise(F.col("id") % 1000)
            .alias("k"),
            F.col("id").alias("v"),
        )
        dim = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        # no keyed operator above the join (that would veto skew splitting);
        # the post-join filter keeps the collected result tiny
        joined = fact.join(dim, "k").filter(F.col("v") % 997 == 0)
        rows = joined.collect()  # finalizes THIS df's adaptive plan
        assert len(rows) > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_importance_weights_model_joins_are_broadcast(spark):
    """DSIR scoring: both model joins (bucket counts) and the totals
    cross join must be broadcast — the corpus-side gram stream is never
    shuffled on a feature key, and no nested-loop join sneaks in for the
    1-row totals."""
    plan = _plan(spark, "curation_importance_weights")
    assert plan.count("BroadcastHashJoin") >= 1
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan  # totals ride a broadcast NL join


def test_image_ahash_dedup_has_no_pairwise_join(spark):
    """aHash dedup must be hash-group + join-back: no cartesian/nested
    loop anywhere, exactly the exact-dedup plan class."""
    plan = _plan(spark, "dedup_image_ahash")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_rollup_reaggregation_has_no_expand(spark):
    """agg_rollup_returnflag/agg_cube_priority_status are re-aggregated
    from the finest level: the Expand operator (which replicates every
    fact row once per grouping set) must be absent."""
    for name in ("agg_rollup_returnflag", "agg_cube_priority_status"):
        assert "Expand" not in _plan(spark, name), name


def test_inverted_index_search_prunes_partitions(spark, tmp_path):
    """A materialized inverted index (partitionBy token-hash bucket)
    turns term search into a partition-pruned scan — PartitionFilters on
    `bucket`, postings identical to the direct (unmaterialized)
    computation.  Completes the index-materialization family: MinHash
    (dedup), IVF (ANN), inverted (search)."""
    from pyspark.sql import functions as F

    from hotdog_spark.operators.dedup import normalized_tokens
    from hotdog_spark.operators.textops import (
        materialize_inverted_index,
        search_terms_from_index,
    )

    docs = spark.createDataFrame(
        [
            (1, "spark shuffles data across the cluster"),
            (2, "the cluster runs spark"),
            (3, "ducks like water"),
            (4, "spark spark spark"),
        ],
        ["doc_id", "text"],
    )
    path = str(tmp_path / "inv_idx")
    materialize_inverted_index(docs, "text", "doc_id", path, buckets=16)
    got_df = search_terms_from_index(spark, path, ["spark", "water"], buckets=16)
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "bucket" in plan.split("PartitionFilters")[1][:160]
    got = {(r.tok, r.id, r.tf) for r in got_df.collect()}
    direct = (
        docs.select(
            F.col("doc_id").alias("id"),
            F.explode(normalized_tokens(F.col("text"))).alias("tok"),
        )
        .filter(F.col("tok").isin(["spark", "water"]))
        .groupBy("tok", "id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    expected = {(r.tok, r.id, r.tf) for r in direct.collect()}
    assert got == expected
    assert ("spark", 4, 3) in got  # tf is a real term frequency


def test_pagerank_iterations_have_no_cartesian_or_python(spark):
    """Each Pregel iteration must stay an equi-join + hash aggregate:
    no nested-loop/cartesian anywhere, no Python eval nodes, and the
    per-iteration rank joins must be sort-merge or hash joins on the
    vertex id."""
    plan = _plan(spark, "graph_pagerank_lsh")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_stats_profile_scans_prune_to_key_columns(spark):
    """The join-key profiler reads two wide tables but needs ONE column
    from each — the scan must prune to exactly the key column."""
    plan = _plan(spark, "stats_join_key_profile")
    for scan_schema in [
        seg.split("ReadSchema:")[1].split("\n")[0]
        for seg in plan.split("FileScan parquet")[1:]
    ]:
        assert ("o_custkey" in scan_schema) ^ ("l_orderkey" in scan_schema)
        # no other column survives pruning
        assert scan_schema.count(":") <= 2  # struct<col:type>


def test_incremental_rollup_is_two_scans_two_aggs_no_python(spark):
    """Slice aggregation + merge must stay JVM-side hash aggregates;
    the cutoff filters must reach the parquet scan."""
    plan = _plan(spark, "incremental_hourly_event_rollup")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "PushedFilters: [IsNotNull(ts)" in plan or "PushedFilters: [" in plan


def test_seq_bigrams_single_window_then_hash_aggs(spark):
    """One user-keyed window sort computed ONCE (its three consumers —
    pair counts and the two margins — must read the persisted
    transition table, not recompute the window), margins broadcast
    back, no self-join of transition rows."""
    plan = _plan(spark, "seq_frequent_event_bigrams")
    assert plan.count("InMemoryTableScan") >= 3
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_mad_anomaly_hourly_is_persisted_single_corpus_scan(spark):
    """The raw event stream feeds ONE map-side-combinable aggregate;
    the four consumers (counts, median rank, deviations, final join)
    must read the persisted hourly table, never re-scan events.  The
    joins back are all broadcast (median/MAD are per-type scalars)."""
    plan = _plan(spark, "anomaly_mad_hourly_rates")
    # every hourly-table consumer reads the cache (FileScan strings also
    # appear NESTED inside each InMemoryRelation's description, so the
    # reliable signal is the InMemoryTableScan count, not FileScan's)
    assert plan.count("InMemoryTableScan") >= 4
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_split_leakage_split_is_inline_not_joined(spark):
    """Each pair side's split assignment is a pure md5 expression on
    the id already in the pair row — the plan must not join pairs back
    to a corpus-sized split table.  Since the round-10 bucket-group
    rewrite of minhash_lsh_pairs the LSH branch is JOIN-FREE, and since
    the r11 cap de-funneling the bucket cap is two-level SALTED
    aggregation (no Window at all: level 1 groups on (band, sig, salt)
    so a degenerate bucket spreads across tasks; level 2 re-groups on
    (band, sig) over ≤ SALT bounded partial rows)."""
    plan = _plan(spark, "split_leakage_report")
    assert "Join" not in plan
    assert "Window" not in plan      # the funnel shape must not return
    assert "CartesianProduct" not in plan
    # level-1 exchange carries the salt; level-2 re-keys on the bare
    # bucket — exactly one full-row exchange (salted) plus the bounded
    # partial-row exchange
    assert plan.count("Exchange hashpartitioning(band") == 2
    # the level-1 key includes the inline pmod(hash(id), SALT) salt —
    # Catalyst surfaces it as a _groupingexpression in the exchange key
    assert any(
        "Exchange hashpartitioning(band" in ln and "_groupingexpression" in ln
        for ln in plan.splitlines()
    )


def test_pq_codebook_single_kernel_scan_no_vector_shuffle(spark):
    """The PQ report pass is ONE Arrow kernel over the cached quantized
    corpus; the only exchange in the plan is the m·k-row partial
    aggregation — vectors themselves are never shuffled or joined."""
    plan = _plan(spark, "embedding_pq_codebook")
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
    assert "Join" not in plan
    # one InMemoryTableScan (the persisted quantized corpus feeding the
    # final kernel pass); the exchange below the final agg moves only
    # (subspace, code) partials
    assert plan.count("InMemoryTableScan") >= 1


def test_winsorize_is_persisted_scan_plus_clamped_agg(spark):
    """After the quantile scalars return, the final aggregate clamps
    inline: no join, no window, no Python in the output plan."""
    plan = _plan(spark, "winsorize_event_values")
    assert "Join" not in plan
    assert "Window" not in plan
    assert "EvalPython" not in plan


def test_cluster_diversity_report_has_no_corpus_shuffle_joins(spark):
    """Occupancy report = map-side k-means assignment + two tiny
    aggregates; no join anywhere in the plan."""
    plan = _plan(spark, "corpus_cluster_diversity")
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_pq_adc_scoring_is_projection_plus_topk_window(spark):
    """ADC scoring must be a pure projection over the cached codes
    table (probe LUTs are literals — no join against probes, no vector
    arithmetic) followed by the skinny top-k window."""
    plan = _plan(spark, "ann_pq_adc")
    assert "Join" not in plan
    assert "Window" in plan
    assert plan.count("InMemoryTableScan") >= 1


def test_ivf_pq_search_prunes_cells_and_has_no_joins(spark):
    """IVF-PQ search reads the cached (vid, cell, codes) table, keeps
    probed cells via a literal IN filter, and scores by literal-array
    lookups — no join anywhere; the only shuffle is the top-k window."""
    plan = _plan(spark, "ann_ivf_pq")
    assert "Join" not in plan
    assert "Window" in plan
    assert plan.count("InMemoryTableScan") >= 1
    assert "cell" in plan  # the cell filter survives into the plan


def test_bucketed_join_eliminates_both_exchanges(spark, tmp_path):
    """The 100 TB co-located-join strategy, proven at the plan level:
    two tables bucketed on the join key (DDL `CLUSTERED BY ... INTO n
    BUCKETS` — what a production deployment would apply to its biggest
    recurring join) must sort-merge-join with ZERO Exchange operators,
    while the same data joined from plain parquet shuffles both sides.
    This is the evidence behind every 'bucket the fact tables' claim in
    PLANS.md: bucketing moves the shuffle from every query to a one-time
    write."""
    import uuid

    from pyspark.sql import functions as F

    db = f"bktest_{uuid.uuid4().hex[:8]}"
    warehouse = str(tmp_path / "wh")
    spark.sql(f"CREATE DATABASE {db} LOCATION '{warehouse}'")
    # fixture tables are broadcast-sized; disable broadcast so the plan
    # shows the co-located SMJ a 100 TB fact-fact join would use
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = spark.range(0, 20_000).select(
            F.col("id").alias("o_key"),
            (F.col("id") % 997).alias("o_val"),
        )
        items = spark.range(0, 60_000).select(
            (F.col("id") % 20_000).alias("l_key"),
            (F.col("id") % 31).alias("l_qty"),
        )
        orders.write.bucketBy(8, "o_key").sortBy("o_key").saveAsTable(
            f"{db}.orders_b", format="parquet", mode="overwrite"
        )
        items.write.bucketBy(8, "l_key").sortBy("l_key").saveAsTable(
            f"{db}.items_b", format="parquet", mode="overwrite"
        )
        joined = spark.table(f"{db}.orders_b").join(
            spark.table(f"{db}.items_b"),
            F.col("o_key") == F.col("l_key"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan  # co-located: zero shuffles
        # sanity: the same join over non-bucketed data DOES exchange
        orders.write.mode("overwrite").parquet(str(tmp_path / "o_plain"))
        items.write.mode("overwrite").parquet(str(tmp_path / "i_plain"))
        plain = spark.read.parquet(str(tmp_path / "o_plain")).join(
            spark.read.parquet(str(tmp_path / "i_plain")),
            F.col("o_key") == F.col("l_key"),
        ).filter(F.col("l_qty") >= 0)
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
        # and the bucketed join computes the right answer
        assert joined.count() == 60_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def _plan_audit_module():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "plan_audit", "/root/repo/scripts/plan_audit.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_plan_audit_single_task_python_subtree_aware(spark):
    """r10 ADVICE: the single-task-Python probe must inspect the Python
    node's OWN child subtree — an exchange in a join's sibling branch,
    or inside a BroadcastExchange build side, must not satisfy it."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    pa = _plan_audit_module()
    df = spark.range(100).withColumn("k", F.col("id") % 3)
    other = df.groupBy("k").count()

    def ident(it):
        yield from it

    def plan_of(frame):
        return frame._jdf.queryExecution().executedPlan().toString()

    # unexchanged Python feeding a join whose sibling branch shuffles
    bad_join = df.mapInPandas(ident, df.schema).join(other, "k")
    assert pa._single_task_python(plan_of(bad_join))

    # a BroadcastExchange below the Python node does not repartition it
    joined = df.join(broadcast(other), "k")
    bad_bcast = joined.mapInPandas(ident, joined.schema)
    assert pa._single_task_python(plan_of(bad_bcast))

    # fanned-out producer passes, with or without the broadcast join
    ok = df.repartition(4).mapInPandas(ident, df.schema)
    assert not pa._single_task_python(plan_of(ok))
    joined2 = df.repartition(4).join(broadcast(other), "k")
    ok2 = joined2.mapInPandas(ident, joined2.schema)
    assert not pa._single_task_python(plan_of(ok2))


def test_plan_audit_flags_global_window_over_raw_input(spark):
    """VERDICT r10 item 5: a partition-less Window over unaggregated
    input funnels every row through one sort task — the JVM twin of
    single-task Python.  Sanctioned shapes (partitioned windows, global
    windows over aggregated or top-k-limited input) pass."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    pa = _plan_audit_module()
    df = spark.range(100).withColumn("k", F.col("id") % 3)

    def plan_of(frame):
        return frame._jdf.queryExecution().executedPlan().toString()

    bad = df.withColumn("rn", F.row_number().over(Window.orderBy("id")))
    assert pa._global_window_unaggregated(plan_of(bad))

    keyed = df.withColumn(
        "rn", F.row_number().over(Window.partitionBy("k").orderBy("id"))
    )
    assert not pa._global_window_unaggregated(plan_of(keyed))

    over_agg = df.groupBy("k").count().withColumn(
        "rn", F.row_number().over(Window.orderBy("k"))
    )
    assert not pa._global_window_unaggregated(plan_of(over_agg))

    over_limit = df.limit(10).withColumn(
        "rn", F.row_number().over(Window.orderBy("id"))
    )
    assert not pa._global_window_unaggregated(plan_of(over_limit))
