"""Similarity search over embedding columns (array<float>).

Two paths, as a production vector pipeline would have:

* brute-force cosine top-k — the exactness baseline: broadcast the (small)
  probe set, score every corpus vector, per-probe top-k.  One shuffle on
  query_id.  At 100 TB this is the "rerank" stage, not the recall stage.
* LSH-bucketed ANN — sign-bucket on leading components (a fixed random
  hyperplane family degenerates to coordinate signs for a public,
  reproducible variant); candidates only within the probe's bucket, so the
  scored set shrinks by ~2^bits.  The scale path.

Determinism: embeddings are quantized to integers (round(double(x)*1000)) before
any arithmetic, so dot products and norms are exact integers in every
engine; the only float ops are a sqrt and a divide on identical inputs,
which IEEE 754 makes bit-identical.  Ranking ties break on vec_id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from hotdog_spark.operators import track_persist

from hotdog_spark.operators import fan_out


def quantized(col: Column, scale: int = 1000) -> Column:
    """array<float> → array<bigint> via round(x*scale): exact cross-engine."""
    # cast to double FIRST: float32 × int would round the product to a
    # float32 (e.g. 319.49999928· → 319.5f), landing exactly on a .5 tie
    # that double arithmetic never reaches — engines then disagree.
    return F.transform(
        col, lambda x: F.round(x.cast("double") * scale, 0).cast("bigint")
    )


def _dot(a: Column | str, b: Column | str) -> Column:
    # Py4J expression diet (r12, guide §7.3): building this HOF through
    # the Column API costs ~137 gateway round-trips per call (traced);
    # the parsed-SQL form costs 3 and resolves to the IDENTICAL
    # aggregate/zip_with tree (same exact bigint accumulator).  Pass
    # column names / SQL fragments where possible; Column inputs keep
    # the old path for expressions with no SQL-text form.
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(
            f"aggregate(zip_with({a}, {b}, (x, y) -> x * y),"
            f" CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        )
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def _norm2(a: Column | str) -> Column:
    if isinstance(a, str):
        return F.expr(
            f"aggregate(transform({a}, x -> x * x),"
            f" CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        )
    return F.aggregate(
        F.transform(a, lambda x: x * x),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def with_quantized(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    return fan_out(df).select(
        F.col(id_col).alias("vid"),
        quantized(F.col(vec_col)).alias("q"),
    ).withColumn("n2", _norm2("q"))


def cosine_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    probe_filter: Column,
    k: int = 5,
) -> DataFrame:
    """Brute-force cosine top-k for the probe subset against the corpus.
    Returns (query_id, neighbor_id, score, rank)."""
    base = with_quantized(df, vec_col, id_col)
    probes = base.filter(probe_filter).select(
        F.col("vid").alias("query_id"),
        F.col("q").alias("q_probe"),
        F.col("n2").alias("n2_probe"),
    )
    pairs = base.crossJoin(broadcast(probes)).filter(
        (F.col("vid") != F.col("query_id"))
        & (F.col("n2") > 0)
        & (F.col("n2_probe") > 0)
    )
    scored = pairs.select(
        "query_id",
        F.col("vid").alias("neighbor_id"),
        (
            _dot("q", "q_probe").cast("double")
            / F.sqrt((F.col("n2") * F.col("n2_probe")).cast("double"))
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def matryoshka_overlap(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    probe_filter: Column,
    k: int = 5,
    dims: tuple[int, ...] = (16, 32),
) -> DataFrame:
    """Matryoshka/truncation quality report (Kusupati et al. 2022,
    public): for each probe, how many of the FULL-dimension cosine
    top-k neighbours survive when embeddings are truncated to their
    first ``d`` components — the measurement behind the "can we store
    16 of the 64 dims?" compression decision an embedding pipeline
    makes before re-indexing a corpus.

    Returns (query_id, trunc_dim, k, n_overlap) with n_overlap ∈ [0,k].

    Scale shape: ONE corpus × broadcast-probes pass computes the full
    score AND every truncated score as extra projection columns
    (slicing an already-materialized quantized array is free relative
    to the scan), then one ranking window per scoring — all windows
    partition on query_id, so they ride a single exchange.  Output is
    probes × |dims| rows.  Determinism: integer dot/norms from the
    shared quantization; the double division + IEEE sqrt is the same
    proven-cross-engine scoring as cosine_topk; a truncated
    all-zero vector scores the sentinel -2.0 (below any cosine) so
    rank order never depends on engine NULL placement."""
    base = with_quantized(df, vec_col, id_col)
    probes = base.filter(probe_filter).select(
        F.col("vid").alias("query_id"),
        F.col("q").alias("q_probe"),
        F.col("n2").alias("n2_probe"),
    )
    pairs = base.crossJoin(broadcast(probes)).filter(
        (F.col("vid") != F.col("query_id"))
        & (F.col("n2") > 0)
        & (F.col("n2_probe") > 0)
    )

    def _score(qc: str, qp: str, n2c: Column, n2p: Column) -> Column:
        full = _dot(qc, qp).cast("double") / F.sqrt((n2c * n2p).cast("double"))
        return F.when((n2c == 0) | (n2p == 0), F.lit(-2.0)).otherwise(full)

    score_cols = [
        _score("q", "q_probe", F.col("n2"), F.col("n2_probe")).alias("s_full")
    ]
    for d in dims:
        qc, qp = f"slice(q, 1, {d})", f"slice(q_probe, 1, {d})"
        score_cols.append(
            _score(qc, qp, _norm2(qc), _norm2(qp)).alias(f"s_{d}")
        )
    scored = pairs.select(
        "query_id", F.col("vid").alias("neighbor_id"), *score_cols
    )

    # ONE pass ranks every scoring (r11, guide §2.4 "window functions
    # partitioned by the same key share one exchange"): all |dims|+1
    # row_number windows partition on query_id, so Catalyst plans a
    # single hash exchange followed by one sort per ordering — where the
    # previous shape re-derived the whole scan → quantize → broadcast
    # cross-join → score pipeline once per top-k leg and joined the legs
    # back together (measured: 44 Exchanges / 8 SortMergeJoins in the
    # registered query's plan; now 0 SortMergeJoins and the corpus is
    # scored exactly once).  The per-dim overlap |full ∩ trunc| needs no
    # join at all: on the ranked rows it is sum(r_full ≤ k AND r_d ≤ k)
    # per query — identical counts by construction.
    def _w(col: str):
        return Window.partitionBy("query_id").orderBy(
            F.col(col).desc(), F.col("neighbor_id")
        )

    ranked = scored.select(
        "query_id",
        F.row_number().over(_w("s_full")).alias("r_full"),
        *[F.row_number().over(_w(f"s_{d}")).alias(f"r_{d}") for d in dims],
    )
    counts = (
        ranked.filter(F.col("r_full") <= k)
        .groupBy("query_id")
        .agg(
            *[
                F.sum(
                    F.when(F.col(f"r_{d}") <= k, 1).otherwise(0)
                ).alias(f"n_{d}")
                for d in dims
            ]
        )
    )
    stack_expr = ", ".join(f"{d}, n_{d}" for d in dims)
    overlaps = counts.selectExpr(
        "query_id",
        f"stack({len(dims)}, {stack_expr}) AS (trunc_dim, n_overlap)",
    )
    spine = probes.select("query_id").select(
        "query_id",
        F.explode(F.array(*[F.lit(d) for d in dims])).alias("trunc_dim"),
    )
    # overlaps is ≤ probes·|dims| rows post-aggregation; size estimates
    # after an agg are unreliable (guide §3.1) so broadcast explicitly
    return (
        spine.join(broadcast(overlaps), ["query_id", "trunc_dim"], "left")
        .select(
            "query_id",
            F.col("trunc_dim").cast("int").alias("trunc_dim"),
            F.lit(k).cast("int").alias("k"),
            F.coalesce(F.col("n_overlap"), F.lit(0))
            .cast("bigint")
            .alias("n_overlap"),
        )
    )


def sign_bucket(qvec: Column, bits: int = 4) -> Column:
    """LSH bucket key: concatenated sign bits of the first ``bits``
    quantized components ('1' for ≥0, '0' for <0)."""
    return F.concat(
        *[
            F.when(F.element_at(qvec, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(bits)
        ]
    )


def _sql_int(v: int) -> str:
    """SQL literal text reproducing ``F.lit(int(v))`` exactly: Py4J maps a
    Python int to a Java int when it fits 32 bits (→ IntegerType) and to a
    long otherwise (→ LongType); unsuffixed SQL integral literals follow
    the same narrowing rule, so the parsed expression is type-identical."""
    v = int(v)
    return str(v) if -2147483648 <= v <= 2147483647 else f"{v}L"


def _lit_vec(values: list[int]) -> Column:
    # ONE parsed SQL expression instead of a Py4J round-trip per element:
    # the F.array-of-F.lit form costs len(values) JVM calls (8 centroids ×
    # 64 dims = 512 calls per trainer call site; an ann_ivf_pq build
    # measured 1714 lit() calls and ~2.4 s of pure driver-side expression
    # construction, r12 probe) — guide §7.3's single-threaded-driver class.
    return F.expr("array(" + ",".join(_sql_int(v) for v in values) + ")")


def _lit_vec_sql(values: list[int]) -> str:
    """The SQL text of :func:`_lit_vec`, for embedding in larger
    one-parse expressions."""
    return "array(" + ",".join(_sql_int(v) for v in values) + ")"


def _centroid_rows(
    base: DataFrame,
    centroid_filter: Column | None,
    centroids: list[tuple[int, list[int]]] | None,
) -> list[tuple[int, list[int], int]]:
    """(cell_id, quantized_vector, |c|²) triples — the tiny trained model,
    collected to the driver and inlined as literals."""
    if centroids is not None:
        # externally trained model (e.g. kmeans_quantized output)
        return [(cid, qc, sum(int(x) * int(x) for x in qc)) for cid, qc in centroids]
    return [
        (r["vid"], r["q"], r["n2"]) for r in base.filter(centroid_filter).collect()
    ]


def _dot_lit(q: Column, qc: list[int]) -> Column:
    """Dot product of an array column against a LITERAL vector as an
    explicit element_at sum — a flat whole-stage-codegen expression.
    The ``zip_with + aggregate`` form (:func:`_dot`) is a higher-order
    function Catalyst interprets per element; with 8 centroids × 64
    dims × 200 k rows that interpretation measured 80+ s at sf10, vs
    single-digit seconds for the expanded sum.  Only valid for literal
    vectors (the expansion is per-component)."""
    terms = [
        F.element_at(q, i + 1) * F.lit(int(c))
        for i, c in enumerate(qc)
        if int(c) != 0
    ]
    if not terms:
        return F.lit(0).cast("bigint")
    acc = terms[0]
    for t in terms[1:]:
        acc = acc + t
    return acc


def _sorted_cells_expr(cents: list[tuple[int, list[int], int]]) -> Column:
    """Array of (d², cell_id) structs sorted nearest-first, evaluated per
    row against the (q, n2) columns: cell assignment as a pure projection.

    Built as ONE parsed SQL expression (r12): the per-struct Column DSL
    form cost ~8 Py4J calls per centroid plus one per literal component —
    pure driver time (guide §7.3).  The parsed tree is node-identical:
    HOF _dot, not the literal-expanded sum, because the dot form measured
    FASTER for small centroid counts (1.6 s vs 3.7 s at sf10/8 cells),
    and the consumer must STAGE this expression through a column —
    un-staged re-inlining, not the dot form, was ann_ivf's sf10 blow-up
    (see ivf_topk)."""

    def dist2_sql(qc: list[int], n2c: int) -> str:
        # |v - c|^2 = n2(v) + n2(c) - 2·v·c, all bigint-exact (the
        # aggregate/zip_with text mirrors _dot exactly).
        return (
            f"n2 + {_sql_int(n2c)} - 2 * aggregate(zip_with(q, "
            f"{_lit_vec_sql(qc)}, (x, y) -> x * y), CAST(0 AS BIGINT), "
            "(acc, x) -> acc + x)"
        )

    structs = ",".join(
        f"named_struct('d2', {dist2_sql(qc, n2c)}, 'cid', {_sql_int(cid)})"
        for cid, qc, n2c in cents
    )
    return F.expr(f"array_sort(array({structs}))")


def materialize_ivf_index(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    path: str,
    centroid_filter: Column | None = None,
    centroids: list[tuple[int, list[int]]] | None = None,
) -> list[tuple[int, list[int], int]]:
    """Materialize IVF cell assignments partitioned by cell — the ANN
    counterpart of ``materialize_minhash_index``: every later probe scans
    only its ``nprobe`` cell directories (parquet partition pruning,
    asserted in tests/test_plans.py), not the corpus.

    Returns the centroid triples so probes rank cells with the exact
    model that built the index.
    """
    base = with_quantized(df, vec_col, id_col)
    cents = _centroid_rows(base, centroid_filter, centroids)
    cells = _sorted_cells_expr(cents)
    assigned = base.withColumn("cell", F.element_at(cells, 1).getField("cid"))
    assigned.write.partitionBy("cell").mode("overwrite").parquet(path)
    return cents


def ivf_candidates_from_index(spark, path: str, cells: list[int]) -> DataFrame:
    """Candidate vectors for a probe from a materialized IVF index: a
    scan with ``cell IN (…)`` that prunes to the probed partitions."""
    idx = spark.read.parquet(path)
    return idx.filter(idx.cell.isin([int(c) for c in cells]))


def ivf_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    centroid_filter: Column | None = None,
    probe_filter: Column | None = None,
    k: int = 3,
    nprobe: int = 2,
    centroids: list[tuple[int, list[int]]] | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN: assign every vector to its nearest centroid
    cell, then search only the probe's ``nprobe`` nearest cells.

    The centroid set is collected to the driver (it is a small trained
    model — k rows) and inlined as literal arrays, so cell assignment is a
    pure per-row projection: **no shuffle, no join** touches the corpus
    until the final pruned candidate scan.  That is the property that
    makes IVF the 100 TB path — the corpus-side work is one map stage plus
    a join against a broadcast probe set, and with the corpus pre-written
    partitioned-by-cell even the candidate filter becomes partition
    pruning.

    Centroids here are designated corpus vectors (``centroid_filter``) so
    the whole operator is deterministic and oracle-checkable; a production
    deployment would plug k-means centroids in the same shape.

    Distances are squared-L2 over quantized integers (exact); ties break
    on centroid id, then neighbor id.  Returns (query_id, neighbor_id,
    cell, score, rank).
    """
    base = with_quantized(df, vec_col, id_col)
    cents = _centroid_rows(base, centroid_filter, centroids)
    cells = _sorted_cells_expr(cents)
    # STAGE the sorted-cells expression through a column (select from
    # `staged`, never re-derive from the raw expression): without the
    # barrier Catalyst re-inlines the full 8-struct × 64-term distance
    # array into every downstream consumer — the probe explode, the
    # join condition, the scoring projection — re-evaluating it
    # per-candidate-pair instead of per-row (sf10 measured ann_ivf at
    # 80+ s with 2-4 s of real assignment work; same pathology the
    # winnowing chain pinned for InferFiltersFromGenerate).
    staged = base.withColumn("_cells", cells)
    # COALESCE makes `cell` non-nullable: the equi-join downstream would
    # otherwise infer isnotnull(cell) (InferFiltersFromConstraints) and
    # push it below fan_out's exchange INTO THE SCAN, inlining the full
    # 8-struct × 64-dim distance array into a per-row Filter — measured
    # at sf10 as 93 s of single-task CPU (the scan side had one row
    # group) against 2-4 s of real assignment work.  element_at over the
    # non-empty literal centroid array never IS null, so the fallback
    # value is unreachable; it exists only to change the nullability bit.
    assigned = staged.select(
        "vid", "q", "n2",
        F.coalesce(
            F.element_at("_cells", 1).getField("cid"), F.lit(-1)
        ).alias("cell"),
    )

    probes = (
        staged.filter(probe_filter)
        .select(
            F.col("vid").alias("query_id"),
            F.col("q").alias("q_probe"),
            F.col("n2").alias("n2_probe"),
            F.explode_outer(
                F.transform(
                    F.slice("_cells", 1, nprobe), lambda s: s.getField("cid")
                )
            ).alias("pcell"),
        )
        .filter(F.col("pcell").isNotNull())
    )
    pairs = assigned.join(
        broadcast(probes), F.col("cell") == F.col("pcell")
    ).filter(
        (F.col("vid") != F.col("query_id"))
        & (F.col("n2") > 0)
        & (F.col("n2_probe") > 0)
    )
    scored = pairs.select(
        "query_id",
        F.col("vid").alias("neighbor_id"),
        "cell",
        (
            _dot("q", "q_probe").cast("double")
            / F.sqrt((F.col("n2") * F.col("n2_probe")).cast("double"))
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def knn_graph(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    centroid_filter: Column | None = None,
    k: int = 3,
    nprobe: int = 2,
    centroids: list[tuple[int, list[int]]] | None = None,
    literal_cells_max: int = 16,
) -> DataFrame:
    """Approximate k-NN GRAPH: every vector's top-k neighbors, via
    IVF-cell blocking — the all-nodes counterpart of :func:`ivf_topk`.

    ``ivf_topk`` broadcasts its probe set; that is right for a handful of
    queries but wrong when EVERY vector is a probe (the broadcast would
    be the corpus).  Here both sides stay distributed: vectors are
    assigned to their nearest centroid cell (pure projection — centroid
    literals, no shuffle), the probe side explodes to its ``nprobe``
    nearest cells, and the candidate join is a hash-partitioned
    EQUI-JOIN ON THE CELL KEY — one shuffle per side keyed by cell,
    AQE skew-split handling hot cells.  That is the 100 TB knn-graph
    shape (the same join layout FAISS-on-Spark pipelines use for bulk
    graph construction); exact brute force would be n² and is
    deliberately not offered for all nodes.

    CELL-COUNT SCALING IS THE LOAD-BEARING PARAMETER: pair volume is
    Σ cell² ≈ n²·nprobe/C, so with a FIXED cell count C the graph build
    is quadratic in corpus size — the sf1 stress run measured exactly
    that (2.8 s → 47 s with 1.3 GB of spill for 10× rows at C=8).
    Callers must grow C ∝ n to keep cell size (and per-probe candidate
    count) constant, which makes total pairs LINEAR in n; the registered
    query derives C = clamp(n/250, 8, 256) from a corpus count.

    Cell assignment is HYBRID on C: up to 16 cells the centroid-literal
    projection assigns in the scan (no assignment shuffle — ivf_topk's
    path); beyond that, a BROADCAST CENTROID TABLE with cross-join +
    per-vector rank window — at C=80 the literal-array expression was a
    codegen blow-up (the sf1 re-measure got SLOWER, 86 s), while the
    table path does the same math as ordinary columnar rows (n×C skinny
    rows, one window shuffle on vid).  Beyond C ≈ O(10³) a production
    build adds a coarse quantizer so assignment never materializes n×C.

    Returns (query_id, neighbor_id, score, rank) — the adjacency list of
    the cosine graph, rank 1..k per node.
    """
    base = with_quantized(df, vec_col, id_col)
    cents = _centroid_rows(base, centroid_filter, centroids)
    if len(cents) <= literal_cells_max:
        # few cells: the literal-array expression assigns cells in the
        # scan projection, no assignment shuffle at all (ivf_topk's path)
        cells = _sorted_cells_expr(cents)
        staged = base.withColumn("_cells", cells)
        # coalesce: non-nullable cell, so the cell-keyed join infers no
        # isnotnull filter to push below the exchange (see ivf_topk)
        assigned = staged.select(
            "vid", "q", "n2",
            F.coalesce(
                F.element_at("_cells", 1).getField("cid"), F.lit(-1)
            ).alias("cell"),
        )
        # explode_OUTER: an inner explode lets InferFiltersFromGenerate
        # push a size() filter that re-inlines the staged cells expression
        # (see operators/textops.py winnowing for the measured pathology)
        probes = staged.select(
            F.col("vid").alias("query_id"),
            F.col("q").alias("q_probe"),
            F.col("n2").alias("n2_probe"),
            F.explode_outer(
                F.transform(
                    F.slice("_cells", 1, nprobe), lambda s: s.getField("cid")
                )
            ).alias("pcell"),
        ).filter(F.col("pcell").isNotNull())
    else:
        cents_df = df.sparkSession.createDataFrame(
            [(int(cid), [int(x) for x in qc], int(n2c)) for cid, qc, n2c in cents],
            "cid long, qc array<bigint>, n2c long",
        )
        d = base.crossJoin(broadcast(cents_df)).withColumn(
            "d2", F.col("n2") + F.col("n2c") - F.lit(2) * _dot("q", "qc")
        )
        wv = Window.partitionBy("vid").orderBy("d2", "cid")
        # persist: ranked feeds both the assignment and the probe side —
        # without it the n×C cross-join + window shuffle runs twice
        ranked = d.select("vid", "q", "n2", "cid", "d2").withColumn(
            "rn", F.row_number().over(wv)
        )
        ranked = track_persist(ranked)
        assigned = ranked.filter(F.col("rn") == 1).select(
            "vid", "q", "n2", F.col("cid").alias("cell")
        )
        probes = ranked.filter(F.col("rn") <= nprobe).select(
            F.col("vid").alias("query_id"),
            F.col("q").alias("q_probe"),
            F.col("n2").alias("n2_probe"),
            F.col("cid").alias("pcell"),
        )
    # deliberately NOT broadcast: both sides shuffle once, keyed by cell
    pairs = assigned.join(probes, F.col("cell") == F.col("pcell")).filter(
        (F.col("vid") != F.col("query_id"))
        & (F.col("n2") > 0)
        & (F.col("n2_probe") > 0)
    )
    scored = pairs.select(
        "query_id",
        F.col("vid").alias("neighbor_id"),
        (
            _dot("q", "q_probe").cast("double")
            / F.sqrt((F.col("n2") * F.col("n2_probe")).cast("double"))
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def knn_graph_cells(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    centroid_filter: Column | None = None,
    k: int = 3,
    nprobe: int = 2,
    centroids: list[tuple[int, list[int]]] | None = None,
    label_col: str | None = None,
) -> DataFrame:
    """k-NN graph via per-cell Arrow-batched matrix scoring — the fast
    twin of :func:`knn_graph`, bit-identical output.

    With ``label_col`` set, candidates sharing the probe's label are
    excluded and the output carries (query_label, neighbor_label) — the
    HARD-NEGATIVE MINING variant for contrastive training (per anchor,
    the most-similar vectors of a DIFFERENT class; cf. the in-batch /
    ANN-mined negatives of DPR, Karpukhin et al. 2020).  Same plan, same
    cost: the label constraint is a per-cell numpy mask.

    The join formulation (:func:`knn_graph`) is shuffle-shaped right but
    pays twice elsewhere: every candidate pair evaluates a 64-term
    higher-order-function dot product (zip_with + aggregate lambdas are
    interpreted per element, ~10M pairs at sf1), and ALL pair rows flow
    into the global top-k window.  Here the per-pair work becomes one
    numpy matmul per cell and the window input shrinks from pair count
    to ≤ nprobe·k rows per query:

    1. cell assignment + probe-cell expansion in ONE Arrow-batched map
       stage against the broadcast centroid matrix (no n×C crossJoin, no
       assignment window — the d² argsort happens in the kernel);
    2. one shuffle, keyed by cell: members (role 0) + probes (role 1);
    3. per-cell ``applyInPandas``: P·Mᵀ in float64 BLAS — exact, because
       quantized dots are < 2⁵³ so every intermediate is an integer a
       double represents exactly (same bigint→double semantics as the
       codegen path); per-probe top-k with (score desc, id asc)
       tie-break via lexsort;
    4. global merge: a window over the ≤ nprobe·k surviving rows/query.

    100 TB posture: the shuffle is the same cell-keyed exchange as the
    join plan (n·(1+nprobe) vector rows, once), but a pandas group
    cannot be AQE-skew-split, so C must scale with n to bound cell size
    (the registered query derives C = clamp(n/250, 8, 256)); centroids
    ship in the task closure, fine to C ≈ O(10⁴) — beyond that add a
    coarse quantizer, as with :func:`knn_graph`."""
    import pandas as pd

    if label_col is None:
        base = with_quantized(df, vec_col, id_col)
    else:
        base = fan_out(df).select(
            F.col(id_col).alias("vid"),
            quantized(F.col(vec_col)).alias("q"),
            F.col(label_col).cast("long").alias("lbl"),
        ).withColumn("n2", _norm2("q"))
    cents = sorted(_centroid_rows(base, centroid_filter, centroids))
    cid_arr = [int(c[0]) for c in cents]
    cmat = [[int(x) for x in c[1]] for c in cents]
    n2c_arr = [int(c[2]) for c in cents]
    np_ = __import__("numpy")
    CID = np_.asarray(cid_arr, dtype=np_.int64)
    CM = np_.asarray(cmat, dtype=np_.float64)      # C × dim
    N2C = np_.asarray(n2c_arr, dtype=np_.int64)
    npb = int(nprobe)

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Q = np_.asarray([np_.asarray(v, dtype=np_.float64) for v in pdf["q"]])
            n2 = pdf["n2"].to_numpy(dtype=np_.int64)
            # d² = |v|² + |c|² − 2 v·c, all values < 2⁵³ ⇒ exact in f64
            d2 = n2[:, None] + N2C[None, :] - 2.0 * (Q @ CM.T)
            # ties break on cid: centroids are cid-sorted and argsort is
            # stable, so the first minimal column is the smallest cid
            order = np_.argsort(d2, axis=1, kind="stable")[:, :npb]
            out = {
                "cell": CID[order[:, 0]],
                "role": np_.zeros(len(pdf), dtype=np_.int32),
                "id": pdf["vid"].to_numpy(dtype=np_.int64),
                "q": pdf["q"],
                "n2": n2,
            }
            if label_col is not None:
                out["lbl"] = pdf["lbl"].to_numpy(dtype=np_.int64)
            member = pd.DataFrame(out)
            probe_parts = [member]
            for j in range(min(npb, order.shape[1])):
                part = {
                    "cell": CID[order[:, j]],
                    "role": np_.ones(len(pdf), dtype=np_.int32),
                    "id": out["id"],
                    "q": pdf["q"],
                    "n2": n2,
                }
                if label_col is not None:
                    part["lbl"] = out["lbl"]
                probe_parts.append(pd.DataFrame(part))
            yield pd.concat(probe_parts, ignore_index=True)

    tag_schema = "cell long, role int, id long, q array<bigint>, n2 long"
    if label_col is not None:
        tag_schema += ", lbl long"
    tagged = base.mapInPandas(assign, tag_schema)

    kk = int(k)

    with_labels = label_col is not None

    def score_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        m = pdf[(pdf["role"] == 0) & (pdf["n2"] > 0)]
        p = pdf[(pdf["role"] == 1) & (pdf["n2"] > 0)]
        empty = {
            "query_id": pd.Series(dtype="int64"),
            "neighbor_id": pd.Series(dtype="int64"),
            "score": pd.Series(dtype="float64"),
        }
        if with_labels:
            empty["query_label"] = pd.Series(dtype="int64")
            empty["neighbor_label"] = pd.Series(dtype="int64")
        if len(m) == 0 or len(p) == 0:
            return pd.DataFrame(empty)
        M = np_.asarray([np_.asarray(v, dtype=np_.float64) for v in m["q"]])
        P = np_.asarray([np_.asarray(v, dtype=np_.float64) for v in p["q"]])
        mid = m["id"].to_numpy(dtype=np_.int64)
        pid = p["id"].to_numpy(dtype=np_.int64)
        n2m = m["n2"].to_numpy(dtype=np_.int64)
        n2p = p["n2"].to_numpy(dtype=np_.int64)
        if with_labels:
            mlbl = m["lbl"].to_numpy(dtype=np_.int64)
            plbl = p["lbl"].to_numpy(dtype=np_.int64)
        dots = P @ M.T                              # exact: < 2⁵³
        # bigint product n2·n2p can exceed 2⁵³ — compute in int64
        # (exact to 2⁶³) THEN convert, replicating Spark's
        # (a*b).cast("double") rounding
        denom = np_.sqrt((n2p[:, None] * n2m[None, :]).astype(np_.float64))
        score = dots / denom
        qs, ns, ss, ql, nl = [], [], [], [], []
        for i in range(len(pid)):
            mask = mid != pid[i]
            if with_labels:
                mask &= mlbl != plbl[i]
            cand_ids = mid[mask]
            cand_sc = score[i][mask]
            if len(cand_ids) == 0:
                continue
            # (score desc, neighbor_id asc): lexsort is stable,
            # last key primary
            order = np_.lexsort((cand_ids, -cand_sc))[:kk]
            qs.extend([pid[i]] * len(order))
            ns.extend(cand_ids[order])
            ss.extend(cand_sc[order])
            if with_labels:
                ql.extend([plbl[i]] * len(order))
                nl.extend(mlbl[mask][order])
        out = {
            "query_id": np_.asarray(qs, dtype=np_.int64),
            "neighbor_id": np_.asarray(ns, dtype=np_.int64),
            "score": np_.asarray(ss, dtype=np_.float64),
        }
        if with_labels:
            out["query_label"] = np_.asarray(ql, dtype=np_.int64)
            out["neighbor_label"] = np_.asarray(nl, dtype=np_.int64)
        return pd.DataFrame(out)

    score_schema = "query_id long, neighbor_id long, score double"
    if with_labels:
        score_schema += ", query_label long, neighbor_label long"
    partial = tagged.groupBy("cell").applyInPandas(score_cell, score_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return partial.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= kk
    )


def near_dup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.99,
    bits: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: sign-bucket blocking, then
    exact cosine within each bucket, keep pairs ≥ threshold.

    The self-join is on the bucket key only, so the pair space shrinks
    from n² to Σ bucket², and the shuffle is one hash exchange per side on
    a short string key.  At 100 TB: raise ``bits`` (more, smaller buckets)
    and add multi-probe (flip one bit) to recover recall — same plan
    shape.  Mirrors the MinHash-LSH dedup pattern one modality over
    (operators/dedup.py).  Returns (id_a, id_b, score).
    """
    base = with_quantized(df, vec_col, id_col).withColumn(
        "bucket", sign_bucket(F.col("q"), bits)
    ).filter(F.col("n2") > 0)
    a = base.select(
        "bucket",
        F.col("vid").alias("id_a"),
        F.col("q").alias("q_a"),
        F.col("n2").alias("n2_a"),
    )
    b = base.select(
        "bucket",
        F.col("vid").alias("id_b"),
        F.col("q").alias("q_b"),
        F.col("n2").alias("n2_b"),
    )
    pairs = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a",
        "id_b",
        (
            _dot("q_a", "q_b").cast("double")
            / F.sqrt((F.col("n2_a") * F.col("n2_b")).cast("double"))
        ).alias("score"),
    ).filter(F.col("score") >= threshold)


def lsh_cosine_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    probe_filter: Column,
    k: int = 3,
    bits: int = 4,
) -> DataFrame:
    """Bucketed ANN: score only candidates sharing the probe's sign bucket.
    Returns (query_id, neighbor_id, bucket, score, rank)."""
    base = with_quantized(df, vec_col, id_col).withColumn(
        "bucket", sign_bucket(F.col("q"))
    )
    probes = base.filter(probe_filter).select(
        F.col("vid").alias("query_id"),
        F.col("q").alias("q_probe"),
        F.col("n2").alias("n2_probe"),
        F.col("bucket").alias("bucket_probe"),
    )
    pairs = base.join(
        broadcast(probes), F.col("bucket") == F.col("bucket_probe")
    ).filter(
        (F.col("vid") != F.col("query_id"))
        & (F.col("n2") > 0)
        & (F.col("n2_probe") > 0)
    )
    scored = pairs.select(
        "query_id",
        F.col("vid").alias("neighbor_id"),
        "bucket",
        (
            _dot("q", "q_probe").cast("double")
            / F.sqrt((F.col("n2") * F.col("n2_probe")).cast("double"))
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def kmeans_quantized(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    iters: int = 3,
    base: DataFrame | None = None,
    init_rows: list | None = None,
) -> tuple[DataFrame, list[tuple[int, list[int]]]]:
    """Distributed Lloyd's k-means over quantized embeddings — the
    centroid trainer whose output plugs straight into ivf_topk (which
    documents exactly this hand-off).

    Deterministic by construction: init = the k lowest-id vectors (no
    RNG), all distances are squared-L2 over integer-quantized components,
    assignment ties break on centroid index, and updated centroids are
    re-quantized to integers (floor of the exact RATIONAL mean, computed
    with the pmod identity so no decimal rounding can drift it) each
    round.  Rerun- and partitioning-stable, therefore testable.

    Each iteration: assignment is a pure map-side projection against
    centroid literals (NO shuffle of the corpus — the same property that
    makes IVF the 100 TB path), then one groupBy(cluster) average whose
    output (k tiny rows) is collected as the next round's literals.  The
    corpus is scanned ``iters + 1`` times; nothing is ever shuffled by
    vector.

    Returns (assignments DataFrame (vid, cluster, d2), final centroids
    as [(cluster_id, quantized_vector), ...]).
    """
    from hotdog_spark.operators import track_persist

    # Persist the quantized working set once: every Lloyd iteration (and
    # the final assignment the caller consumes) re-reads it, so without
    # this the parquet scan + quantization re-runs iters+2 times.  Same
    # posture as MLlib's KMeans, which caches its input for exactly this
    # reason; at 100 TB the cache is MEMORY_AND_DISK per-partition and
    # the alternative is iters+2 full corpus re-scans.  Callers that
    # already hold a persisted (vid, q, n2) table pass it as ``base`` so
    # the derivation (and its cache) exists exactly once per query
    # (r10 verdict item 3: the IVF-PQ recall pair derived it thrice).
    if base is None:
        base = track_persist(with_quantized(df, vec_col, id_col))
    # ``init_rows``: the k lowest-vid (vid, q) rows, when the caller
    # already collected them in a shared driver job (r11, guide §1.2 —
    # IVF-PQ fuses this with its probe collect); client-side sort by vid
    # reproduces the orderBy exactly (vid is unique).
    if init_rows is None:
        init_rows = base.orderBy("vid").limit(k).collect()
    init_rows = sorted(init_rows, key=lambda r: r["vid"])[:k]
    cents = [(i, list(r["q"])) for i, r in enumerate(init_rows)]

    def assign(cent_list):
        # argmin over k centroid literals: array_sort of (d2, cid) structs.
        # ONE parsed SQL expression (r12, guide §7.3): the Column-DSL form
        # cost k × (dim + ~6) Py4J round-trips of pure driver time; the
        # text below mirrors _norm2(zip_with(q, lit_vec, x - y)) node for
        # node, so the expression tree (and every integer) is unchanged.
        structs = ",".join(
            "named_struct('d2', aggregate(transform(zip_with(q, "
            f"{_lit_vec_sql(qc)}, (x, y) -> x - y), x -> x * x), "
            "CAST(0 AS BIGINT), (acc, x) -> acc + x), "
            f"'cid', {_sql_int(cid)})"
            for cid, qc in cent_list
        )
        cells = F.expr(f"array_sort(array({structs}))")
        best = F.element_at(cells, 1)
        return base.select(
            "vid",
            "q",
            best.getField("cid").alias("cluster"),
            best.getField("d2").alias("d2"),
        )

    dim = len(cents[0][1])
    for _ in range(iters):
        # One Lloyd step's sufficient statistics (per-cluster component
        # sums + counts) from ONE Arrow-batched kernel pass over the
        # cached working set: each partition emits ≤ k rows of
        # (cluster, n, sum-vector), so the collect is O(partitions · k)
        # regardless of data size — strictly smaller than the previous
        # posexplode → groupBy(cluster, dim) form, which shuffled
        # n·dim cells and re-codegen'd an 8×64 expression argmin every
        # iteration (measured 4.2 s for 3 iterations at sf0.1; the
        # kernel form is ~3× faster and its per-iteration driver state
        # is identical).  numpy int64 is exact here: |q| ≤ ~scale
        # (=1000) so q·c products are ≤ dim·scale² ≈ 6.4e7 and a
        # partition's component sum is bounded by scale · partition
        # rows — overflow needs 9e15 rows in ONE partition.
        cell_rows = _lloyd_cells_kernel(base, cents).collect()
        # new centroid = floor(exact rational mean) per component,
        # driver-side on exact Python ints: Python's // IS floor
        # division over arbitrary-precision integers, identical to the
        # pmod identity floor(s/n) = (s - pmod(s, n)) / n at every
        # magnitude — no decimal-scale cap, no HALF_UP drift.
        sums: dict[int, list[int]] = {}
        counts: dict[int, int] = {}
        for r in cell_rows:
            acc = sums.setdefault(r["cluster"], [0] * dim)
            for j, v in enumerate(r["s"]):
                acc[j] += int(v)
            counts[r["cluster"]] = counts.get(r["cluster"], 0) + int(r["n"])
        by_cluster = {
            cid: [s // counts[cid] for s in svec] for cid, svec in sums.items()
        }
        # empty clusters keep their previous centroid
        cents = [(cid, by_cluster.get(cid, qc)) for cid, qc in cents]

    return assign(cents), cents


def _lloyd_cells_kernel(base: DataFrame, cents: list) -> DataFrame:
    """Map-side Lloyd sufficient statistics: assign each row to its
    nearest centroid (squared-L2 over exact int64, ties on lowest
    centroid id) and emit per-partition (cluster, n, component-sum)
    partials — ≤ k rows per partition, merged exactly on the driver.

    Tie-break parity with :func:`kmeans_quantized.assign`: the
    expression form sorts (d2, cid) structs, so ties go to the lowest
    cid; here ``np.argmin`` returns the first minimal index, and the
    centroid matrix rows are ordered by ascending cid (asserted), so
    both paths pick the same cluster.  The argmin itself drops the
    per-row |q|² constant: score(c) = |C_c|² − 2·q·C_c orders exactly
    like d2 (integer arithmetic, no rounding), including ties.
    """
    import numpy as np

    cids = [int(c) for c, _ in cents]
    assert cids == sorted(cids), "centroid list must be cid-ascending"
    C = np.asarray([qc for _, qc in cents], dtype=np.int64)
    k, d = C.shape
    cn2 = (C * C).sum(axis=1)

    def gen(batches):
        import pandas as pd

        sums = np.zeros((k, d), dtype=np.int64)
        counts = np.zeros(k, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            q = np.asarray(
                [np.asarray(v, dtype=np.int64) for v in pdf["q"]],
                dtype=np.int64,
            )
            best = np.argmin(cn2[None, :] - 2 * (q @ C.T), axis=1)
            for c in range(k):
                m = best == c
                if m.any():
                    sums[c] += q[m].sum(axis=0)
                    counts[c] += int(m.sum())
        keep = [c for c in range(k) if counts[c] > 0]
        yield pd.DataFrame(
            {
                "cluster": [cids[c] for c in keep],
                "n": [int(counts[c]) for c in keep],
                "s": [sums[c].tolist() for c in keep],
            }
        )

    return base.select("q").mapInPandas(
        gen, schema="cluster int, n bigint, s array<bigint>"
    )


def pq_train_stats(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
) -> DataFrame:
    """Product-quantization codebook training + corpus quantization
    report (public: Jégou et al. 2011, "Product Quantization for
    Nearest Neighbor Search").  The vector is split into ``m``
    contiguous subspaces; each subspace trains its OWN k-means codebook
    (deterministic lowest-vid init, same integer Lloyd rules as
    :func:`kmeans_quantized`), so a vector compresses to m small codes
    — the memory layer under IVF-PQ indexes, one level below the SQ8
    scalar quantizer already in `embedding_quantize_int8_report`.

    Scale shape — the reason this is one operator and not m calls to
    kmeans_quantized: every Lloyd round runs ONE Arrow kernel pass over
    the cached corpus computing all m subspace assignments and their
    per-code component sums together (each partition emits ≤ m·k
    partial rows), so the corpus is scanned ``iters + 2`` times TOTAL
    (init + iters + final report) instead of m·(iters + 2); nothing is
    ever shuffled by vector.  Driver state: m codebooks of k×(dim/m)
    ints.

    Determinism: quantized-integer distances, argmin ties on lowest
    code id, floor-of-exact-rational-mean re-quantization, empty codes
    keep their previous centroid — each subspace is bit-identical to a
    standalone kmeans_quantized on the sliced vector, which is exactly
    what the oracle unrolls.  ``k`` is the production dial (real PQ
    uses k=256/subspace; the registered query uses 8 on the synthetic
    corpus so every code stays populated).

    Returns (subspace, code, n_vectors, sum_d2): occupancy and exact
    integer reconstruction error per codeword — rows bounded by m·k.
    """
    books, base, sub = pq_train(df, vec_col, id_col, m=m, k=k, iters=iters)
    stats = _pq_partials_kernel(base, books, sub, want_sums=False)
    return stats.groupBy("subspace", "code").agg(
        F.sum("n").alias("n_vectors"), F.sum("sum_d2").alias("sum_d2")
    )


def pq_train(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    init_rows: list | None = None,
) -> tuple[list, DataFrame, int]:
    """Train the m per-subspace PQ codebooks (see :func:`pq_train_stats`
    for the algorithm and determinism contract).  Returns
    (books, base, sub): the codebooks as ``books[s] = [(code,
    centroid-int-list), ...]``, the persisted quantized corpus
    DataFrame (vid, q, n2), and the subspace width.  ``init_rows``:
    pre-collected k lowest-vid rows (see :func:`kmeans_quantized`)."""
    from hotdog_spark.operators import track_persist

    base = track_persist(with_quantized(df, vec_col, id_col))
    books, sub = _pq_train_books(base, m, k, iters, init_rows=init_rows)
    return books, base, sub


def _pq_train_books(
    base: DataFrame, m: int, k: int, iters: int, init_rows: list | None = None
) -> tuple[list, int]:
    """The PQ Lloyd loop over an already-quantized (vid, q) DataFrame —
    shared by :func:`pq_train` (raw vectors) and the IVF-PQ residual
    trainer (q = vector minus coarse centroid).  ``init_rows``: the k
    lowest-vid rows when the caller already collected them in a shared
    job; client-side sort reproduces the orderBy (vid unique)."""
    if init_rows is None:
        init_rows = base.orderBy("vid").limit(k).collect()
    init = sorted(init_rows, key=lambda r: r["vid"])[:k]
    full = [list(r["q"]) for r in init]
    dim = len(full[0])
    if dim % m:
        raise ValueError(f"pq_train: dim {dim} not divisible by m={m}")
    sub = dim // m
    books: list[list[tuple[int, list[int]]]] = [
        [(ci, full[ci][s * sub : (s + 1) * sub]) for ci in range(k)]
        for s in range(m)
    ]

    for _ in range(iters):
        rows = _pq_partials_kernel(base, books, sub, want_sums=True).collect()
        sums: dict[tuple[int, int], list[int]] = {}
        counts: dict[tuple[int, int], int] = {}
        for r in rows:
            key = (r["subspace"], r["code"])
            acc = sums.setdefault(key, [0] * sub)
            for j, v in enumerate(r["s"]):
                acc[j] += int(v)
            counts[key] = counts.get(key, 0) + int(r["n"])
        for s in range(m):
            books[s] = [
                (
                    ci,
                    [c // counts[(s, ci)] for c in sums[(s, ci)]]
                    if (s, ci) in counts
                    else cv,
                )
                for ci, cv in books[s]
            ]
    return books, sub


def pq_encode(
    base: DataFrame, books: list, sub: int, carry: tuple = ()
) -> DataFrame:
    """Encode each vector as its m PQ codes: one Arrow kernel pass over
    the (cached) quantized corpus emitting (vid, codes array<int>) —
    the compressed representation ADC search scores against.  Same
    assignment rules as training (exact int64 distances, ties on
    lowest code).  ``carry`` is extra (name, sql_type) columns passed
    through untouched (e.g. the IVF cell id)."""
    import numpy as np

    m = len(books)
    mats = [np.asarray([cv for _, cv in b], dtype=np.int64) for b in books]
    norms = [(C * C).sum(axis=1) for C in mats]
    carry_names = [c[0] for c in carry]

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            q = np.asarray(
                [np.asarray(v, dtype=np.int64) for v in pdf["q"]],
                dtype=np.int64,
            )
            codes = np.empty((len(q), m), dtype=np.int32)
            for s in range(m):
                qs = q[:, s * sub : (s + 1) * sub]
                codes[:, s] = np.argmin(
                    norms[s][None, :] - 2 * (qs @ mats[s].T), axis=1
                )
            out = {"vid": pdf["vid"].values, "codes": list(codes.tolist())}
            for c in carry_names:
                out[c] = pdf[c].values
            yield pd.DataFrame(out)

    schema = "vid bigint, codes array<int>" + "".join(
        f", {name} {typ}" for name, typ in carry
    )
    return base.select("vid", "q", *carry_names).mapInPandas(gen, schema=schema)


def pq_adc_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    probe_filter: Column,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    topk: int = 3,
) -> DataFrame:
    """PQ asymmetric-distance search (ADC — Jégou et al. 2011, public):
    score every corpus vector against each probe ENTIRELY in the
    compressed domain.  The probe precomputes one m×k lookup table of
    exact integer distances to every codeword; a corpus vector's
    approximate distance is then the SUM OF m TABLE LOOKUPS on its
    codes — no vector arithmetic per pair, which is why PQ search
    scans billions of codes per second in production ANN systems.

    Plan shape: codebooks train via the shared-scan kernel; the corpus
    is encoded once to (vid, m codes); probes (a driver-side handful)
    become LITERAL lookup arrays, so per-probe scoring is a pure
    projection — ``element_at(lut_s, code_s + 1)`` summed across
    subspaces, fanned out via one explode over the probe structs.  The
    only shuffle is the per-query top-k window on skinny (query,
    neighbor, d2) rows.  Everything stays exact int64, so ranking ties
    break deterministically on neighbor_id and both engines agree
    bit-for-bit.

    Returns (query_id, neighbor_id, adc_d2, rank), rank ≤ ``topk`` by
    ascending approximate distance.  adc_d2 is the ADC estimate (the
    rerank stage would re-score these few with exact distances — that
    exactness baseline is `ann_cosine_topk`)."""
    from hotdog_spark.operators import track_persist

    # ONE driver job collects BOTH the PQ k-means init and the probe
    # set off the shared cached base (r11, guide §1.2 — was two
    # sequential jobs; the union evaluates both subtrees in one action).
    base = track_persist(with_quantized(df, vec_col, id_col))
    seed_rows = (
        base.orderBy("vid")
        .limit(k)
        .select(F.lit(0).alias("_leg"), "vid", "q")
        .unionAll(
            base.filter(probe_filter).select(F.lit(1).alias("_leg"), "vid", "q")
        )
        .collect()
    )
    books, sub = _pq_train_books(
        base, m, k, iters,
        init_rows=[r for r in seed_rows if r["_leg"] == 0],
    )
    enc = track_persist(pq_encode(base, books, sub))
    probes = [r for r in seed_rows if r["_leg"] == 1]
    if not probes:
        # zero probes would make explode(array()) invalid — the correct
        # answer is simply no result rows
        return df.sparkSession.createDataFrame(
            [], "query_id bigint, neighbor_id bigint, adc_d2 bigint, rank int"
        )

    # Per-probe LUT scoring built as ONE parsed SQL expression per probe
    # (r12, guide §7.3): the DSL form cost m × (k + 3) Py4J calls per
    # probe of pure driver time; the text mirrors the element_at(array,
    # codes[s] + 1) sum node for node.
    structs = []
    for p in sorted(probes, key=lambda r: r["vid"]):
        pq_vec = list(p["q"])
        terms = []
        for s in range(len(books)):
            ps = pq_vec[s * sub : (s + 1) * sub]
            lut = [
                sum((a - b) * (a - b) for a, b in zip(ps, cv))
                for _, cv in books[s]
            ]
            terms.append(
                "element_at(array("
                + ",".join(_sql_int(v) for v in lut)
                + f"), codes[{s}] + 1)"
            )
        structs.append(
            F.expr(
                f"named_struct('query_id', {_sql_int(p['vid'])}, "
                f"'adc_d2', CAST({' + '.join(terms)} AS BIGINT))"
            )
        )
    fanned = (
        enc.select(
            F.col("vid").alias("neighbor_id"),
            F.explode(F.array(*structs)).alias("e"),
        )
        .select("e.query_id", "neighbor_id", "e.adc_d2")
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_d2", "neighbor_id")
    return fanned.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= topk
    )


def _pq_partials_kernel(
    base: DataFrame, books: list, sub: int, want_sums: bool
) -> DataFrame:
    """One shared corpus pass for all m subspaces: per partition, per
    subspace, assign rows to their nearest codeword (exact int64
    squared-L2, ties on lowest code) and emit either component-sum
    partials (training: ≤ m·k rows of (subspace, code, n, sum-vector))
    or distance partials (report: (subspace, code, n, sum_d2)).  Same
    exactness envelope as :func:`_lloyd_cells_kernel`."""
    import numpy as np

    m = len(books)
    mats, norms = [], []
    for s in range(m):
        cids = [int(c) for c, _ in books[s]]
        assert cids == sorted(cids), "codebook must be code-ascending"
        C = np.asarray([cv for _, cv in books[s]], dtype=np.int64)
        mats.append(C)
        norms.append((C * C).sum(axis=1))
    k = mats[0].shape[0]

    def gen(batches):
        import pandas as pd

        sums = np.zeros((m, k, sub), dtype=np.int64)
        d2s = np.zeros((m, k), dtype=np.int64)
        counts = np.zeros((m, k), dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            q = np.asarray(
                [np.asarray(v, dtype=np.int64) for v in pdf["q"]],
                dtype=np.int64,
            )
            for s in range(m):
                qs = q[:, s * sub : (s + 1) * sub]
                scores = norms[s][None, :] - 2 * (qs @ mats[s].T)
                best = np.argmin(scores, axis=1)
                if not want_sums:
                    row_d2 = (
                        scores[np.arange(len(qs)), best] + (qs * qs).sum(axis=1)
                    )
                for c in range(k):
                    msk = best == c
                    if msk.any():
                        counts[s, c] += int(msk.sum())
                        if want_sums:
                            sums[s, c] += qs[msk].sum(axis=0)
                        else:
                            d2s[s, c] += int(row_d2[msk].sum())
        out = {"subspace": [], "code": [], "n": []}
        out["s" if want_sums else "sum_d2"] = []
        val_key = "s" if want_sums else "sum_d2"
        for s in range(m):
            for c in range(k):
                if counts[s, c] > 0:
                    out["subspace"].append(s)
                    out["code"].append(c)
                    out["n"].append(int(counts[s, c]))
                    out[val_key].append(
                        sums[s, c].tolist() if want_sums else int(d2s[s, c])
                    )
        yield pd.DataFrame(out)

    schema = (
        "subspace int, code int, n bigint, s array<bigint>"
        if want_sums
        else "subspace int, code int, n bigint, sum_d2 bigint"
    )
    return base.select("q").mapInPandas(gen, schema=schema)


def ivf_pq_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    probe_filter: Column,
    cells: int = 8,
    coarse_iters: int = 2,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    nprobe: int = 2,
    topk: int = 3,
    base: DataFrame | None = None,
) -> DataFrame:
    """The full IVF-PQ index shape (Jégou et al. 2011 / FAISS IVFPQ,
    public): coarse k-means partitions the corpus into ``cells``
    inverted lists; each vector stores only its cell id and the m PQ
    codes of its RESIDUAL (vector minus cell centroid — residual
    codebooks carry far more precision than raw-vector ones at the
    same bits, the paper's key trick); a probe visits its ``nprobe``
    nearest cells and scores their members by ADC lookups against
    per-(probe, cell) residual LUTs.

    Scale shape — why this is THE billion-vector layout: the corpus is
    touched by map-side projections and kernels only (coarse assign,
    residual subtract, PQ encode — no shuffle by vector anywhere); the
    search stage reads the (vid, cell, codes) table, keeps only rows in
    probed cells (a literal IN-filter), and scores with literal-array
    lookups, so per-probe cost is |probed cells| not |corpus|, and the
    only shuffle ever is the skinny top-k window.  Materialized, the
    codes table partitions by cell — `materialize_ivf_index` shows that
    same move for the uncompressed variant.

    Exactness: every distance (coarse, residual, LUT) is int64 over
    quantized components; ties break (d2, cell) and (adc_d2,
    neighbor_id).  Returns (query_id, neighbor_id, cell, adc_d2,
    rank ≤ topk)."""
    from hotdog_spark.operators import track_persist

    # One persisted quantized derivation feeds the coarse trainer, the
    # probe collect AND (in pq_recall_report) the exact baseline leg.
    if base is None:
        base = track_persist(with_quantized(df, vec_col, id_col))
    # ONE driver job collects BOTH the coarse k-means init (k lowest
    # vids) and the probe set (r11, guide §1.2: these were two
    # sequential jobs over the same cached table; the union evaluates
    # both subtrees in a single action).  Probes are a driver-side
    # handful by contract, exactly as before.
    seed_rows = (
        base.orderBy("vid")
        .limit(max(cells, k))
        .select(F.lit(0).alias("_leg"), "vid", "q")
        .unionAll(
            base.filter(probe_filter).select(F.lit(1).alias("_leg"), "vid", "q")
        )
        .collect()
    )
    init_rows = [r for r in seed_rows if r["_leg"] == 0]
    probes = [r for r in seed_rows if r["_leg"] == 1]
    assigned, cents = kmeans_quantized(
        df, vec_col, id_col, k=cells, iters=coarse_iters, base=base,
        init_rows=init_rows,
    )
    # residual = q - own-cell centroid, an integer projection: the
    # centroid table rides along as a literal array-of-arrays
    cent_arr = F.array(*[_lit_vec(cv) for _cid, cv in cents])
    resid = track_persist(
        assigned.select(
            "vid",
            F.zip_with(
                F.col("q"),
                F.element_at(cent_arr, F.col("cluster") + 1),
                lambda x, y: x - y,
            ).alias("q"),
            F.col("cluster").cast("int").alias("cell"),
        )
    )
    # The PQ Lloyd init (the k lowest-vid RESIDUAL rows) is computed
    # driver-side from the already-collected seed rows and the final
    # centroids — the residual of a known (vid, q) is q minus its
    # argmin-assigned cell's centroid, exact Python ints with the same
    # (d2, cid) tie-break as the assignment expression — eliminating
    # the resid.orderBy().limit(k).collect() job entirely (r11,
    # guide §1.2; the resid persist now materializes on the first
    # Lloyd kernel pass instead).
    _cent_map = {int(cid): list(cv) for cid, cv in cents}
    pq_init_rows = []
    for r in sorted(init_rows, key=lambda rr: rr["vid"])[:k]:
        qv = [int(x) for x in r["q"]]
        _d2, cell = min(
            (sum((a - b) * (a - b) for a, b in zip(qv, cv)), cid)
            for cid, cv in _cent_map.items()
        )
        pq_init_rows.append(
            {"vid": int(r["vid"]),
             "q": [a - b for a, b in zip(qv, _cent_map[cell])]}
        )
    books, sub = _pq_train_books(resid, m, k, iters, init_rows=pq_init_rows)
    enc = track_persist(pq_encode(resid, books, sub, carry=(("cell", "int"),)))

    # probes: a driver-side handful — coarse cells, residuals and LUTs
    # all computed in exact Python ints; collected up front in the same
    # job as the coarse init (above), off the cached base
    if not probes:
        # zero probes would make both isin() (no args) and
        # explode(array()) invalid — the correct answer is no rows
        return df.sparkSession.createDataFrame(
            [],
            "query_id bigint, neighbor_id bigint, cell int, "
            "adc_d2 bigint, rank int",
        )
    cent_by_id = {int(cid): list(cv) for cid, cv in cents}
    # Per-probe scoring as ONE parsed SQL expression per probe (r12,
    # guide §7.3 — same Py4J diet as pq_adc_topk, with the per-cell LUT
    # sums wrapped in the same CASE WHEN cell = … chain F.when built).
    structs = []
    probed_cells_all: set[int] = set()
    for p in sorted(probes, key=lambda r: r["vid"]):
        pq_vec = [int(x) for x in p["q"]]
        coarse = sorted(
            (
                sum((a - b) * (a - b) for a, b in zip(pq_vec, cv)),
                cid,
            )
            for cid, cv in cent_by_id.items()
        )[:nprobe]
        branches = []
        for _d2, cell in coarse:
            probed_cells_all.add(cell)
            rq = [a - b for a, b in zip(pq_vec, cent_by_id[cell])]
            terms = []
            for s in range(m):
                ps = rq[s * sub : (s + 1) * sub]
                lut = [
                    sum((a - b) * (a - b) for a, b in zip(ps, cv))
                    for _c, cv in books[s]
                ]
                terms.append(
                    "element_at(array("
                    + ",".join(_sql_int(v) for v in lut)
                    + f"), codes[{s}] + 1)"
                )
            branches.append(
                f"WHEN cell = {_sql_int(cell)} THEN {' + '.join(terms)}"
            )
        structs.append(
            F.expr(
                f"named_struct('query_id', {_sql_int(p['vid'])}, "
                f"'adc_d2', CAST(CASE {' '.join(branches)} END AS BIGINT))"
            )
        )
    fanned = (
        enc.filter(F.col("cell").isin(*sorted(probed_cells_all)))
        .select(
            F.col("vid").alias("neighbor_id"),
            "cell",
            F.explode(F.array(*structs)).alias("e"),
        )
        .select("e.query_id", "neighbor_id", "cell", "e.adc_d2")
        .filter(
            F.col("adc_d2").isNotNull()
            & (F.col("neighbor_id") != F.col("query_id"))
        )
    )
    w = Window.partitionBy("query_id").orderBy("adc_d2", "neighbor_id")
    return fanned.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= topk
    )


def pq_recall_report(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    probe_filter: Column,
    topk: int = 3,
    **ivf_pq_kw,
) -> DataFrame:
    """The PQ eval loop: recall@k of IVF-PQ ADC search against the
    EXACT integer squared-L2 top-k over the full corpus — the
    measurement that sets the m/k/nprobe dials before a compressed
    index is trusted (the LSH twin is `ann_recall_report`).

    Scale shape: the exact baseline is the probe-broadcast scored scan
    (the rerank-stage plan — fine for a handful of probes, never the
    recall stage itself); the ADC side is :func:`ivf_pq_topk`; the
    comparison joins two ≤ probes·k-row tables.  Returns (query_id,
    n_hits, recall_milli) with recall as an exact scaled integer —
    floats never enter, so the report hash-matches cross-engine."""
    from hotdog_spark.operators import track_persist

    # ONE persisted quantized derivation for the whole eval: the ADC leg
    # (coarse trainer + probe collect inside ivf_pq_topk) and the exact
    # baseline leg both read it — previously each leg re-derived
    # scan+quantize+norm (r10 verdict item 3).
    base = track_persist(with_quantized(df, vec_col, id_col))
    probes = broadcast(
        base.filter(probe_filter).select(
            F.col("vid").alias("query_id"), F.col("q").alias("qp")
        )
    )
    exact = track_persist(
        base.crossJoin(probes)
        .filter(F.col("vid") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vid").alias("neighbor_id"),
            _norm2("zip_with(q, qp, (x, y) -> x - y)").alias(
                "d2"
            ),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("d2", "neighbor_id")
            ),
        )
        .filter(F.col("rn") <= topk)
        .select("query_id", "neighbor_id")
    )
    # Overlap the two data-independent legs (r12, VERDICT r11 item 1,
    # guide §2.6): the exact-L2 baseline — a full corpus scan + top-k
    # window — does not depend on anything the ADC leg's sequential
    # trainer collects produce, and those collects leave the executors
    # mostly idle (the driver alternates ~0.4 s kernel jobs with
    # expression construction).  A second driver thread materializes the
    # persisted exact leg while the main thread trains; the final
    # report join then reads the cache.  Job descriptions are
    # thread-local, so the UI attributes the leg correctly; failures are
    # re-raised after join() so behavior under error is unchanged.
    from pyspark import InheritableThread

    sc = df.sparkSession.sparkContext
    leg_err: list[BaseException] = []

    def _materialize_exact() -> None:
        try:
            sc.setJobDescription("pq_recall_report: exact baseline leg")
            exact.count()
        except BaseException as e:  # noqa: BLE001 — re-raised on join
            leg_err.append(e)

    t = InheritableThread(target=_materialize_exact)
    t.start()
    try:
        adc = ivf_pq_topk(
            df, vec_col, id_col, probe_filter, topk=topk, base=base,
            **ivf_pq_kw
        ).select("query_id", "neighbor_id")
    finally:
        t.join()
    if leg_err:
        raise leg_err[0]
    return (
        exact.alias("e")
        .join(
            adc.alias("a"),
            (F.col("a.query_id") == F.col("e.query_id"))
            & (F.col("a.neighbor_id") == F.col("e.neighbor_id")),
            "left",
        )
        .groupBy(F.col("e.query_id").alias("query_id"))
        .agg(F.count(F.col("a.neighbor_id")).cast("int").alias("n_hits"))
        .select(
            "query_id",
            "n_hits",
            F.expr(f"(1000 * n_hits) div {topk}").alias("recall_milli"),
        )
    )


def semantic_dedup_exemplar(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    iters: int = 3,
    threshold: float = 0.95,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public):
    cluster embeddings with k-means, then flag members whose cosine to
    the cluster EXEMPLAR (the member nearest the centroid, ties on
    lowest id) exceeds ``threshold`` as semantic duplicates of it.

    Scale shape — the reason for the exemplar variant: the paper's
    within-cluster all-pairs is O(Σ|c|²), quadratic unless k is scaled
    to hold |c| constant; screening against one exemplar per cluster is
    O(n) at ANY k.  Nothing here shuffles the corpus: k-means assignment
    is a map-side projection against centroid literals
    (:func:`kmeans_quantized`), the exemplar choice is one
    groupBy(cluster) ``min(struct(d2, vid))`` emitting k tiny rows, the
    exemplar vectors come back via a broadcast semi-lookup, and the
    final score is another broadcast join + projection.  At 100 TB the
    only aggregate state is k rows.

    Determinism: quantized-integer dot products and norms; the single
    float op chain (CAST → multiply → sqrt → divide) is identical in
    both engines, so scores are bit-equal and the threshold compare
    cannot flap.  ``threshold`` is the production dial (SemDeDup uses
    ~0.95 on real encoder output; near-random synthetic embeddings need
    a lower dial to exercise both branches — the registered query uses
    0.15 and says so).

    Returns (vec_id, cluster, exemplar_id, cos_exemplar,
    is_semantic_dup) — one row per input vector.
    """
    from hotdog_spark.operators import track_persist

    assigned, _cents = kmeans_quantized(df, vec_col, id_col, k=k, iters=iters)
    # The assignment feeds three consumers (exemplar argmin, exemplar
    # vector lookup, final scoring join); persist it so the centroid
    # argmin projection runs once, not three times.
    base = track_persist(assigned.withColumn("n2", _norm2("q")))
    ex_ids = (
        base.groupBy("cluster")
        .agg(F.min(F.struct("d2", "vid")).alias("m"))
        .select("cluster", F.col("m.vid").alias("exemplar_id"))
    )
    exv = (
        base.select(
            F.col("vid").alias("exemplar_id"),
            F.col("q").alias("ex_q"),
            F.col("n2").alias("ex_n2"),
        )
        .join(broadcast(ex_ids), "exemplar_id")
        .select("cluster", "exemplar_id", "ex_q", "ex_n2")
    )
    cos = F.when(
        (F.col("n2") > 0) & (F.col("ex_n2") > 0),
        _dot("q", "ex_q").cast("double")
        / F.sqrt((F.col("n2") * F.col("ex_n2")).cast("double")),
    ).otherwise(F.lit(0.0))
    scored = base.join(broadcast(exv), "cluster").select(
        F.col("vid").alias("vec_id"),
        F.col("cluster").cast("int").alias("cluster"),
        "exemplar_id",
        cos.alias("cos_exemplar"),
    )
    return scored.select(
        "vec_id",
        "cluster",
        "exemplar_id",
        "cos_exemplar",
        (
            (F.col("vec_id") != F.col("exemplar_id"))
            & (F.col("cos_exemplar") >= F.lit(float(threshold)))
        ).alias("is_semantic_dup"),
    )


def label_cohesion(df: DataFrame, vec_col: str, id_col: str, label_col: str) -> DataFrame:
    """Per-label embedding cohesion: each label's centroid (exact integer
    sums over quantized components) and the distribution of its members'
    squared-L2 distances to it — the class-compactness report that flags
    mislabeled points and collapsing classes before training.

    Scale shape: the centroid aggregation shuffles only (label, dim)
    cells — map-side combinable, label×dim rows total, never data-sized —
    and joins back as a broadcast; the corpus itself is touched by one
    projection and one final label-keyed aggregate.  Distances are
    floored to integer millis so the per-label sums are order-independent
    and engine-exact.  Returns (label, n_vecs, sum_qd2, max_qd2).
    """
    base = fan_out(df).select(
        F.col(id_col).alias("vid"),
        F.col(label_col).alias("label"),
        quantized(F.col(vec_col)).alias("q"),
    )
    dims = base.select("label", F.posexplode("q").alias("dim", "qv"))
    cent = dims.groupBy("label", "dim").agg(
        F.sum("qv").alias("s"), F.count(F.lit(1)).alias("c")
    )
    cent_arr = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "s", "c"))),
            lambda x: x["s"].cast("double") / x["c"].cast("double"),
        ).alias("centroid")
    )
    scored = base.join(broadcast(cent_arr), "label").select(
        "label",
        F.floor(
            F.aggregate(
                F.zip_with(
                    "q",
                    "centroid",
                    lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            * 1000
        ).cast("bigint").alias("qd2"),
    )
    return scored.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("qd2").alias("sum_qd2"),
        F.max("qd2").alias("max_qd2"),
    )


def lsh_multiprobe_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    probe_filter: Column,
    k: int = 3,
    bits: int = 4,
) -> DataFrame:
    """Multi-probe LSH ANN: each probe searches its own sign bucket PLUS
    every one-bit-flip neighbor bucket (bits+1 buckets/probe) — the
    standard recall recovery for bucketed LSH (Lv et al., VLDB'07):
    near-misses whose vector sits just across one hyperplane come back
    without shrinking the buckets.

    Cost model vs single-probe: candidate volume ×(bits+1) while the
    pair space stays Σ bucket² — still nothing close to n².  The probe
    expansion is an explode over (bits+1) literals on the (tiny,
    broadcast) probe side only; the corpus side is untouched.  Each
    candidate lives in exactly one bucket, so no dedup step is needed.
    Returns (query_id, neighbor_id, bucket, score, rank).
    """
    base = with_quantized(df, vec_col, id_col).withColumn(
        "bucket", sign_bucket(F.col("q"), bits)
    )
    bp = F.col("bucket")

    def _flip(i: int) -> Column:
        flipped = (
            F.lit(1) - F.substring(bp, i, 1).cast("int")
        ).cast("string")
        return F.concat(
            F.substring(bp, 1, i - 1), flipped, F.substring(bp, i + 1, bits - i)
        )

    probes = (
        base.filter(probe_filter)
        .withColumn(
            "pbucket",
            F.explode(F.array(bp, *[_flip(i) for i in range(1, bits + 1)])),
        )
        .select(
            F.col("vid").alias("query_id"),
            F.col("q").alias("q_probe"),
            F.col("n2").alias("n2_probe"),
            F.col("pbucket"),
        )
    )
    pairs = base.join(
        broadcast(probes), F.col("bucket") == F.col("pbucket")
    ).filter(
        (F.col("vid") != F.col("query_id"))
        & (F.col("n2") > 0)
        & (F.col("n2_probe") > 0)
    )
    scored = pairs.select(
        "query_id",
        F.col("vid").alias("neighbor_id"),
        "bucket",
        (
            _dot("q", "q_probe").cast("double")
            / F.sqrt((F.col("n2") * F.col("n2_probe")).cast("double"))
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def int8_quantization_report(df: DataFrame, vec_col: str) -> DataFrame:
    """Scalar int8 quantization audit — the compression step vector
    stores apply before ANN at scale (4× smaller than float32, the
    IVF+SQ8 layout): per dimension, min/max calibration, the uint8 step
    size, and the worst reconstruction error after round-trip.

    Plan: posexplode to (dim, value) → ONE 64-group stats aggregate →
    broadcast the 64-row calibration back over the exploded values →
    ONE aggregate for the error max.  Determinism: everything flows
    through doubles promoted exactly from float32; MAX is
    order-independent (unlike SUM over doubles, deliberately not
    emitted); round() on non-negative inputs is half-up in both engines.
    Returns (dim, mn, mx, scale, max_abs_err, n_values).
    """
    e = fan_out(df).select(
        F.posexplode(F.col(vec_col)).alias("pos", "xf")
    ).select((F.col("pos") + 1).alias("dim"), F.col("xf").cast("double").alias("x"))
    st = e.groupBy("dim").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    st = st.withColumn("scale", (F.col("mx") - F.col("mn")) / F.lit(255.0))
    joined = e.join(broadcast(st), "dim")
    q = F.least(
        F.lit(255.0),
        F.greatest(F.lit(0.0), F.round((F.col("x") - F.col("mn")) / F.col("scale"), 0)),
    )
    err = F.when(
        F.col("scale") > 0,
        F.abs(F.col("x") - (F.col("mn") + q * F.col("scale"))),
    ).otherwise(F.lit(0.0))
    return (
        joined.select("dim", "mn", "mx", "scale", err.alias("err"))
        .groupBy("dim", "mn", "mx", "scale")
        .agg(
            F.max("err").alias("max_abs_err"),
            F.count(F.lit(1)).alias("n_values"),
        )
    )


def _signbits_word(vec_col: str, lo_bit: int, n: int = 32) -> Column:
    """Pack sign bits lo_bit..lo_bit+n-1 of a float vector into one
    BIGINT word: bit i set iff CAST(vec[i+1] AS DOUBLE) > 0 (zero and
    negative → 0 — a deterministic tie rule both engines share).  The
    float32→double cast is exact, so the comparison is engine-portable."""
    return F.expr(
        f"aggregate(transform(sequence(0, {n - 1}), i -> "
        f"CASE WHEN CAST(element_at({vec_col}, i + {lo_bit} + 1) AS DOUBLE) > 0 "
        f"THEN shiftleft(CAST(1 AS BIGINT), i) ELSE CAST(0 AS BIGINT) END), "
        f"CAST(0 AS BIGINT), (a, x) -> a + x)"
    )


def binary_hamming_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    probe_filter: Column,
    k: int = 5,
    dims: int = 64,
) -> DataFrame:
    """Top-k retrieval over BINARY (sign-quantized) embeddings — the
    classic 32×-compression ANN path (Charikar 2002 hyperplane LSH in
    its degenerate axis-aligned form; the layout modern vector stores
    ship as 'binary quantization'): each 64-dim float vector collapses
    to 64 sign bits packed in two 32-bit BIGINT halves, similarity is
    Hamming distance via two bit_count(xor) ops per candidate — integer
    ALU work on 16 bytes per vector instead of 256+ bytes of float
    math, which is the whole point at 100 TB: the packed corpus is
    small enough to sit in memory/cache a full replica per executor,
    and the scan is one whole-stage-codegen projection, no Python.

    Bit layout: word lo holds dims 0-31 (bit i = dim i), word hi dims
    32-63 — two halves so no sign bit is ever set (packing dim 63 into
    a single BIGINT would need 1<<63, which overflows signed-64
    differently per engine).

    Returns (query_id, neighbor_id, hamming, rank): rank by ascending
    Hamming, neighbor_id tiebreak, self excluded.

    ``dims`` must equal the actual vector length (guarded in-plan with
    raise_error — a shorter vector would silently pack NULL→0 bits and
    a longer one would silently drop dimensions) and be a multiple of
    32 (one packed word per 32 dims)."""
    assert dims % 32 == 0 and dims > 0
    n_words = dims // 32
    guard = F.expr(
        f"CASE WHEN size({vec_col}) <> {dims} THEN "
        f"raise_error(concat('binary_hamming_topk: vector length ', "
        f"CAST(size({vec_col}) AS STRING), ' != dims={dims}')) "
        f"ELSE {vec_col} END"
    )
    packed = df.withColumn(vec_col, guard).select(
        F.col(id_col).alias("vid"),
        *[
            _signbits_word(vec_col, 32 * w).alias(f"b{w}")
            for w in range(n_words)
        ],
    )
    probes = packed.filter(probe_filter).select(
        F.col("vid").alias("query_id"),
        *[F.col(f"b{w}").alias(f"p{w}") for w in range(n_words)],
    )
    pairs = packed.crossJoin(broadcast(probes)).filter(
        F.col("vid") != F.col("query_id")
    )
    ham = " + ".join(f"bit_count(b{w} ^ p{w})" for w in range(n_words))
    scored = pairs.select(
        "query_id",
        F.col("vid").alias("neighbor_id"),
        F.expr(ham).cast("bigint").alias("hamming"),
    )
    w = Window.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def binary_hamming_recall(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    probe_filter: Column,
    k: int = 5,
    dims: int = 64,
) -> DataFrame:
    """Recall report for the binary-quantization path — the measurement
    behind shipping sign-bit indexes: per probe, how many of the EXACT
    cosine top-k (the family's integer-quantized ground truth,
    :func:`cosine_topk`) survive in the Hamming top-k over packed sign
    bits (:func:`binary_hamming_topk`).  Zero-overlap probes still emit
    (LEFT join back to the probe set).  Returns (query_id, k,
    n_overlap)."""
    exact = cosine_topk(df, vec_col, id_col, probe_filter, k=k).select(
        "query_id", "neighbor_id"
    )
    binary = binary_hamming_topk(
        df, vec_col, id_col, probe_filter, k=k, dims=dims
    ).select("query_id", "neighbor_id")
    overlap = exact.join(binary, ["query_id", "neighbor_id"]).groupBy(
        "query_id"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_overlap"))
    probes = df.select(F.col(id_col).alias("vid")).filter(probe_filter).select(
        F.col("vid").alias("query_id")
    )
    return probes.join(overlap, "query_id", "left").select(
        "query_id",
        F.lit(k).cast("int").alias("k"),
        F.coalesce(F.col("n_overlap"), F.lit(0)).cast("bigint").alias("n_overlap"),
    )
