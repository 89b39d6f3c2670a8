"""Similarity-search queries over the `embeddings` table.

Embeddings are quantized to integers before arithmetic so cosine scores
are bit-identical across engines (see operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hotdog_spark.operators import similarity as ops
from hotdog_spark.queries import register
from hotdog_spark.sources.batch import table

_QUANT = "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"


@register(
    "ann_cosine_topk",
    oracle=f"""
    WITH n AS (
      SELECT vec_id, {_QUANT} AS qv,
             list_sum(list_transform({_QUANT}, x -> x * x)) AS n2
      FROM embeddings
    ), probes AS (
      SELECT vec_id AS query_id, qv AS qp, n2 AS n2p FROM n WHERE vec_id < 10
    ), scored AS (
      SELECT p.query_id, c.vec_id AS neighbor_id,
             CAST(list_sum(list_transform(list_zip(c.qv, p.qp), s -> s[1] * s[2])) AS DOUBLE)
               / sqrt(CAST(c.n2 * p.n2p AS DOUBLE)) AS score
      FROM n c, probes p
      WHERE c.vec_id != p.query_id AND c.n2 > 0 AND p.n2p > 0
    )
    SELECT query_id, neighbor_id, score, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, neighbor_id) AS rank
      FROM scored
    ) t WHERE rank <= 5
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for 10 probe vectors: broadcast probes ×
    corpus scan, per-probe ranking — the exactness baseline every ANN
    variant is measured against."""
    emb = table(spark, sf_dir, "embeddings")
    return ops.cosine_topk(
        emb, "embedding", "vec_id", probe_filter=F.col("vid") < 10, k=5
    ).select("query_id", "neighbor_id", "score", "rank")


@register(
    "ann_ivf",
    oracle=f"""
    WITH n AS (
      SELECT vec_id, {_QUANT} AS qv,
             list_sum(list_transform({_QUANT}, x -> x * x)) AS n2
      FROM embeddings
    ), c AS (
      SELECT vec_id AS cid, qv AS qc, n2 AS n2c FROM n WHERE vec_id < 8
    ), d AS (
      SELECT v.vec_id, v.qv, v.n2, c.cid,
             v.n2 + c.n2c
             - 2 * list_sum(list_transform(list_zip(v.qv, c.qc), s -> s[1] * s[2])) AS d2
      FROM n v, c
    ), cellr AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM d
    ), assigned AS (
      SELECT vec_id, qv, n2, cid AS cell FROM cellr WHERE rn = 1
    ), pcells AS (
      SELECT vec_id AS query_id, cid AS pcell FROM cellr
      WHERE vec_id >= 10 AND vec_id < 20 AND rn <= 2
    ), pv AS (
      SELECT vec_id AS query_id, qv AS qp, n2 AS n2p FROM n
      WHERE vec_id >= 10 AND vec_id < 20
    ), scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id, a.cell,
             CAST(list_sum(list_transform(list_zip(a.qv, pv.qp), s -> s[1] * s[2])) AS DOUBLE)
               / sqrt(CAST(a.n2 * pv.n2p AS DOUBLE)) AS score
      FROM assigned a
      JOIN pcells p ON a.cell = p.pcell
      JOIN pv ON pv.query_id = p.query_id
      WHERE a.vec_id != p.query_id AND a.n2 > 0 AND pv.n2p > 0
    )
    SELECT query_id, neighbor_id, cell, score, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, neighbor_id) AS rank
      FROM scored
    ) t WHERE rank <= 3
    """,
)
def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: nearest-centroid cell assignment as a pure map-side
    projection (centroids inlined as broadcast literals), candidates
    restricted to each probe's 2 nearest cells — the partition-prunable
    scale path for vector search."""
    emb = table(spark, sf_dir, "embeddings")
    return ops.ivf_topk(
        emb,
        "embedding",
        "vec_id",
        centroid_filter=F.col("vid") < 8,
        probe_filter=(F.col("vid") >= 10) & (F.col("vid") < 20),
        k=3,
        nprobe=2,
    ).select("query_id", "neighbor_id", "cell", "score", "rank")


@register(
    "knn_graph_ivf",
    oracle=f"""
    WITH n AS (
      SELECT vec_id, {_QUANT} AS qv,
             list_sum(list_transform({_QUANT}, x -> x * x)) AS n2
      FROM embeddings
    ), c AS (
      SELECT vec_id AS cid, qv AS qc, n2 AS n2c FROM n
      WHERE vec_id < (SELECT GREATEST(8, LEAST(256, COUNT(*) // 250))
                      FROM embeddings)
    ), d AS (
      SELECT v.vec_id, v.qv, v.n2, c.cid,
             v.n2 + c.n2c
             - 2 * list_sum(list_transform(list_zip(v.qv, c.qc), s -> s[1] * s[2])) AS d2
      FROM n v, c
    ), cellr AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM d
    ), assigned AS (
      SELECT vec_id, qv, n2, cid AS cell FROM cellr WHERE rn = 1
    ), pcells AS (
      SELECT vec_id AS query_id, cid AS pcell FROM cellr WHERE rn <= 2
    ), pv AS (
      SELECT vec_id AS query_id, qv AS qp, n2 AS n2p FROM n
    ), scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             CAST(list_sum(list_transform(list_zip(a.qv, pv.qp), s -> s[1] * s[2])) AS DOUBLE)
               / sqrt(CAST(a.n2 * pv.n2p AS DOUBLE)) AS score
      FROM assigned a
      JOIN pcells p ON a.cell = p.pcell
      JOIN pv ON pv.query_id = p.query_id
      WHERE a.vec_id != p.query_id AND a.n2 > 0 AND pv.n2p > 0
    )
    SELECT query_id, neighbor_id, score, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, neighbor_id) AS rank
      FROM scored
    ) t WHERE rank <= 3
    """,
)
def knn_graph_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN GRAPH over the whole embedding table (every vector is a
    probe): IVF-cell blocking with a hash-partitioned equi-join on the
    cell key — NOT the broadcast-probe plan, which would broadcast the
    corpus.  The cell count SCALES WITH THE CORPUS —
    C = clamp(n/250, 8, 256) — keeping cell size (and so per-probe
    candidate count) constant and total pair volume LINEAR in n; a fixed
    C made this quadratic, which the sf1 stress run caught as a 16.7×
    blow-up with 1.3 GB of spill (SCALE_sf1.json).  One count job for C,
    one shuffle keyed by cell.

    Executes via :func:`ops.knn_graph_cells` — the per-cell Arrow-batched
    matmul twin of the equi-join plan (bit-identical output, ~4× faster
    at sf1: the 10M per-pair interpreted dot products become one BLAS
    matmul per cell and the top-k window input drops from pair count to
    ≤ nprobe·k rows per query)."""
    emb = table(spark, sf_dir, "embeddings")
    n = emb.count()
    n_cells = max(8, min(256, n // 250))
    return ops.knn_graph_cells(
        emb, "embedding", "vec_id",
        centroid_filter=F.col("vid") < n_cells, k=3, nprobe=2,
    ).select("query_id", "neighbor_id", "score", "rank")


@register(
    "ann_lsh_bucketed",
    oracle=f"""
    WITH n AS (
      SELECT vec_id, {_QUANT} AS qv,
             list_sum(list_transform({_QUANT}, x -> x * x)) AS n2
      FROM embeddings
    ), bucketed AS (
      SELECT vec_id, qv, n2,
             (CASE WHEN qv[1] >= 0 THEN '1' ELSE '0' END)
             || (CASE WHEN qv[2] >= 0 THEN '1' ELSE '0' END)
             || (CASE WHEN qv[3] >= 0 THEN '1' ELSE '0' END)
             || (CASE WHEN qv[4] >= 0 THEN '1' ELSE '0' END) AS bucket
      FROM n
    ), probes AS (
      SELECT vec_id AS query_id, qv AS qp, n2 AS n2p, bucket AS bp
      FROM bucketed WHERE vec_id < 10
    ), scored AS (
      SELECT p.query_id, c.vec_id AS neighbor_id, c.bucket,
             CAST(list_sum(list_transform(list_zip(c.qv, p.qp), s -> s[1] * s[2])) AS DOUBLE)
               / sqrt(CAST(c.n2 * p.n2p AS DOUBLE)) AS score
      FROM bucketed c JOIN probes p ON c.bucket = p.bp
      WHERE c.vec_id != p.query_id AND c.n2 > 0 AND p.n2p > 0
    )
    SELECT query_id, neighbor_id, bucket, score, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, neighbor_id) AS rank
      FROM scored
    ) t WHERE rank <= 3
    """,
)
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN: candidates restricted to the probe's sign bucket
    (~1/16 of the corpus with 4 bits) — the recall-stage pattern that
    scales to 100 TB where brute force cannot."""
    emb = table(spark, sf_dir, "embeddings")
    return ops.lsh_cosine_topk(
        emb, "embedding", "vec_id", probe_filter=F.col("vid") < 10, k=3, bits=4
    ).select("query_id", "neighbor_id", "bucket", "score", "rank")


def _kmeans_chain(
    qexpr: str,
    sfx: str,
    k: int,
    iters: int,
    src: str = "embeddings",
    id_expr: str = "vec_id",
) -> str:
    """Unrolled Lloyd's k-means as comma-joined CTE blocks (no WITH)
    ending in ``fin{sfx}`` (vid, q, cid, d2), over ``qexpr`` as the
    quantized-vector expression — shared by the kmeans, semantic-dedup,
    diversity and (suffixed, per-subspace) PQ oracles.

    Expressible as SQL precisely because kmeans_quantized is deterministic
    end-to-end: integer-quantized vectors, lowest-vid init, (d2, cid)
    tie-breaks, and centroids re-quantized each round via floor of the
    exact rational mean.  The floor is emulated exactly in integer
    arithmetic (subtract the non-negative remainder, then divide) so no
    float division can perturb a boundary.  Empty clusters carry the
    previous centroid, mirroring the Spark trainer."""
    d2 = (
        "list_sum(list_transform(list_zip(v.q, c.cv),"
        " s -> (s[1] - s[2]) * (s[1] - s[2])))"
    )
    blocks = [
        f"""v{sfx} AS MATERIALIZED (SELECT {id_expr} AS vid, {qexpr} AS q FROM {src}),
c0{sfx} AS MATERIALIZED (
  SELECT ROW_NUMBER() OVER (ORDER BY vid) - 1 AS cid, q AS cv
  FROM (SELECT vid, q FROM v{sfx} ORDER BY vid LIMIT {k})
)"""
    ]
    for i in range(iters):
        blocks.append(
            f"""asg{i}{sfx} AS MATERIALIZED (
  SELECT vid, q, cid, d2 FROM (
    SELECT vid, q, cid, d2,
           ROW_NUMBER() OVER (PARTITION BY vid ORDER BY d2, cid) AS rn
    FROM (SELECT v.vid, v.q, c.cid, {d2} AS d2 FROM v{sfx} v, c{i}{sfx} c)
  ) WHERE rn = 1
),
newc{i}{sfx} AS MATERIALIZED (
  SELECT cid, list(comp ORDER BY dim) AS cv FROM (
    SELECT cid, dim,
           CAST((s - (((s % n) + n) % n)) // n AS BIGINT) AS comp
    FROM (
      SELECT cid, dim, SUM(qv) AS s, COUNT(*) AS n FROM (
        SELECT cid, unnest(q) AS qv, generate_subscripts(q, 1) AS dim
        FROM asg{i}{sfx}
      ) GROUP BY cid, dim
    )
  ) GROUP BY cid
),
c{i + 1}{sfx} AS MATERIALIZED (
  SELECT p.cid, COALESCE(nn.cv, p.cv) AS cv
  FROM c{i}{sfx} p LEFT JOIN newc{i}{sfx} nn ON p.cid = nn.cid
)"""
        )
    blocks.append(
        f"""fin{sfx} AS MATERIALIZED (
  SELECT vid, q, cid, d2 FROM (
    SELECT vid, q, cid, d2,
           ROW_NUMBER() OVER (PARTITION BY vid ORDER BY d2, cid) AS rn
    FROM (SELECT v.vid, v.q, c.cid, {d2} AS d2 FROM v{sfx} v, c{iters}{sfx} c)
  ) WHERE rn = 1
)"""
    )
    return ",\n".join(blocks)


def _kmeans_cte(k: int = 8, iters: int = 3) -> str:
    """``WITH``-chain over the full quantized vector ending in ``fin``."""
    return "WITH " + _kmeans_chain(_QUANT, "", k, iters)


def _kmeans_oracle(k: int = 8, iters: int = 3) -> str:
    return (
        _kmeans_cte(k, iters)
        + """
SELECT CAST(cid AS INTEGER) AS cluster, COUNT(*) AS n_vectors,
       CAST(SUM(d2) AS BIGINT) AS inertia
FROM fin GROUP BY cid"""
    )


def _semantic_dedup_oracle(k: int = 8, iters: int = 3, threshold: float = 0.15) -> str:
    """SemDeDup exemplar screen on top of the shared k-means CTE chain:
    exemplar = min (d2, vid) per cluster, cosine vs it from the same
    quantized integers / identical float op chain as the Spark side."""
    return (
        _kmeans_cte(k, iters)
        + f""",
n2s AS (
  SELECT vid, q, cid, d2,
         list_sum(list_transform(q, x -> x * x)) AS n2
  FROM fin
),
ex AS (
  SELECT cid, vid AS exemplar_id FROM (
    SELECT cid, vid,
           ROW_NUMBER() OVER (PARTITION BY cid ORDER BY d2, vid) AS rn
    FROM n2s
  ) WHERE rn = 1
),
exv AS (
  SELECT e.cid, e.exemplar_id, f.q AS ex_q, f.n2 AS ex_n2
  FROM ex e JOIN n2s f ON f.vid = e.exemplar_id
),
scored AS (
  SELECT f.vid AS vec_id, f.cid, x.exemplar_id,
         CASE WHEN f.n2 > 0 AND x.ex_n2 > 0 THEN
           CAST(list_sum(list_transform(list_zip(f.q, x.ex_q),
                s -> s[1] * s[2])) AS DOUBLE)
             / sqrt(CAST(f.n2 * x.ex_n2 AS DOUBLE))
         ELSE 0.0 END AS cos_exemplar
  FROM n2s f JOIN exv x ON f.cid = x.cid
)
SELECT vec_id, CAST(cid AS INTEGER) AS cluster, exemplar_id, cos_exemplar,
       (vec_id != exemplar_id AND cos_exemplar >= {threshold}) AS is_semantic_dup
FROM scored"""
    )


@register("kmeans_embedding_clusters", oracle=_kmeans_oracle())
def kmeans_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means (k=8, 3 Lloyd iterations, deterministic lowest-id init)
    over quantized embeddings → per-cluster sizes and inertia.  The
    trained centroids are the input ivf_topk documents expecting; corpus
    is never shuffled — assignment is a map-side projection against
    centroid literals."""
    emb = table(spark, sf_dir, "embeddings")
    assigned, _cents = ops.kmeans_quantized(emb, "embedding", "vec_id", k=8, iters=3)
    return assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum("d2").alias("inertia"),
    )


@register("dedup_semantic_exemplar", oracle=_semantic_dedup_oracle())
def dedup_semantic_exemplar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (public: Abbas et al. 2023,
    arXiv:2303.09540): k-means the embeddings, then flag members whose
    cosine to the cluster exemplar (nearest-to-centroid member) clears
    the threshold as semantic duplicates.  Exemplar screening keeps the
    pair stage O(n) at any k — the paper's within-cluster all-pairs is
    quadratic unless k scales with n.  The corpus is never shuffled:
    map-side centroid assignment, a k-row exemplar aggregate, two
    broadcast joins.  Threshold 0.15 here (not the production ~0.95)
    because the synthetic embeddings are near-random — within-cluster
    cos-to-exemplar straddles 0.15 (sf0.01: 260 dup / 240 kept), so the
    low dial makes BOTH output branches real."""
    emb = table(spark, sf_dir, "embeddings")
    return ops.semantic_dedup_exemplar(
        emb, "embedding", "vec_id", k=8, iters=3, threshold=0.15
    )


def _cluster_diversity_oracle(k: int = 8, iters: int = 3) -> str:
    return (
        _kmeans_cte(k, iters)
        + """,
occ AS (SELECT cid, COUNT(*) AS n_c FROM fin GROUP BY cid),
tot AS (
  SELECT CAST(COUNT(*) AS INTEGER) AS k_nonempty,
         CAST(SUM(n_c) AS BIGINT) AS n_vectors,
         CAST(SUM(n_c * n_c) AS BIGINT) AS sum_sq_occupancy,
         CAST(MAX(n_c) AS BIGINT) AS max_occupancy
  FROM occ
)
SELECT k_nonempty, n_vectors, sum_sq_occupancy,
       (1000000 * sum_sq_occupancy) // (n_vectors * n_vectors) AS simpson_ppm,
       (1000000 * n_vectors * n_vectors) // sum_sq_occupancy
         AS eff_clusters_ppm,
       (1000000 * max_occupancy) // n_vectors AS max_share_ppm
FROM tot"""
    )


def _matryoshka_oracle(k: int = 5, dims: tuple[int, ...] = (16, 32)) -> str:
    """Per-dim replay of matryoshka_overlap: one pairs CTE carrying the
    full score plus every truncated score (list slices of the SAME
    quantized vectors), one ranking per scoring, overlap counts
    LEFT-joined back to probes so zero-overlap probes still emit."""
    sdim_cols = []
    for d in dims:
        dot = (
            f"list_sum(list_transform(list_zip(c.qv[1:{d}], p.qp[1:{d}]), "
            f"s -> s[1] * s[2]))"
        )
        n2c = f"list_sum(list_transform(c.qv[1:{d}], x -> x * x))"
        n2p = f"list_sum(list_transform(p.qp[1:{d}], x -> x * x))"
        sdim_cols.append(
            f"CASE WHEN ({n2c}) = 0 OR ({n2p}) = 0 THEN -2.0\n"
            f"  ELSE CAST({dot} AS DOUBLE) / sqrt(CAST(({n2c}) * ({n2p}) AS DOUBLE))\n"
            f"  END AS s_{d}"
        )
    tops = [
        f"""t_{d} AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY s_{d} DESC, neighbor_id) AS r
    FROM pairs) q WHERE r <= {k}
),
o_{d} AS (
  SELECT query_id, COUNT(*) AS n_overlap
  FROM tf JOIN t_{d} USING (query_id, neighbor_id) GROUP BY query_id
)"""
        for d in dims
    ]
    finals = "\nUNION ALL\n".join(
        f"SELECT p.query_id, CAST({d} AS INTEGER) AS trunc_dim, "
        f"CAST({k} AS INTEGER) AS k, "
        f"CAST(coalesce(o.n_overlap, 0) AS BIGINT) AS n_overlap "
        f"FROM probes p LEFT JOIN o_{d} o USING (query_id)"
        for d in dims
    )
    return f"""
    WITH n AS (
      SELECT vec_id, {_QUANT} AS qv,
             list_sum(list_transform({_QUANT}, x -> x * x)) AS n2
      FROM embeddings
    ), probes AS (
      SELECT vec_id AS query_id, qv AS qp, n2 AS n2p FROM n WHERE vec_id < 10
    ), pairs AS (
      SELECT p.query_id, c.vec_id AS neighbor_id,
             CAST(list_sum(list_transform(list_zip(c.qv, p.qp), s -> s[1] * s[2])) AS DOUBLE)
               / sqrt(CAST(c.n2 * p.n2p AS DOUBLE)) AS s_full,
             {", ".join(sdim_cols)}
      FROM n c, probes p
      WHERE c.vec_id != p.query_id AND c.n2 > 0 AND p.n2p > 0
    ), tf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY s_full DESC, neighbor_id) AS r
        FROM pairs) q WHERE r <= {k}
    ),
    {",".join(tops)}
    {finals}"""


@register("matryoshka_truncation_recall", oracle=_matryoshka_oracle())
def matryoshka_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-truncation quality report (Matryoshka representation
    learning, Kusupati et al. 2022 — public): per probe, how many of
    the full-64-dim cosine top-5 neighbours survive at the first 16 and
    first 32 dims — the measurement behind storing a prefix of each
    embedding (4× / 2× cheaper index) instead of the full vector.  One
    corpus × broadcast-probes pass scores every dim variant as extra
    projection columns; all ranking windows share the query_id
    exchange; output is 10 probes × 2 dims of exact integers."""
    emb = table(spark, sf_dir, "embeddings")
    return ops.matryoshka_overlap(
        emb, "embedding", "vec_id", probe_filter=F.col("vid") < 10, k=5,
        dims=(16, 32),
    )


#: Exactness bound for the ppm diversity report: 10^6 * N^2 must stay
#: within signed-64 (9.22e18), so N ≤ ~3.03e6; enforced in-plan below.
#: DuckDB needs no twin guard — its bigint multiply already raises on
#: overflow, which is exactly the loud failure the Spark side now matches.
_CLUSTER_PPM_N_BOUND = 3_000_000


def _guarded_simpson_ppm() -> Column:
    """simpson_ppm with the exactness bound enforced in-plan: raises via
    ``raise_error`` (on whichever executor evaluates the aggregate row)
    when n_vectors exceeds _CLUSTER_PPM_N_BOUND, instead of letting the
    10^6·N² bigint multiply wrap silently.  Split out so the guard can
    be unit-tested on a synthetic over-bound row without materializing
    3e6 vectors (tests/test_ops.py::test_cluster_ppm_guard_fires)."""
    return F.expr(
        f"CASE WHEN n_vectors > {_CLUSTER_PPM_N_BOUND} THEN "
        f"raise_error(concat('corpus_cluster_diversity: n_vectors=', "
        f"CAST(n_vectors AS STRING), ' exceeds the {_CLUSTER_PPM_N_BOUND} "
        f"exact-bigint bound (10^6*N^2 overflows); shard the report by "
        f"corpus slice')) "
        f"ELSE (1000000 * sum_sq_occupancy) div (n_vectors * n_vectors) END"
    ).alias("simpson_ppm")


@register("corpus_cluster_diversity", oracle=_cluster_diversity_oracle())
def corpus_cluster_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-occupancy diversity report over the k-means assignment —
    the balance check run before cluster-based sampling (SemDeDup-style
    pruning, curriculum mixing) to catch a collapsed embedding space or
    a runaway majority cluster.

    Emits one row: non-empty cluster count, corpus size, Σn_c², and
    three scaled-integer diversity measures — the Simpson concentration
    index Σn_c²/N² (ppm), its inverse the effective number of clusters
    N²/Σn_c² (ppm — the 'true diversity' of order 2 from ecology,
    public), and the largest cluster's share (ppm).  All floor
    divisions over exact bigints: no logs, no entropy floats, so the
    report hash-matches cross-engine (Shannon entropy would not).

    Scale shape: rides the k-means trainer's map-side assignment (the
    corpus is never shuffled), then one k-row aggregate of an 8-row
    table.  BIGINT headroom: 10^6·N² caps at 9.2e18 → exact up to
    N ≈ 3·10^6 vectors per report; shard the report by corpus slice
    beyond that.  Past the bound the engines would DIVERGE, not fail
    together: Spark's non-ANSI bigint multiply wraps silently while
    DuckDB raises on overflow — so the bound is ENFORCED (VERDICT r7
    item 3): the simpson_ppm expression itself raises via
    ``raise_error`` when n_vectors exceeds _CLUSTER_PPM_N_BOUND.  The
    guard lives inside the plan (evaluated on the one aggregate row, no
    driver collect), so a 100× corpus fails loudly in BOTH engines
    instead of silently wrapping in one."""
    emb = table(spark, sf_dir, "embeddings")
    assigned, _cents = ops.kmeans_quantized(emb, "embedding", "vec_id", k=8, iters=3)
    occ = assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_c"))
    tot = occ.agg(
        F.count(F.lit(1)).cast("int").alias("k_nonempty"),
        F.sum("n_c").alias("n_vectors"),
        F.sum(F.col("n_c") * F.col("n_c")).alias("sum_sq_occupancy"),
        F.max("n_c").alias("max_occupancy"),
    )
    return tot.select(
        "k_nonempty",
        "n_vectors",
        "sum_sq_occupancy",
        _guarded_simpson_ppm(),
        F.expr("(1000000 * n_vectors * n_vectors) div sum_sq_occupancy").alias(
            "eff_clusters_ppm"
        ),
        F.expr("(1000000 * max_occupancy) div n_vectors").alias("max_share_ppm"),
    )


def _pq_oracle(m: int = 4, k: int = 8, iters: int = 2, dim: int = 64) -> str:
    """m independent suffixed k-means chains over contiguous vector
    slices, each bit-replaying the Spark trainer on its subspace."""
    sub = dim // m
    chains, finals = [], []
    for s in range(m):
        lo, hi = s * sub + 1, (s + 1) * sub
        chains.append(
            _kmeans_chain(f"({_QUANT})[{lo}:{hi}]", f"_s{s}", k, iters)
        )
        finals.append(
            f"SELECT {s} AS subspace, CAST(cid AS INTEGER) AS code,\n"
            f"       COUNT(*) AS n_vectors, CAST(SUM(d2) AS BIGINT) AS sum_d2\n"
            f"FROM fin_s{s} GROUP BY cid"
        )
    return "WITH " + ",\n".join(chains) + "\n" + "\nUNION ALL\n".join(finals)


@register("embedding_pq_codebook", oracle=_pq_oracle())
def embedding_pq_codebook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codebook training (Jégou et al. 2011,
    public): 4 subspaces × 16 dims, k=8 codes each, 2 Lloyd rounds —
    per-codeword occupancy and exact integer reconstruction error, the
    training step under an IVF-PQ index (SQ8 in
    `embedding_quantize_int8_report` is the coarser sibling).  All m
    subspace codebooks train in ONE shared Arrow-kernel scan per round
    (corpus scanned iters+2 times total, not m·(iters+2); nothing
    shuffled by vector), and the oracle unrolls m independent sliced
    k-means chains that must agree bit-for-bit.  k=8 is the test dial
    (production PQ uses 256/subspace — same plan, bigger broadcast)."""
    emb = table(spark, sf_dir, "embeddings")
    return ops.pq_train_stats(emb, "embedding", "vec_id", m=4, k=8, iters=2)


def _pq_adc_oracle(
    m: int = 4, k: int = 8, iters: int = 2, dim: int = 64, topk: int = 3
) -> str:
    sub = dim // m
    chains, luts = [], []
    for s in range(m):
        lo, hi = s * sub + 1, (s + 1) * sub
        chains.append(_kmeans_chain(f"({_QUANT})[{lo}:{hi}]", f"_s{s}", k, iters))
        luts.append(
            f"""lut_s{s} AS (
  SELECT p.vid AS query_id, c.cid,
         list_sum(list_transform(list_zip(p.q, c.cv),
                  z -> (z[1] - z[2]) * (z[1] - z[2]))) AS d2
  FROM (SELECT vid, q FROM v_s{s} WHERE vid < 10) p, c{iters}_s{s} c
)"""
        )
    fin_joins = "\n".join(
        f"  JOIN fin_s{s} f{s} ON f{s}.vid = f0.vid" for s in range(1, m)
    )
    lut_joins = "\n".join(
        f"  JOIN lut_s{s} l{s} ON l{s}.cid = f{s}.cid"
        f" AND l{s}.query_id = l0.query_id"
        for s in range(1, m)
    )
    total = " + ".join(f"l{s}.d2" for s in range(m))
    return (
        "WITH "
        + ",\n".join(chains + luts)
        + f""",
scored AS (
  SELECT l0.query_id, f0.vid AS neighbor_id,
         CAST({total} AS BIGINT) AS adc_d2
  FROM fin_s0 f0
{fin_joins}
  JOIN lut_s0 l0 ON l0.cid = f0.cid
{lut_joins}
  WHERE f0.vid != l0.query_id
)
SELECT query_id, neighbor_id, adc_d2, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY adc_d2, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {topk}"""
    )


@register("ann_pq_adc", oracle=_pq_adc_oracle())
def ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance top-k search (ADC): probes score the
    whole corpus in the COMPRESSED domain — each probe's distance to a
    vector is m table lookups on the vector's PQ codes, precomputed
    into per-probe literal arrays, so scoring is a pure projection over
    the (vid, codes) table and the only shuffle is the skinny top-k
    window.  The memory-bound search layer of an IVF-PQ index; exact
    rerank of these candidates is `ann_cosine_topk`.  All-integer ADC
    distances → deterministic ranking, bit-replayed by the oracle's
    unrolled sliced-k-means + LUT-join chain."""
    emb = table(spark, sf_dir, "embeddings")
    return ops.pq_adc_topk(
        emb, "embedding", "vec_id", probe_filter=F.col("vid") < 10,
        m=4, k=8, iters=2, topk=3,
    )


def _ivf_pq_blocks(
    cells: int = 8,
    coarse_iters: int = 2,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    nprobe: int = 2,
    dim: int = 64,
) -> str:
    """CTE blocks (no WITH, no final SELECT) ending in ``scored``
    (query_id, neighbor_id, cell, adc_d2) — shared by the IVF-PQ search
    oracle and the PQ recall-report oracle."""
    sub = dim // m
    d2z = "list_sum(list_transform(list_zip({a}, {b}), z -> (z[1] - z[2]) * (z[1] - z[2])))"
    blocks = [_kmeans_chain(_QUANT, "_c", cells, coarse_iters)]
    blocks.append(
        f"""rv AS (
  SELECT f.vid, list_transform(list_zip(f.q, c.cv), z -> z[1] - z[2]) AS q,
         CAST(f.cid AS INTEGER) AS cell
  FROM fin_c f JOIN c{coarse_iters}_c c ON c.cid = f.cid
)"""
    )
    for s in range(m):
        lo, hi = s * sub + 1, (s + 1) * sub
        blocks.append(
            _kmeans_chain(f"(q)[{lo}:{hi}]", f"_s{s}", k, iters, src="rv", id_expr="vid")
        )
    blocks.append(
        f"""pc AS (
  SELECT query_id, CAST(cid AS INTEGER) AS cell FROM (
    SELECT p.vid AS query_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY p.vid
                              ORDER BY {d2z.format(a='p.q', b='c.cv')}, c.cid) AS rn
    FROM (SELECT vid, q FROM v_c WHERE vid < 10) p, c{coarse_iters}_c c
  ) WHERE rn <= {nprobe}
),
pr AS (
  SELECT pc.query_id, pc.cell,
         list_transform(list_zip(p.q, c.cv), z -> z[1] - z[2]) AS rq
  FROM pc
  JOIN (SELECT vid, q FROM v_c WHERE vid < 10) p ON p.vid = pc.query_id
  JOIN c{coarse_iters}_c c ON CAST(c.cid AS INTEGER) = pc.cell
)"""
    )
    for s in range(m):
        lo, hi = s * sub + 1, (s + 1) * sub
        blocks.append(
            f"""lutq{s} AS (
  SELECT pr.query_id, pr.cell, c.cid,
         {d2z.format(a=f'(pr.rq)[{lo}:{hi}]', b='c.cv')} AS d2
  FROM pr, c{iters}_s{s} c
)"""
        )
    fin_joins = "\n".join(
        f"  JOIN fin_s{s} f{s} ON f{s}.vid = rv2.vid" for s in range(m)
    )
    lut_joins = "\n".join(
        f"  JOIN lutq{s} l{s} ON l{s}.query_id = pc.query_id"
        f" AND l{s}.cell = rv2.cell AND l{s}.cid = f{s}.cid"
        for s in range(m)
    )
    total = " + ".join(f"l{s}.d2" for s in range(m))
    return (
        ",\n".join(blocks)
        + f""",
scored AS (
  SELECT pc.query_id, rv2.vid AS neighbor_id, rv2.cell,
         CAST({total} AS BIGINT) AS adc_d2
  FROM rv rv2
  JOIN pc ON pc.cell = rv2.cell
{fin_joins}
{lut_joins}
  WHERE rv2.vid != pc.query_id
)"""
    )


def _ivf_pq_oracle(topk: int = 3, **kw) -> str:
    return (
        "WITH "
        + _ivf_pq_blocks(**kw)
        + f"""
SELECT query_id, neighbor_id, cell, adc_d2, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY adc_d2, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {topk}"""
    )


def _pq_recall_oracle(topk: int = 3, **kw) -> str:
    d2z = (
        "list_sum(list_transform(list_zip(v.q, p.q),"
        " z -> (z[1] - z[2]) * (z[1] - z[2])))"
    )
    return (
        "WITH "
        + _ivf_pq_blocks(**kw)
        + f""",
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT p.vid AS query_id, v.vid AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY p.vid
                              ORDER BY {d2z}, v.vid) AS rn
    FROM v_c v, (SELECT vid, q FROM v_c WHERE vid < 10) p
    WHERE v.vid != p.vid
  ) WHERE rn <= {topk}
),
adc AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY adc_d2, neighbor_id) AS rank
    FROM scored
  ) WHERE rank <= {topk}
)
SELECT e.query_id, CAST(COUNT(a.neighbor_id) AS INTEGER) AS n_hits,
       CAST((1000 * COUNT(a.neighbor_id)) // {topk} AS BIGINT) AS recall_milli
FROM exact e
LEFT JOIN adc a
  ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
GROUP BY e.query_id"""
    )


@register("ann_ivf_pq", oracle=_ivf_pq_oracle())
def ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full IVF-PQ index search (FAISS IVFPQ shape, public): coarse
    k-means cells + residual PQ codes + per-(probe, cell) ADC lookup
    tables, probes visiting their nprobe=2 nearest cells only.  The
    corpus never shuffles by vector (coarse assign, residual subtract
    and PQ encode are map-side projections/kernels); search filters the
    (vid, cell, codes) table to probed cells with a literal IN and
    scores via literal-array lookups, so per-probe cost tracks cell
    size, not corpus size.  Every distance is exact int64 — the oracle
    replays coarse + 4 residual k-means chains, probe cell choice,
    residual LUTs and the joined ADC sum bit-for-bit."""
    emb = table(spark, sf_dir, "embeddings")
    return ops.ivf_pq_topk(
        emb, "embedding", "vec_id", probe_filter=F.col("vid") < 10,
        cells=8, coarse_iters=2, m=4, k=8, iters=2, nprobe=2, topk=3,
    )


@register("ann_pq_recall_report", oracle=_pq_recall_oracle())
def ann_pq_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of IVF-PQ ADC search vs the exact integer-L2 top-3 —
    the dial-setting eval (m, k, nprobe) run before a compressed index
    is trusted; `ann_recall_report` is the LSH twin.  Recall emitted as
    an exact scaled integer so the report hash-matches cross-engine."""
    emb = table(spark, sf_dir, "embeddings")
    return ops.pq_recall_report(
        emb, "embedding", "vec_id", probe_filter=F.col("vid") < 10,
        topk=3, cells=8, coarse_iters=2, m=4, k=8, iters=2, nprobe=2,
    )


@register(
    "embedding_label_cohesion",
    oracle=f"""
    WITH base AS (
      SELECT vec_id, label, {_QUANT} AS q FROM embeddings
    ), dims AS (
      SELECT label, unnest(q) AS qv, generate_subscripts(q, 1) AS dim FROM base
    ), cent AS (
      SELECT label, dim, SUM(qv) AS s, COUNT(*) AS c
      FROM dims GROUP BY label, dim
    ), cent_arr AS (
      SELECT label, list(CAST(s AS DOUBLE) / c ORDER BY dim) AS centroid
      FROM cent GROUP BY label
    ), scored AS (
      SELECT b.label,
             CAST(FLOOR(list_sum(list_transform(list_zip(b.q, ca.centroid),
                    p -> (CAST(p[1] AS DOUBLE) - p[2]) * (CAST(p[1] AS DOUBLE) - p[2])))
                  * 1000) AS BIGINT) AS qd2
      FROM base b JOIN cent_arr ca USING (label)
    )
    SELECT label, COUNT(*) AS n_vecs,
           CAST(SUM(qd2) AS BIGINT) AS sum_qd2, MAX(qd2) AS max_qd2
    FROM scored GROUP BY label
    """,
)
def embedding_label_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label class compactness: centroid from exact integer sums, and
    each member's squared-L2 to it (floored to integer millis so sums are
    order-independent).  Centroids = label×dim cells, broadcast back —
    the corpus is one projection + one label-keyed aggregate.  The report
    that flags mislabeled points/collapsing classes before training."""
    from hotdog_spark.operators.similarity import label_cohesion

    return label_cohesion(
        table(spark, sf_dir, "embeddings"), "embedding", "vec_id", "label"
    )


def _multiprobe_oracle(bits: int = 4) -> str:
    sign = " || ".join(
        f"(CASE WHEN qv[{i+1}] >= 0 THEN '1' ELSE '0' END)" for i in range(bits)
    )
    flips = ", ".join(
        f"substr(bp, 1, {i - 1}) || CAST(1 - CAST(substr(bp, {i}, 1) AS INT) AS VARCHAR)"
        f" || substr(bp, {i + 1})"
        for i in range(1, bits + 1)
    )
    return f"""
    WITH n AS (
      SELECT vec_id, {_QUANT} AS qv,
             list_sum(list_transform({_QUANT}, x -> x * x)) AS n2
      FROM embeddings
    ), bucketed AS (
      SELECT vec_id, qv, n2, {sign} AS bucket FROM n
    ), probes AS (
      SELECT vec_id AS query_id, qv AS qp, n2 AS n2p,
             unnest([bp, {flips}]) AS pbucket
      FROM (SELECT vec_id, qv, n2, bucket AS bp FROM bucketed WHERE vec_id < 10)
    ), scored AS (
      SELECT p.query_id, c.vec_id AS neighbor_id, c.bucket,
             CAST(list_sum(list_transform(list_zip(c.qv, p.qp), s -> s[1] * s[2])) AS DOUBLE)
               / sqrt(CAST(c.n2 * p.n2p AS DOUBLE)) AS score
      FROM bucketed c JOIN probes p ON c.bucket = p.pbucket
      WHERE c.vec_id != p.query_id AND c.n2 > 0 AND p.n2p > 0
    )
    SELECT query_id, neighbor_id, bucket, score, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, neighbor_id) AS rank
      FROM scored
    ) t WHERE rank <= 3
    """


@register("ann_lsh_multiprobe", oracle=_multiprobe_oracle())
def ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN (Lv et al., VLDB'07): each probe searches its
    sign bucket plus all one-bit-flip neighbors — recall recovery without
    shrinking buckets.  Probe expansion explodes only the broadcast probe
    side; candidates stay Σ bucket², nowhere near n²."""
    emb = table(spark, sf_dir, "embeddings")
    return ops.lsh_multiprobe_topk(
        emb, "embedding", "vec_id", probe_filter=F.col("vid") < 10, k=3, bits=4
    ).select("query_id", "neighbor_id", "bucket", "score", "rank")


@register(
    "embedding_quantize_int8_report",
    oracle="""
    WITH e AS (
      SELECT CAST(unnest(embedding) AS DOUBLE) AS x,
             generate_subscripts(embedding, 1) AS dim
      FROM embeddings
    ), st AS (
      SELECT dim, MIN(x) AS mn, MAX(x) AS mx,
             (MAX(x) - MIN(x)) / 255.0 AS scale
      FROM e GROUP BY dim
    ), r AS (
      SELECT e.dim, st.mn, st.mx, st.scale,
             CASE WHEN st.scale > 0
                  THEN abs(e.x - (st.mn
                       + LEAST(255.0, GREATEST(0.0, round((e.x - st.mn) / st.scale)))
                         * st.scale))
                  ELSE 0.0 END AS err
      FROM e JOIN st USING (dim)
    )
    SELECT dim, mn, mx, scale, MAX(err) AS max_abs_err,
           COUNT(*) AS n_values
    FROM r GROUP BY dim, mn, mx, scale
    """,
)
def embedding_quantize_int8_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar-quantization audit for the embedding store (the SQ8
    compression step before ANN at 100 TB): per-dim min/max calibration,
    step size, and worst-case reconstruction error.  Two aggregates +
    one broadcast of the 64-row calibration; only order-independent
    reductions (MIN/MAX/COUNT) so the report hash-matches cross-engine."""
    return ops.int8_quantization_report(
        table(spark, sf_dir, "embeddings"), "embedding"
    )


@register(
    "ann_recall_report",
    oracle=f"""
    WITH n AS (
      SELECT vec_id, {_QUANT} AS qv,
             list_sum(list_transform({_QUANT}, x -> x * x)) AS n2
      FROM embeddings
    ), probes AS (
      SELECT vec_id AS query_id, qv AS qp, n2 AS n2p FROM n WHERE vec_id < 10
    ), bf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT p.query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY p.query_id
                 ORDER BY CAST(list_sum(list_transform(list_zip(c.qv, p.qp),
                                                       s -> s[1] * s[2])) AS DOUBLE)
                          / sqrt(CAST(c.n2 * p.n2p AS DOUBLE)) DESC,
                          c.vec_id) AS rank
        FROM n c, probes p
        WHERE c.vec_id != p.query_id AND c.n2 > 0 AND p.n2p > 0
      ) t WHERE rank <= 3
    ), bucketed AS (
      SELECT vec_id, qv, n2,
             (CASE WHEN qv[1] >= 0 THEN '1' ELSE '0' END)
             || (CASE WHEN qv[2] >= 0 THEN '1' ELSE '0' END)
             || (CASE WHEN qv[3] >= 0 THEN '1' ELSE '0' END)
             || (CASE WHEN qv[4] >= 0 THEN '1' ELSE '0' END) AS bucket
      FROM n
    ), lsh AS (
      SELECT query_id, neighbor_id FROM (
        SELECT p.query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY p.query_id
                 ORDER BY CAST(list_sum(list_transform(list_zip(c.qv, p.qp),
                                                       s -> s[1] * s[2])) AS DOUBLE)
                          / sqrt(CAST(c.n2 * p.n2p AS DOUBLE)) DESC,
                          c.vec_id) AS rank
        FROM bucketed c
        JOIN (SELECT b.vec_id AS query_id, b.qv AS qp, b.n2 AS n2p, b.bucket AS bp
              FROM bucketed b WHERE b.vec_id < 10) p
          ON c.bucket = p.bp
        WHERE c.vec_id != p.query_id AND c.n2 > 0 AND p.n2p > 0
      ) t WHERE rank <= 3
    )
    SELECT bf.query_id,
           CAST(COUNT(lsh.neighbor_id) AS BIGINT) AS n_hits,
           CAST(COUNT(lsh.neighbor_id) AS DOUBLE) / 3.0 AS recall_at_3
    FROM bf LEFT JOIN lsh
      ON bf.query_id = lsh.query_id AND bf.neighbor_id = lsh.neighbor_id
    GROUP BY bf.query_id
    """,
)
def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality evaluation: recall@3 of the LSH-bucketed search
    against the brute-force exact baseline, per probe — the measurement
    loop every production ANN deployment runs before trading exactness
    for speed (and what justifies nprobe/bits settings at 100 TB).
    Composes the two existing operators and joins their top-k sets; the
    brute-force side is the 'rerank' truth, so recall is exact."""
    emb = table(spark, sf_dir, "embeddings")
    bf = ops.cosine_topk(
        emb, "embedding", "vec_id", probe_filter=F.col("vid") < 10, k=3
    ).select("query_id", "neighbor_id")
    lsh = ops.lsh_cosine_topk(
        emb, "embedding", "vec_id", probe_filter=F.col("vid") < 10, k=3, bits=4
    ).select(
        F.col("query_id").alias("l_qid"), F.col("neighbor_id").alias("l_nid")
    )
    joined = bf.join(
        lsh,
        (F.col("query_id") == F.col("l_qid"))
        & (F.col("neighbor_id") == F.col("l_nid")),
        "left",
    )
    return joined.groupBy("query_id").agg(
        F.count("l_nid").alias("n_hits"),
        (F.count("l_nid").cast("double") / F.lit(3.0)).alias("recall_at_3"),
    )


@register(
    "decontaminate_semantic_cosine",
    oracle=f"""
    WITH n AS (
      SELECT vec_id, {_QUANT} AS qv,
             list_sum(list_transform({_QUANT}, x -> x * x)) AS n2
      FROM embeddings
    ), b AS MATERIALIZED (
      SELECT vec_id AS bench_id, qv AS qb, n2 AS n2b FROM n
      WHERE substring(md5(CAST(vec_id AS VARCHAR)), 1, 4) < '028f' AND n2 > 0
    ), t AS MATERIALIZED (
      SELECT vec_id AS train_id, qv, n2 FROM n
      WHERE substring(md5(CAST(vec_id AS VARCHAR)), 1, 4) >= '028f' AND n2 > 0
    ), flag AS (
      SELECT t.train_id,
             max(list_inner_product(t.qv, b.qb)
                 / sqrt(CAST(t.n2 * b.n2b AS DOUBLE))) AS max_cosine
      FROM t, b GROUP BY t.train_id
      HAVING max(list_inner_product(t.qv, b.qb)
                 / sqrt(CAST(t.n2 * b.n2b AS DOUBLE))) >= CAST(0.30 AS DOUBLE)
    )
    SELECT f.train_id, min(b.bench_id) AS bench_id, f.max_cosine
    FROM flag f JOIN t ON t.train_id = f.train_id, b
    WHERE list_inner_product(t.qv, b.qb)
          / sqrt(CAST(t.n2 * b.n2b AS DOUBLE)) = f.max_cosine
    GROUP BY f.train_id, f.max_cosine
    """,
)
def decontaminate_semantic_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space benchmark-leakage screen: every training vector
    whose max cosine to the (md5-split, content-deterministic, 1%%)
    held-out set is >= 0.30, with its best-matching benchmark id — the
    semantic complement of `decontaminate_ngram_overlap` (paraphrases
    share no n-grams but sit next to the benchmark in embedding space).
    The benchmark matrix is O(eval-suite) and ships in the task closure;
    the corpus is scored map-side in one vectorized BLAS kernel — zero
    corpus shuffle (operators/decontam.py:decontaminate_semantic).
    Oracle notes: `list_inner_product` over the integer-milli lists is a
    DOUBLE accumulation of products < 2^53 (exact, order-free) — 17x
    faster than the list_zip form, measured.  The (score desc, bench_id
    asc) argmax is TWO plain-aggregate passes — max score per train id,
    then min bench id among pairs hitting that exact double (same
    deterministic expression both passes, so equality is sound): the
    one-pass struct-max form was OS-KILLED at sf10 even standalone
    under a 28 GB limit (DuckDB's struct-max state escapes its memory
    accounting on a 4·10^8-row stream); this form ran in 145 s /
    0.7 GB."""
    from hotdog_spark.operators.decontam import decontaminate_semantic

    emb = table(spark, sf_dir, "embeddings")
    return decontaminate_semantic(
        emb, "vec_id", "embedding", test_frac=0.01, threshold=0.30
    )


def _pca_oracle(iters: int = 8) -> str:
    """Unrolled power iteration over the exact integer covariance,
    HUGEINT throughout; every normalization divides non-negative
    magnitudes only (symmetric truncation — engine-agnostic)."""
    vs = 1_000_000
    blocks = [
        f"""ex AS MATERIALIZED (
  SELECT vec_id AS rid, generate_subscripts({_QUANT}, 1) - 1 AS dim,
         CAST(unnest({_QUANT}) AS HUGEINT) AS x
  FROM embeddings
), nrow AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM embeddings
), sums AS (
  SELECT dim, SUM(x) AS s FROM ex GROUP BY dim
), cells AS MATERIALIZED (
  SELECT a.dim AS i, b.dim AS j, SUM(a.x * b.x) AS s_ij
  FROM ex a JOIN ex b ON a.rid = b.rid AND a.dim <= b.dim
  GROUP BY 1, 2
), covu AS (
  SELECT c.i, c.j,
         (SELECT n FROM nrow) * c.s_ij - sa.s * sb.s AS c
  FROM cells c JOIN sums sa ON sa.dim = c.i JOIN sums sb ON sb.dim = c.j
), covf AS MATERIALIZED (
  SELECT i, j, c FROM covu
  UNION ALL
  SELECT j, i, c FROM covu WHERE i < j
), dims AS (SELECT DISTINCT i AS dim FROM covf
), v0 AS (SELECT dim, CAST({vs} AS HUGEINT) AS v FROM dims)"""
    ]
    for k in range(iters):
        blocks.append(
            f"""w{k} AS MATERIALIZED (
  SELECT covf.i AS dim, SUM(covf.c * v.v) AS w
  FROM covf JOIN v{k} v ON covf.j = v.dim GROUP BY 1
),
m{k} AS (SELECT MAX(ABS(w)) AS m FROM w{k}),
v{k + 1} AS MATERIALIZED (
  SELECT dim,
         CASE WHEN w >= 0 THEN (w * {vs}) // (SELECT m FROM m{k})
              ELSE -(((-w) * {vs}) // (SELECT m FROM m{k})) END AS v
  FROM w{k}
)"""
        )
    blocks.append(
        f"""piv AS MATERIALIZED (
  SELECT v AS pv FROM v{iters} ORDER BY ABS(v) DESC, dim ASC LIMIT 1
), vf AS MATERIALIZED (
  SELECT dim, CASE WHEN (SELECT pv FROM piv) < 0 THEN -v ELSE v END AS v
  FROM v{iters}
), ray AS (
  SELECT CAST(SUM(covf.c * a.v * b.v) AS DOUBLE)
           / CAST((SELECT SUM(v * v) FROM vf) AS DOUBLE) AS rq
  FROM covf JOIN vf a ON covf.i = a.dim JOIN vf b ON covf.j = b.dim
)"""
    )
    return (
        "WITH "
        + ",\n".join(blocks)
        + """
SELECT CAST(dim AS INTEGER) AS dim, CAST(v AS BIGINT) AS component_scaled,
       (SELECT rq FROM ray) AS eigenvalue_est
FROM vf"""
    )


@register("embedding_pca_top_component", oracle=_pca_oracle())
def embedding_pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding covariance — the
    whitening/compression/drift-basis step — done the only way that
    scales: ONE Arrow-batched pass accumulates the exact integer Gram
    matrix (numpy X^T X per batch, d^2 cells per partition — shuffle
    volume independent of row count), and the fixed-count power
    iteration runs on the driver over 64x64 exact ints, touching no
    data.  The recurrence is integer floor arithmetic end-to-end (the
    single float is the final Rayleigh-quotient division), so the
    unrolled DuckDB oracle reproduces every bit.  Same decomposition as
    MLlib RowMatrix.computeGramianMatrix -> local eigensolve."""
    from hotdog_spark.operators.pca import pca_top_component

    emb = table(spark, sf_dir, "embeddings")
    return pca_top_component(spark, emb, "embedding", "vec_id", iters=8)


def _jl_signs(k_dims: int, d_dims: int):
    """±1 Rademacher sign matrix derived from md5("k:j") — deterministic,
    engine-replicable (DuckDB computes the same digests in SQL).  Public
    construction: Achlioptas 2003 database-friendly random projections."""
    import hashlib

    return [
        [
            1
            if int(hashlib.md5(f"{k}:{j}".encode()).hexdigest()[0], 16) >= 8
            else -1
            for j in range(d_dims)
        ]
        for k in range(k_dims)
    ]


@register(
    "embedding_random_projection",
    oracle=f"""
    WITH ex AS MATERIALIZED (
      SELECT vec_id, generate_subscripts({_QUANT}, 1) - 1 AS j,
             unnest({_QUANT}) AS x
      FROM embeddings
    ), signs AS MATERIALIZED (
      SELECT k.k, j.j,
             CASE WHEN strpos('89abcdef',
                    substring(md5(CAST(k.k AS VARCHAR) || ':' ||
                              CAST(j.j AS VARCHAR)), 1, 1)) > 0
                  THEN 1 ELSE -1 END AS s
      FROM (SELECT unnest(generate_series(0, 15)) AS k) k,
           (SELECT unnest(generate_series(0, 63)) AS j) j
    )
    SELECT ex.vec_id, signs.k,
           CAST(SUM(ex.x * signs.s) AS BIGINT) AS proj_value
    FROM ex JOIN signs ON ex.j = signs.j
    GROUP BY ex.vec_id, signs.k
    """,
)
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss dimensionality reduction 64 → 16 with a
    DETERMINISTIC Rademacher matrix (signs = md5("k:j") parity — the
    Achlioptas database-friendly construction, reproducible in SQL): the
    cheap pre-reduction ANN pipelines run before indexing.  Exact
    integer arithmetic end-to-end (quantized components × ±1 sums), so
    the projection hash-matches the oracle bit-for-bit.

    Scale shape: the 16×64 sign matrix is inlined as plan literals (the
    "model" is 1 KB); the projection is a pure map-side expression —
    zero shuffle, zero Python, whole-stage codegen'd — emitting
    (vec_id, k, proj_value) rows.  At 100 TB this is a single scan at
    full parallelism; the oracle pays a join because SQL lacks
    expression inlining, not because the operator needs one."""
    from pyspark.sql import functions as F

    from hotdog_spark.operators.similarity import with_quantized

    signs = _jl_signs(16, 64)
    base = with_quantized(table(spark, sf_dir, "embeddings"), "embedding", "vec_id")

    def proj(k: int):
        acc = None
        for j, s in enumerate(signs[k]):
            term = F.element_at("q", j + 1) if s > 0 else -F.element_at("q", j + 1)
            acc = term if acc is None else acc + term
        return acc.alias(f"p{k}")

    wide = base.select("vid", *[proj(k) for k in range(16)])
    return wide.select(
        F.col("vid").alias("vec_id"),
        F.posexplode(F.array(*[F.col(f"p{k}") for k in range(16)])).alias(
            "k", "proj_value"
        ),
    ).select("vec_id", F.col("k").cast("bigint").alias("k"), "proj_value")


@register(
    "mine_hard_negatives",
    oracle=f"""
    WITH n AS (
      SELECT vec_id, CAST(label AS BIGINT) AS label, {_QUANT} AS qv,
             list_sum(list_transform({_QUANT}, x -> x * x)) AS n2
      FROM embeddings
    ), c AS (
      SELECT vec_id AS cid, qv AS qc, n2 AS n2c FROM n
      WHERE vec_id < (SELECT GREATEST(8, LEAST(256, COUNT(*) // 250))
                      FROM embeddings)
    ), d AS (
      SELECT v.vec_id, v.label, v.qv, v.n2, c.cid,
             v.n2 + c.n2c
             - 2 * list_sum(list_transform(list_zip(v.qv, c.qc), s -> s[1] * s[2])) AS d2
      FROM n v, c
    ), cellr AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM d
    ), assigned AS (
      SELECT vec_id, label, qv, n2, cid AS cell FROM cellr WHERE rn = 1
    ), pcells AS (
      SELECT vec_id AS query_id, cid AS pcell FROM cellr WHERE rn <= 2
    ), pv AS (
      SELECT vec_id AS query_id, label AS plabel, qv AS qp, n2 AS n2p FROM n
    ), scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             CAST(list_sum(list_transform(list_zip(a.qv, pv.qp), s -> s[1] * s[2])) AS DOUBLE)
               / sqrt(CAST(a.n2 * pv.n2p AS DOUBLE)) AS score,
             pv.plabel AS query_label, a.label AS neighbor_label
      FROM assigned a
      JOIN pcells p ON a.cell = p.pcell
      JOIN pv ON pv.query_id = p.query_id
      WHERE a.vec_id != p.query_id AND a.label != pv.plabel
        AND a.n2 > 0 AND pv.n2p > 0
    )
    SELECT query_id, neighbor_id, score, query_label, neighbor_label, rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, neighbor_id) AS rank
      FROM scored
    ) t WHERE rank <= 2
    """,
)
def mine_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training (public practice:
    DPR, Karpukhin et al. 2020; SimCSE; sentence-transformers mining):
    for EVERY vector, the top-2 most-cosine-similar vectors of a
    DIFFERENT label — the negatives that actually move a contrastive
    loss, vs random negatives that are trivially far.

    Same scale shape as ``knn_graph_ivf`` (this IS that operator with a
    label-exclusion mask): IVF cells scaled to the corpus
    (C = clamp(n/250, 8, 256)) keep candidate volume linear; per-cell
    BLAS scoring; one cell-keyed shuffle; the label mask is a numpy
    boolean AND in the kernel — zero extra shuffle or pass."""
    emb = table(spark, sf_dir, "embeddings")
    n = emb.count()
    n_cells = max(8, min(256, n // 250))
    return ops.knn_graph_cells(
        emb, "embedding", "vec_id",
        centroid_filter=F.col("vid") < n_cells, k=2, nprobe=2,
        label_col="label",
    ).select(
        "query_id", "neighbor_id", "score", "query_label", "neighbor_label",
        "rank",
    )


_SIGNW = (
    "CAST(list_sum(list_transform(range(0, 32), i -> "
    "CASE WHEN CAST(embedding[i + {lo} + 1] AS DOUBLE) > 0 "
    "THEN (1::BIGINT << i) ELSE 0::BIGINT END)) AS BIGINT)"
)


@register(
    "ann_binary_hamming_topk",
    oracle=f"""
    WITH packed AS (
      SELECT vec_id, {_SIGNW.format(lo=0)} AS b_lo, {_SIGNW.format(lo=32)} AS b_hi
      FROM embeddings
    ), probes AS (
      SELECT vec_id AS query_id, b_lo AS p_lo, b_hi AS p_hi
      FROM packed WHERE vec_id < 10
    ), scored AS (
      SELECT p.query_id, c.vec_id AS neighbor_id,
             CAST(bit_count(xor(c.b_lo, p.p_lo))
                  + bit_count(xor(c.b_hi, p.p_hi)) AS BIGINT) AS hamming
      FROM packed c, probes p WHERE c.vec_id != p.query_id
    )
    SELECT query_id, neighbor_id, hamming, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY hamming, neighbor_id) AS rank
      FROM scored
    ) t WHERE rank <= 5
    """,
)
def ann_binary_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized ANN: 64 sign bits per embedding packed into two
    BIGINT halves, Hamming top-5 for 10 probes via bit_count(xor) —
    16 bytes and two popcounts per candidate instead of 256 bytes of
    float math (operators/similarity.py::binary_hamming_topk).  The
    32×-compression retrieval path every large-scale vector system
    offers; whole-stage-codegen projection + broadcast probes, no
    Python, no shuffle of the corpus."""
    emb = table(spark, sf_dir, "embeddings")
    return ops.binary_hamming_topk(
        emb, "embedding", "vec_id", probe_filter=F.col("vid") < 10, k=5
    ).select("query_id", "neighbor_id", "hamming", "rank")


@register(
    "ann_binary_recall_report",
    oracle=f"""
    WITH n AS (
      SELECT vec_id, {_QUANT} AS qv,
             list_sum(list_transform({_QUANT}, x -> x * x)) AS n2,
             {_SIGNW.format(lo=0)} AS b_lo, {_SIGNW.format(lo=32)} AS b_hi
      FROM embeddings
    ), probes AS (
      SELECT vec_id AS query_id, qv AS qp, n2 AS n2p, b_lo AS p_lo,
             b_hi AS p_hi
      FROM n WHERE vec_id < 10
    ), cos AS (
      SELECT p.query_id, c.vec_id AS neighbor_id,
             CAST(list_sum(list_transform(list_zip(c.qv, p.qp),
                                          s -> s[1] * s[2])) AS DOUBLE)
               / sqrt(CAST(c.n2 * p.n2p AS DOUBLE)) AS score
      FROM n c, probes p
      WHERE c.vec_id != p.query_id AND c.n2 > 0 AND p.n2p > 0
    ), exact_top AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, neighbor_id) AS r
        FROM cos) q WHERE r <= 5
    ), ham AS (
      SELECT p.query_id, c.vec_id AS neighbor_id,
             bit_count(xor(c.b_lo, p.p_lo))
               + bit_count(xor(c.b_hi, p.p_hi)) AS hamming
      FROM n c, probes p WHERE c.vec_id != p.query_id
    ), bin_top AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY hamming, neighbor_id) AS r
        FROM ham) q WHERE r <= 5
    ), o AS (
      SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
      FROM exact_top JOIN bin_top USING (query_id, neighbor_id)
      GROUP BY query_id
    )
    SELECT p.query_id, CAST(5 AS INTEGER) AS k,
           CAST(coalesce(o.n_overlap, 0) AS BIGINT) AS n_overlap
    FROM probes p LEFT JOIN o USING (query_id)
    """,
)
def ann_binary_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the binary (sign-bit Hamming) retrieval path against
    the exact integer-quantized cosine top-5 — the measurement behind
    shipping a 32x-compressed sign-bit index, completing the family's
    recall-report set (LSH, PQ, matryoshka, binary)
    (operators/similarity.py::binary_hamming_recall).  Zero-overlap
    probes still emit rows."""
    emb = table(spark, sf_dir, "embeddings")
    return ops.binary_hamming_recall(
        emb, "embedding", "vec_id", probe_filter=F.col("vid") < 10, k=5
    )
