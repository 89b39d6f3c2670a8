"""Iterative graph algorithms over edge-list DataFrames, Pregel-style.

The reference engine (a stateless syslog router — see SURVEY.md §2) has
no graph surface; this module is part of the beyond-reference
LLM-pipeline toolkit: near-duplicate graphs (MinHash/LSH candidate
pairs, kNN edges) are what dedup and curation pipelines actually walk,
and rank/centrality over them is how "which copy do we keep" and
"which cluster is a content farm" get answered at corpus scale.

Design rules shared by every algorithm here:

* **Integer-exact arithmetic.**  Ranks are scaled integers and every
  update is a floor division — bigint sums are accumulation-order
  independent, so results are bit-identical across engines, partition
  counts, and reruns, and a DuckDB oracle can replay the exact same
  ops.  (Float PageRank diverges in the 15th digit on re-partitioning;
  an oracle comparison would flap.)
* **Pregel dataflow, not driver loops over collect().**  One iteration
  = join ranks to the (pre-partitioned, persisted) edge list on src,
  aggregate messages by dst, left-join back to the vertex set.  The
  corpus-sized state that moves per iteration is one (id, rank) row per
  vertex; edges are shuffled ONCE at build time, then reused.
* **Fixed iteration counts.**  Convergence-test loops hide an
  unbounded number of full-data passes; a fixed small ``iters`` is the
  honest contract at 100 TB (and what the oracle unrolls).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hotdog_spark.operators import track_persist

#: Global rank scale: ranks are expressed in units of 1/RANK_SCALE.
#: Must comfortably exceed the vertex count so the initial floor
#: division K // N keeps ≥6 significant digits — at 10^12 vertices
#: (≈100 TB of documents) raise it to 10^15; BIGINT holds sums to
#: 9.2e18 so total mass never overflows.
RANK_SCALE = 1_000_000_000_000

#: Vertex count above which the persisted edge table is explicitly
#: hash-partitioned on ``src`` before caching.  A cached join output
#: built via a broadcast reports no useful outputPartitioning, so every
#: PageRank iteration would re-exchange the full O(|E|) edge table to
#: align with the rank join; one repartition("src") at build time (at
#: spark.sql.shuffle.partitions, so it follows the cluster conf) lets
#: all ``iters`` joins reuse the cached layout.  Below the threshold the
#: graph is broadcast-sized and the extra exchange is pure overhead —
#: interleaved A/B at sf0.1 (5k vertices / 662 edges) measured the
#: always-on variant 1.1-1.2x SLOWER, so the gate derives from input
#: size rather than hard-coding either regime.
COPARTITION_MIN_VERTICES = 1_000_000


def symmetrize_edges(pairs: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Undirected (a, b) candidate pairs → directed (src, dst) both ways.

    Input pairs are assumed distinct with ``a < b`` (the LSH-pair
    contract), so the output has no duplicate edges and no self-loops.
    """
    fwd = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    rev = pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
    return fwd.unionByName(rev)


def pagerank_integer(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    iters: int = 3,
    damping_pct: int = 85,
    edge_dsts_in_vertices: bool = True,
    copartition: bool | None = None,
) -> DataFrame:
    """PageRank with exact integer arithmetic (public algorithm: Page &
    Brin 1998; the integer-scaled formulation is ours, chosen so the
    result is engine/order/partitioning-exact).

    Per iteration, with ``K = RANK_SCALE``, ``N = |V|``, ``d`` the
    damping numerator (``damping_pct``/100)::

        contrib(u) = r(u) // deg(u)              (floor, per out-edge)
        S(v)       = Σ_{(u,v) ∈ E} contrib(u)    (exact bigint sum)
        r'(v)      = ((100-d)·(K // N)) // 100  +  (d · S(v)) // 100

    Dangling-mass redistribution is intentionally omitted (vertices
    with no out-edges simply leak their mass): it would need an extra
    global aggregate per iteration, and for similarity graphs — whose
    symmetrized edges give every non-isolated vertex out-degree ≥ 1 —
    only isolated vertices dangle, holding exactly the teleport mass.
    Documented, deterministic, and replicated by the oracle.

    Scale shape: ``edges`` is joined to the per-vertex rank on ``src``
    and aggregated by ``dst`` — the two shuffles per iteration every
    distributed PageRank pays (Pregel/GraphX do the same).  The edge
    list (with its precomputed ``deg``) is persisted ONCE and reused
    across iterations, so per-iteration shuffle volume is O(|E|)
    message rows of (dst, bigint), never the corpus.  Driver state: the
    scalar N.  Returns (id, rank_scaled, degree) — degree 0 for
    isolated vertices, which hold exactly the teleport rank.

    ``edge_dsts_in_vertices=True`` (both in-repo callers: edges are
    symmetrized pairs over the vertex table itself) applies the rank
    update as ONE aggregate over the messages unioned with a
    zero-contribution row per vertex — the left join back to the vertex
    set disappears from every iteration, trading the O(|V|) vertex-side
    join exchange for the same O(|V|) rows riding the existing message
    shuffle.  Requires every edge ``dst`` to be a registered vertex
    (otherwise phantom rank rows would appear); pass ``False`` for
    arbitrary edge lists to get the join-based update with identical
    results — a regression test pins the two paths equal.

    ``copartition`` (default: auto at ``n >= COPARTITION_MIN_VERTICES``)
    hash-partitions the persisted edge table on ``src`` so every
    iteration's rank join reuses the cached layout instead of
    re-exchanging O(|E|) per iteration; see COPARTITION_MIN_VERTICES
    for why it is size-gated.
    """
    n = vertices.count()
    if n == 0:
        return vertices.select(
            F.col(id_col).alias("id"),
            F.lit(0).cast("bigint").alias("rank_scaled"),
            F.lit(0).cast("bigint").alias("degree"),
        )
    k = RANK_SCALE
    teleport = ((100 - damping_pct) * (k // n)) // 100  # exact Python int

    verts = track_persist(vertices.select(F.col(id_col).alias("id")))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # (src, dst, deg) persisted once; every iteration reuses it.
    if copartition is None:
        copartition = n >= COPARTITION_MIN_VERTICES
    e = edges.join(deg, "src")
    if copartition:
        e = e.repartition("src")
    e = track_persist(e)

    zero = verts.select(
        F.col("id").alias("dst"), F.lit(0).cast("bigint").alias("contrib")
    )
    ranks = verts.select("id", F.lit(k // n).cast("bigint").alias("r"))
    for _ in range(iters):
        msgs = (
            e.join(ranks.withColumnRenamed("id", "src"), "src")
            .select("dst", F.expr("r div deg").alias("contrib"))
        )
        if edge_dsts_in_vertices:
            # every group has >= 1 row (the zero row), so SUM is never
            # NULL and equals coalesce(s, 0) of the join-based form
            ranks = track_persist(
                msgs.unionByName(zero)
                .groupBy("dst")
                .agg(F.sum("contrib").alias("s"))
                .select(
                    F.col("dst").alias("id"),
                    (
                        F.lit(teleport).cast("bigint")
                        + F.expr(f"({damping_pct} * s) div 100")
                    ).alias("r"),
                )
            )
        else:
            ranks = track_persist(
                verts.join(
                    msgs.groupBy("dst").agg(F.sum("contrib").alias("s"))
                    .withColumnRenamed("dst", "id"),
                    "id",
                    "left",
                )
                .select(
                    "id",
                    (
                        F.lit(teleport).cast("bigint")
                        + F.expr(f"({damping_pct} * coalesce(s, 0)) div 100")
                    ).alias("r"),
                )
            )

    out_deg = deg.withColumnRenamed("src", "id")
    return (
        ranks.join(out_deg, "id", "left")
        .select(
            "id",
            F.col("r").alias("rank_scaled"),
            F.coalesce(F.col("deg"), F.lit(0)).cast("bigint").alias("degree"),
        )
    )


def degree_distribution(edges: DataFrame) -> DataFrame:
    """Histogram of out-degrees: (degree, n_vertices).  One keyed
    aggregate over the edge list then one over the (vertex, deg) rows —
    both map-side combinable; the hot-key / supernode detector run
    before any per-vertex iteration is attempted at scale."""
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_vertices"))
