"""Graph queries over the LSH near-duplicate candidate graph.

Vertices are all documents; edges are the MinHash/LSH candidate pairs
(the exact pair set `dedup_minhash_lsh` emits and its oracle replays).
PageRank over this graph is the "which copy is the hub" signal a
curation pipeline uses when a near-dup cluster spans many sources.

Both sides compute in scaled integers (see
:mod:`hotdog_spark.operators.graph`): the oracle unrolls the same fixed
iteration count with the same floor divisions, so values hash-match
bit-for-bit at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hotdog_spark.operators import dedup as dedup_ops
from hotdog_spark.operators import graph as ops
from hotdog_spark.queries import register
from hotdog_spark.sources.batch import table

_TOKS = "string_split_regex(trim(lower(text)), '\\s+')"

# The LSH candidate-pair CTE chain — identical hashing to the
# dedup_minhash_lsh oracle (one md5 per shingle, 8 overlapping 15-hex
# band windows).
_PAIRS_CTES_BASE = f"""toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents
), sh AS (
  SELECT doc_id,
         CASE WHEN len(t) < 5 THEN [array_to_string(t, ' ')]
              ELSE [array_to_string(t[i:i+4], ' ')
                    for i in generate_series(1, len(t)-4)] END AS shingles
  FROM toks
), ex AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM sh
), sigs0 AS MATERIALIZED (
  SELECT doc_id, band, MIN(substring(md5(shingle), 2 * band + 1, 15)) AS sig
  FROM ex, (SELECT unnest(generate_series(0, 7)) AS band) b
  GROUP BY doc_id, band
), sigs AS MATERIALIZED (
  -- the LSH bucket cap, mirrored from the operator BEFORE the
  -- self-join (see queries/dedup.py)
  SELECT s.doc_id, s.band, s.sig FROM sigs0 s
  JOIN (SELECT band, sig FROM sigs0 GROUP BY band, sig
        HAVING COUNT(*) <= 1000) k USING (band, sig)
), pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sigs a JOIN sigs b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
), deg AS (
  SELECT src, COUNT(*) AS deg FROM edges GROUP BY src
), e AS (
  SELECT edges.src, edges.dst, deg.deg FROM edges JOIN deg USING (src)
), verts AS (
  SELECT doc_id AS id FROM documents
)"""

_PAIRS_CTES = (
    _PAIRS_CTES_BASE
    + f""", params AS (
  SELECT {ops.RANK_SCALE} // COUNT(*) AS r0,
         (15 * ({ops.RANK_SCALE} // COUNT(*))) // 100 AS teleport
  FROM documents
)"""
)


def _pagerank_oracle(iters: int = 3) -> str:
    blocks = [
        _PAIRS_CTES,
        "r0r AS (SELECT id, (SELECT r0 FROM params) AS r FROM verts)",
    ]
    for i in range(iters):
        blocks.append(
            f"""m{i} AS (
  SELECT e.dst AS id, SUM(r.r // e.deg) AS s
  FROM e JOIN r{i}r r ON e.src = r.id GROUP BY e.dst
),
r{i + 1}r AS (
  SELECT v.id,
         (SELECT teleport FROM params) + (85 * COALESCE(m.s, 0)) // 100 AS r
  FROM verts v LEFT JOIN m{i} m ON v.id = m.id
)"""
        )
    return (
        "WITH "
        + ",\n".join(blocks)
        + f"""
SELECT v.id AS doc_id, CAST(r.r AS BIGINT) AS rank_scaled,
       COALESCE(d.deg, 0) AS degree
FROM verts v JOIN r{iters}r r ON v.id = r.id
LEFT JOIN deg d ON v.id = d.src"""
    )


def _lsh_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hotdog_spark.operators import track_persist

    pairs = dedup_ops.minhash_lsh_pairs(
        table(spark, sf_dir, "documents"), "text", "doc_id", bands=8, k=5,
        max_bucket=1000,
    )
    # the edge table feeds EVERY PageRank iteration (and both sides of
    # the degree join): persist it once instead of re-running the full
    # shingle -> signature -> bucket-join lineage per iteration — at
    # data-lake scale the equivalent move is materializing the edge
    # list to a table before iterating
    return track_persist(ops.symmetrize_edges(pairs, "id_a", "id_b"))


@register("graph_pagerank_lsh", oracle=_pagerank_oracle())
def graph_pagerank_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 integer-exact iterations, damping 0.85) over the LSH
    near-dup candidate graph — the hub-copy signal per near-dup cluster.
    Isolated docs hold exactly the teleport rank; the rank ordering
    inside a connected component is the centrality ranking curation
    uses to pick the canonical copy.  Scale shape: the edge build is
    the proven LSH bucket join; each iteration shuffles one (dst,
    bigint) message per edge plus one (id, rank) row per doc — the
    Pregel minimum."""
    docs = table(spark, sf_dir, "documents")
    return (
        ops.pagerank_integer(
            docs.select("doc_id"), _lsh_edges(spark, sf_dir), id_col="doc_id"
        )
        .withColumnRenamed("id", "doc_id")
    )


@register(
    "graph_degree_distribution_lsh",
    oracle=f"""
    WITH {_PAIRS_CTES_BASE}
    SELECT deg AS degree, COUNT(*) AS n_vertices
    FROM deg GROUP BY deg
    """,
)
def graph_degree_distribution_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the LSH candidate graph: (degree,
    n_vertices).  The supernode detector — a heavy tail here means a
    degenerate signature bucket (boilerplate shingle) and predicts
    skew in every downstream per-vertex pass.  Two map-side-combinable
    aggregates; no per-vertex state reaches the driver."""
    return ops.degree_distribution(_lsh_edges(spark, sf_dir))
