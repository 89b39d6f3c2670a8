"""Similarity search over embedding columns (array<float>).

Two paths, as a production vector pipeline would have:

* brute-force cosine top-k — the exactness baseline: broadcast the (small)
  probe set, score every corpus vector, per-probe top-k.  One shuffle on
  query_id.  At 100 TB this is the "rerank" stage, not the recall stage.
* LSH-bucketed ANN — sign-bucket on leading components (a fixed random
  hyperplane family degenerates to coordinate signs for a public,
  reproducible variant); candidates only within the probe's bucket, so the
  scored set shrinks by ~2^bits.  The scale path.

Determinism: embeddings are quantized to integers (round(x*1000)) before
any arithmetic, so dot products and norms are exact integers in every
engine; the only float ops are a sqrt and a divide on identical inputs,
which IEEE 754 makes bit-identical.  Ranking ties break on vec_id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from hotdog_spark.operators import fan_out


def quantized(col: Column, scale: int = 1000) -> Column:
    """array<float> → array<bigint> via round(x*scale): exact cross-engine."""
    return F.transform(col, lambda x: F.round(x * scale, 0).cast("bigint"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def _norm2(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x * x),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def with_quantized(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    return fan_out(df).select(
        F.col(id_col).alias("vid"),
        quantized(F.col(vec_col)).alias("q"),
    ).withColumn("n2", _norm2(F.col("q")))


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
            _dot(F.col("q"), F.col("q_probe")).cast("double")
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


def sign_bucket(qvec: Column, bits: int = 4) -> Column:
    """LSH bucket key: concatenated sign bits of the first ``bits``
    quantized components ('1' for ≥0, '0' for <0)."""
    return F.concat(
        *[
            F.when(F.element_at(qvec, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(bits)
        ]
    )


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
            _dot(F.col("q"), F.col("q_probe")).cast("double")
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
