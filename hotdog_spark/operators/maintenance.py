"""Data-lake maintenance operators: small-file compaction and file-level
statistics.

A streaming Parquet sink (streaming/sinks.py) emits one file per
partition per micro-batch — exactly the small-file problem every
long-running ingest accumulates.  At 100 TB, scan throughput is gated by
file count (task scheduling + footer reads dominate), so periodic
compaction IS a first-class operator, not an afterthought.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def file_stats(spark: SparkSession, path: str) -> DataFrame:
    """Per-file row counts for a parquet dataset — the health metric that
    decides when to compact.  Distributed: input_file_name() is evaluated
    on executors; only (file, count) rows reach the driver."""
    return (
        spark.read.parquet(path)
        .select(F.input_file_name().alias("file"))
        .groupBy("file")
        .agg(F.count(F.lit(1)).alias("rows"))
    )


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_rows_per_file: int = 1_000_000,
    sort_cols: list[str] | None = None,
) -> int:
    """Rewrite a many-small-files parquet dataset into ~target-sized
    files; returns the output file count.

    ``sort_cols`` additionally clusters rows within files
    (sortWithinPartitions — NOT a global sort), which tightens parquet
    min/max column stats so later selective scans skip whole row groups.
    Writes to a new location (``dst``) — compaction must never rewrite
    in place under concurrent readers; swap via rename/catalog repoint.
    """
    df = spark.read.parquet(src)
    n_rows = df.count()
    n_files = max(1, math.ceil(n_rows / target_rows_per_file))
    out = df.repartition(n_files)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode("overwrite").option(
        "maxRecordsPerFile", target_rows_per_file
    ).parquet(dst)
    return n_files
