"""Table-maintenance operators: small-file compaction.

The 100 TB failure mode this addresses: streaming sinks and
fine-grained batch jobs leave thousands of tiny parquet files per
partition; every downstream scan then pays per-file open/footer-read
overhead and the scheduler pays per-split bookkeeping (the classic
"small files problem").  Compaction rewrites a directory into files of
a target size — the same operation Delta's OPTIMIZE / Iceberg's
rewrite_data_files perform, expressed here with plain Spark.

Sizing is computed from the ACTUAL on-disk bytes (not row counts):
``ceil(total_bytes / target_file_bytes)`` output files, one per
partition.  ``repartition(n)`` (round-robin shuffle) is used rather
than ``coalesce(n)``: coalesce merges co-located input splits without
a shuffle — cheaper, but it inherits input skew, and a skewed 2 GB
file defeats the point of compaction; the round-robin shuffle buys
evenly-sized output, which is what table maintenance is for.  An
optional ``cluster_by`` instead repartitions BY RANGE on the given
columns and sorts within partitions — compaction and data-clustering
(the zorder/ORDER BY flavor of OPTIMIZE) in one rewrite, so scans can
prune on the clustered column's min/max per file.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def dir_parquet_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for the parquet data files under
    ``path`` (recursive; ignores _SUCCESS/_metadata sidecars).  Local
    filesystem walk — on an object store the same numbers come from the
    listing API or the table manifest."""
    n, total = 0, 0
    if os.path.isfile(path):
        return 1, os.path.getsize(path)
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def plan_compaction(
    total_bytes: int, target_file_bytes: int = 128 * 1024 * 1024
) -> int:
    """Output file count: ceil(total/target), minimum 1.  Pure function,
    unit-testable without a filesystem."""
    if target_file_bytes <= 0:
        raise ValueError("target_file_bytes must be positive")
    return max(1, math.ceil(total_bytes / target_file_bytes))


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
    target_file_bytes: int | None = None,
    target_rows_per_file: int | None = None,
    cluster_by: list[str] | None = None,
    sort_cols: list[str] | None = None,
) -> dict:
    """Rewrite the parquet data under ``src`` into ``dst`` as
    evenly-sized files.  Two sizing modes (exactly one, or neither for
    the 128 MiB byte default):

    * ``target_file_bytes`` — plan from ACTUAL on-disk bytes
      (ceil(total/target)); what OPTIMIZE implementations do.
    * ``target_rows_per_file`` — plan from the row count; the right
      dial when rows are uniform and byte-compression varies.

    Layout controls: ``cluster_by`` repartitions BY RANGE on the
    columns and sorts within partitions — compaction plus
    data-clustering in one rewrite (non-overlapping per-file ranges →
    min/max file pruning).  ``sort_cols`` sorts within partitions only
    (tightens row-group stats without changing row placement).

    Row-preserving by construction (pure read → repartition → write;
    the test suite pins the row multiset).  Writes to a NEW location —
    compaction must never rewrite in place under concurrent readers;
    swap via rename/catalog repoint.  Returns a report dict
    (input files/bytes, planned file count, rows).
    """
    n_in, total = dir_parquet_stats(src)
    df = spark.read.parquet(src)
    if target_rows_per_file is not None:
        n_rows_in = df.count()
        n_out = max(1, math.ceil(n_rows_in / target_rows_per_file))
    else:
        n_out = plan_compaction(total, target_file_bytes or 128 * 1024 * 1024)
    if cluster_by:
        out: DataFrame = df.repartitionByRange(n_out, *[F.col(c) for c in cluster_by])
        out = out.sortWithinPartitions(*cluster_by)
    else:
        out = df.repartition(n_out)
        if sort_cols:
            out = out.sortWithinPartitions(*sort_cols)
    writer = out.write.mode("overwrite")
    if target_rows_per_file is not None:
        writer = writer.option("maxRecordsPerFile", target_rows_per_file)
    writer.parquet(dst)
    n_rows = spark.read.parquet(dst).count()
    return {
        "input_files": n_in,
        "input_bytes": total,
        "planned_output_files": n_out,
        "rows": n_rows,
    }
