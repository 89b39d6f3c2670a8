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


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    cluster_by: list[str] | None = None,
) -> dict:
    """Rewrite the parquet data under ``src`` into ``dst`` as
    evenly-sized files near ``target_file_bytes``.  Returns a report
    dict (files/bytes before, planned file count, rows).

    Row-preserving by construction (a pure read → repartition → write;
    no dedup, no filters) — the test suite pins the row multiset across
    the rewrite.  Compression ratios differ between the old and new
    files (bigger row groups encode better), so the planned count uses
    input bytes as the estimate, matching what OPTIMIZE implementations
    do on their first pass.
    """
    n_in, total = dir_parquet_stats(src)
    n_out = plan_compaction(total, target_file_bytes)
    df = spark.read.parquet(src)
    if cluster_by:
        out: DataFrame = df.repartitionByRange(n_out, *[F.col(c) for c in cluster_by])
        out = out.sortWithinPartitions(*cluster_by)
    else:
        out = df.repartition(n_out)
    out.write.mode("overwrite").parquet(dst)
    n_rows = spark.read.parquet(dst).count()
    return {
        "input_files": n_in,
        "input_bytes": total,
        "planned_output_files": n_out,
        "rows": n_rows,
    }
