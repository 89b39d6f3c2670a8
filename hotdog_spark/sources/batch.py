"""Batch sources: parquet table loading and raw-log file scans.

The parquet loads deliberately go through ``spark.read.parquet`` with no
options so predicate pushdown, column pruning and partition pruning all
remain available to Catalyst (verify with ``.explain``: PushedFilters /
ReadSchema).  At 100 TB these tables would be directory-partitioned and/or
bucketed; the helpers keep the call sites uniform so that swap is a
one-liner.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table from an sf directory.

    No per-table special cases: ``events.ts`` is plain ``timestamp[us]``
    with no timezone, which Spark 4 reads as ``TIMESTAMP_NTZ`` — the
    engine treats naive timestamps as first-class (all epoch math goes
    through the NTZ-safe ``hotdog_spark.operators.epoch_us``/``epoch_s``).
    ``scripts/presnapshot_gate.py`` probes the dtype so a testdata
    regeneration that changes it fails loudly instead of silently.
    """
    from hotdog_spark.dist import ensure_shipped

    ensure_shipped(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    return spark.read.parquet(path)


def read_log_file(spark: SparkSession, path: str) -> DataFrame:
    """Raw log file → one row per line (column ``value``) — the batch
    analog of the reference's test-mode file scan (src/rules.rs:16-57)."""
    return spark.read.text(path)


# Formats with full read+write support in this engine.  parquet/orc carry
# types natively; csv/json re-derive them (csv needs the declared schema —
# inference would widen ints; json needs it for nullable struct stability).
FORMATS = ("parquet", "orc", "json", "csv")


def write_table(df: DataFrame, path: str, fmt: str = "parquet", **options) -> None:
    """Write a DataFrame in any supported interchange format.  CSV gets a
    header so the file round-trips without positional guessing."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    w = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        w = w.option("header", "true")
    for k, v in options.items():
        w = w.option(k, v)
    w.save(path)


def read_table(spark: SparkSession, path: str, fmt: str = "parquet", schema=None) -> DataFrame:
    """Read any supported interchange format back.  Pass ``schema`` for
    csv/json to restore exact types (the scan still prunes columns and,
    for parquet/orc, pushes predicates — verify via .explain)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    r = spark.read.format(fmt)
    if schema is not None:
        r = r.schema(schema)
    if fmt == "csv":
        r = r.option("header", "true")
    return r.load(path)
