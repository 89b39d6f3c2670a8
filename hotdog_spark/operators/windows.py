"""Event-time windowing operators (streaming semantics, batch-checkable).

The reference has no event time, watermarks or windows (SURVEY.md §2.8) —
these are the extension operators a real stream pipeline needs.  Both
operators are plain aggregations usable identically in batch and
Structured Streaming; in streaming, pair them with ``withWatermark`` (see
streaming.runner.windowed_counts_stream).

* tumbling_counts — epoch-aligned fixed windows via ``F.window``.
* session_counts  — gap-based sessions via ``F.session_window``; the
  DuckDB oracle reproduces them with a gaps-and-islands query, pinning
  Spark's session semantics (end = last event + gap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    width: str = "1 hour",
) -> DataFrame:
    """Per-key counts in epoch-aligned tumbling windows."""
    return (
        df.groupBy(F.window(F.col(ts_col), width).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            key_col,
            "n",
        )
    )


def session_counts(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    gap: str = "30 minutes",
) -> DataFrame:
    """Per-key session windows: events within ``gap`` of each other merge;
    session end = last event + gap (Spark session_window semantics)."""
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_end"),
            key_col,
            "n",
        )
    )


def hopping_counts(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    width: str = "1 hour",
    slide: str = "30 minutes",
) -> DataFrame:
    """Per-key counts in overlapping (hopping/sliding) windows: each event
    lands in width/slide windows.  Same epoch alignment as tumbling."""
    return (
        df.groupBy(F.window(F.col(ts_col), width, slide).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            key_col,
            "n",
        )
    )
