"""End-to-end batch pipeline: raw lines → parse → rule cascade → routed.

This is the batch twin of the streaming dataflow (reference lifecycle:
src/connection.rs:65-247).  The same compiled cascade drives both; only
the source/sink edges differ — which is exactly Structured Streaming's
unified-batch/stream model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hotdog_spark.config import Settings
from hotdog_spark.functions.syslog import parse_syslog_df
from hotdog_spark.plans.compiler import apply_cascade


def process_raw_lines(
    df: DataFrame,
    settings: Settings,
    column: str = "value",
    keep_dropped: bool = False,
    merge_mode: str = "exact",
) -> DataFrame:
    """Raw syslog lines → routed (topic, payload) records.

    Unparseable lines are dropped (count observable via
    ``metrics.with_parse_observer``); unrouted records are dropped unless
    ``keep_dropped``.
    """
    parsed = parse_syslog_df(df, column=column, drop_unparsed=True)
    return apply_cascade(parsed, settings, keep_dropped=keep_dropped, merge_mode=merge_mode)


def process_envelope(
    df: DataFrame,
    settings: Settings,
    keep_dropped: bool = False,
    merge_mode: str = "exact",
) -> DataFrame:
    """Already-parsed envelope records → routed (topic, payload)."""
    return apply_cascade(df, settings, keep_dropped=keep_dropped, merge_mode=merge_mode)


def routed_counts(df: DataFrame) -> DataFrame:
    """Per-topic record counts — the engine-side analog of the reference's
    per-topic statsd counters (src/sink/kafka.rs:170-186)."""
    return df.groupBy("topic").agg(F.count(F.lit(1)).alias("n"))
