"""Event-time window operator queries (batch-checkable streaming
semantics) over the `events` table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hotdog_spark.operators import windows as ops
from hotdog_spark.queries import register
from hotdog_spark.sources.batch import table


@register(
    "window_tumbling_events",
    oracle="""
    SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           event_type,
           COUNT(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def window_tumbling_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-aligned 1-hour tumbling windows (F.window) — identical in
    batch and streaming; with a watermark this is the standard
    late-data-tolerant streaming aggregation."""
    return ops.tumbling_counts(
        table(spark, sf_dir, "events"), "ts", "event_type", width="1 hour"
    )


@register(
    "window_session_events",
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ), flagged AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
           user_id,
           COUNT(*) AS n
    FROM sess GROUP BY user_id, sid
    """,
)
def window_session_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (F.session_window, 30-minute gap).  The
    oracle reproduces Spark's semantics (merge while next < last + gap;
    session end = last event + gap) with a gaps-and-islands query."""
    return ops.session_counts(
        table(spark, sf_dir, "events"), "ts", "user_id", gap="30 minutes"
    )


@register(
    "window_hopping_events",
    oracle="""
    WITH e AS (
      SELECT event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
    ), w AS (
      SELECT event_type,
             time_bucket(INTERVAL 30 MINUTE, ts) - (k * INTERVAL 30 MINUTE)
               AS window_start
      FROM e, (SELECT unnest([0, 1]) AS k) ks
    )
    SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, COUNT(*) AS n
    FROM w GROUP BY 1, 2
    """,
)
def window_hopping_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes: each event counted in
    exactly 2 overlapping windows (F.window with slide); the oracle
    reproduces the window family by explicit bucket arithmetic."""
    return ops.hopping_counts(
        table(spark, sf_dir, "events"), "ts", "event_type",
        width="1 hour", slide="30 minutes",
    )
