"""Funnel and retention queries over the `events` table (see
operators/analytics.py for the decorrelated scale shapes)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hotdog_spark.operators import analytics as ops
from hotdog_spark.queries import register
from hotdog_spark.sources.batch import table


@register(
    "funnel_view_click_purchase",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS tv
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS tc
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.tv
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS tp
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > c.tc
      GROUP BY e.user_id
    )
    SELECT 'view' AS stage, 1 AS stage_order, (SELECT COUNT(*) FROM v) AS users
    UNION ALL
    SELECT 'click', 2, (SELECT COUNT(*) FROM c)
    UNION ALL
    SELECT 'purchase', 3, (SELECT COUNT(*) FROM p)
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel view → click → purchase: per-stage survivor
    frontiers (earliest qualifying event per user) chained by
    min-timestamp joins — correlated sequence SQL decorrelated into keyed
    aggregates."""
    ev = table(spark, sf_dir, "events")
    return ops.funnel_counts(
        ev, "user_id", "event_type", "ts", ["view", "click", "purchase"]
    )


@register(
    "retention_weekly_cohorts",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, MIN(date_trunc('week', CAST(ts AS TIMESTAMP))) AS cohort_week
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id, date_trunc('week', CAST(ts AS TIMESTAMP)) AS active_week
      FROM events
    )
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort,
           CAST(date_diff('day', cohort_week, active_week) / 7 AS BIGINT)
             AS week_offset,
           COUNT(*) AS active_users
    FROM first_seen JOIN activity USING (user_id)
    GROUP BY 1, 2
    """,
)
def retention_weekly_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: first-seen week × activity-week
    offset × distinct active users — two aggregates over (user, week)."""
    return ops.weekly_retention(table(spark, sf_dir, "events"), "user_id", "ts")
