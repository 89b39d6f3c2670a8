"""Event-analytics operators: ordered funnels and cohort retention.

The reference routes events into topics; the first questions anyone asks
of the routed stream are "how far do users get?" (funnel) and "do they
come back?" (retention).  Both are strict-ordering sequence analyses that
SQL engines express with correlated subqueries; here they are decorrelated
into min-timestamp joins so every step is a keyed aggregate + broadcast-or
shuffle join — no window over the whole event log, no per-user collect.

Scale shape: each funnel stage is one groupBy(user) aggregate (map-side
combinable) joined to the previous stage's (user, ts) — the per-stage
frontier is one row per surviving user, monotonically shrinking, so later
stages get cheaper.  Retention is two aggregates over (user, week).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    stages: list[str],
) -> DataFrame:
    """Strict-order funnel: a user reaches stage i+1 only with an event of
    that type strictly after their earliest qualifying stage-i event.

    Returns (stage, stage_order, users) — one row per stage.
    """
    frontier = None  # (user, t_prev): earliest qualifying time per survivor
    counts = []
    for i, stage in enumerate(stages):
        ev = df.filter(F.col(type_col) == stage).select(
            F.col(user_col).alias("user"), F.col(ts_col).alias("t")
        )
        if frontier is not None:
            ev = ev.join(frontier, "user").filter(F.col("t") > F.col("t_prev"))
        frontier = ev.groupBy("user").agg(F.min("t").alias("t_prev"))
        counts.append(
            frontier.agg(
                F.lit(stage).alias("stage"),
                F.lit(i + 1).alias("stage_order"),
                F.count(F.lit(1)).alias("users"),
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def weekly_retention(
    df: DataFrame, user_col: str, ts_col: str
) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen week, counted
    in each subsequent week they were active.

    Returns (cohort 'yyyy-MM-dd', week_offset bigint, active_users).
    """
    week = F.date_trunc("week", F.col(ts_col))
    first_seen = (
        df.select(F.col(user_col).alias("user"), week.alias("w"))
        .groupBy("user")
        .agg(F.min("w").alias("cohort_week"))
    )
    activity = (
        df.select(F.col(user_col).alias("user"), week.alias("active_week"))
        .distinct()
    )
    return (
        first_seen.join(activity, "user")
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort"),
            (F.datediff(F.col("active_week"), F.col("cohort_week")) / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
    )
