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


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Batch sessionization: split each user's event sequence wherever the
    gap to the previous event exceeds ``gap_seconds``; number the sessions
    by a running sum of the break flags (the gaps-and-islands idiom).

    Per user: one lag() + one cumulative sum, both on the SAME
    (user, ts)-sorted window — one keyed shuffle, one sort, no self-join.
    Adds ``session_id`` (0-based per user).

    ``tiebreak_col`` (e.g. a unique event id) makes the ROWS-frame
    cumulative sum deterministic when timestamps tie: ordering by ``ts``
    alone leaves tied rows in partition order, which is not stable across
    cluster sizes.  Pass it whenever ``(user, ts)`` is not provably unique.
    """
    from pyspark.sql.window import Window

    from hotdog_spark.operators import epoch_us

    order = [ts_col] if tiebreak_col is None else [ts_col, tiebreak_col]
    w = Window.partitionBy(user_col).orderBy(*order)
    gap = epoch_us(ts_col) - epoch_us(F.lag(ts_col).over(w))
    is_new = F.when(gap.isNull() | (gap > gap_seconds * 1_000_000), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        - 1,
    )


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-pass data-profiling summary: per column — non-null count, null
    count, distinct count, min and max (rendered as strings so mixed
    types stack into one long-format result).

    All columns profile in a SINGLE aggregate over one scan (the property
    that matters at 100 TB: profiling cost ≈ one table pass, not one pass
    per column), then unpivot driver-side — the wide row is 5×N scalar
    cells, never data-sized.
    """
    aggs = []
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            F.count_distinct(F.col(c)).alias(f"{c}__nd"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
            F.count(F.lit(1)).alias(f"{c}__n"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nn, {c}__nd, {c}__min, {c}__max, {c}__n - {c}__nn" for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(col_name, non_null, n_distinct, min_val, max_val, n_null)"
    )


def gap_filled_hourly_counts(df: DataFrame, ts_col: str) -> DataFrame:
    """Dense hourly event-rate series: truncate to hours, count, then
    LEFT-join the counts onto a generated hour spine spanning
    [min hour, max hour] so silent hours appear as explicit zeros — the
    densification every rate/anomaly model needs before differencing.

    The spine is one generated-and-exploded row (span/3600 rows total,
    time-bounded, never data-sized); the only data shuffle is the hourly
    count aggregate.  Returns (hr, n).
    """
    hourly = df.select(F.date_trunc("hour", F.col(ts_col)).alias("hr")).groupBy(
        "hr"
    ).agg(F.count(F.lit(1)).alias("n"))
    bounds = hourly.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hr")
    )
    return spine.join(hourly, "hr", "left").select(
        "hr", F.coalesce("n", F.lit(0)).alias("n")
    )


def snapshot_diff(
    old: DataFrame, new: DataFrame, key_col: str, compare_cols: list[str]
) -> DataFrame:
    """Diff two snapshots of a keyed table: full-outer join on the key,
    compare an md5 over the tracked columns, and label every key
    ``added`` / ``removed`` / ``changed`` / ``unchanged`` — the
    change-data-capture primitive for snapshot-only upstreams.

    One co-partitioned full-outer join on the key; the row hash makes the
    comparison one column regardless of width.  Returns (key, status).
    """
    def hashed(df: DataFrame, side: str) -> DataFrame:
        return df.select(
            F.col(key_col),
            F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in compare_cols]))
            .alias(f"_h_{side}"),
        )

    j = hashed(old, "old").join(hashed(new, "new"), key_col, "full_outer")
    status = (
        F.when(F.col("_h_old").isNull(), F.lit("added"))
        .when(F.col("_h_new").isNull(), F.lit("removed"))
        .when(F.col("_h_old") == F.col("_h_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(F.col(key_col), status.alias("status"))
