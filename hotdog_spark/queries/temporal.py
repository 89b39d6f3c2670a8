"""Temporal-join queries over the `events` table.

Oracle note: `events.ts` is parquet TIMESTAMP(NANOS); both engines are
normalized to microseconds (Spark via sources.batch.table, DuckDB via
CAST(ts AS TIMESTAMP)) so the as-of/BETWEEN comparisons agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hotdog_spark.operators import temporal as ops
from hotdog_spark.queries import register
from hotdog_spark.sources.batch import table


@register(
    "asof_click_attribution",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
    ), clicks AS (
      SELECT user_id, ts, MAX(event_id) AS click_id
      FROM ev WHERE event_type = 'click' GROUP BY user_id, ts
    ), purch AS (
      SELECT event_id, user_id, ts FROM ev WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts,
           c.click_id AS asof_click_id, c.ts AS asof_ts
    FROM purch p ASOF JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase attributed to the user's most recent
    click at or before it.  Spark side is the union-carry-forward plan
    (one shuffle on user_id); the oracle is DuckDB's native ASOF JOIN —
    two independent implementations of the same semantics."""
    ev = table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    return ops.asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["click_id"],
        how="inner",
    ).select("event_id", "user_id", "ts", "asof_click_id", "asof_ts")


@register(
    "asof_nearest_click",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
    ), clicks AS (
      SELECT user_id, ts, MAX(event_id) AS click_id
      FROM ev WHERE event_type = 'click' GROUP BY user_id, ts
    ), purch AS (
      SELECT event_id, user_id, ts FROM ev WHERE event_type = 'purchase'
    ), b AS (
      SELECT p.event_id, c.click_id AS b_id, c.ts AS b_ts
      FROM purch p ASOF LEFT JOIN clicks c
        ON p.user_id = c.user_id AND p.ts >= c.ts
    ), f AS (
      SELECT p.event_id, c.click_id AS f_id, c.ts AS f_ts
      FROM purch p ASOF LEFT JOIN clicks c
        ON p.user_id = c.user_id AND p.ts <= c.ts
    )
    SELECT event_id, user_id, ts,
           CASE WHEN back_wins THEN b_id ELSE f_id END AS asof_click_id,
           CASE WHEN back_wins THEN b_ts ELSE f_ts END AS asof_ts
    FROM (
      SELECT p.event_id, p.user_id, p.ts, b.b_id, b.b_ts, f.f_id, f.f_ts,
             (f.f_ts IS NULL OR (b.b_ts IS NOT NULL
               AND epoch_us(p.ts) - epoch_us(b.b_ts)
                   <= epoch_us(f.f_ts) - epoch_us(p.ts))) AS back_wins
      FROM purch p
      JOIN b ON p.event_id = b.event_id
      JOIN f ON p.event_id = f.event_id
    ) t
    WHERE (CASE WHEN back_wins THEN b_ts ELSE f_ts END) IS NOT NULL
    """,
)
def asof_nearest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, ``direction='nearest'``: each purchase attached to the
    user's click CLOSEST in time, before or after (ties → backward —
    pandas merge_asof semantics).  Exercises the nearest branch of
    asof_join (operators/temporal.py:113-146), which evaluates both carry
    frames in ONE window pass over one keyed shuffle; the oracle is two
    DuckDB ASOF joins + per-row pick — independent implementations."""
    ev = table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    return ops.asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["click_id"],
        how="inner",
        direction="nearest",
    ).select("event_id", "user_id", "ts", "asof_click_id", "asof_ts")


@register(
    "range_join_error_window_clicks",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
    ), err AS (
      SELECT event_id AS error_id, user_id,
             ts AS start_ts, ts + INTERVAL 5 MINUTE AS end_ts
      FROM ev WHERE event_type = 'error'
    ), clk AS (
      SELECT event_id AS click_id, user_id, ts FROM ev WHERE event_type = 'click'
    )
    SELECT e.error_id, COUNT(*) AS n_clicks
    FROM clk c JOIN err e
      ON c.user_id = e.user_id AND c.ts BETWEEN e.start_ts AND e.end_ts
    GROUP BY e.error_id
    """,
)
def range_join_error_window_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join via bucketing: clicks landing inside each user's
    5-minute post-error window, counted per error.  The inequality join
    becomes an equi-join on (user_id, 300 s epoch bucket) + exact
    re-filter — the shape that survives 100 TB."""
    ev = table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("end_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    joined = ops.range_join_buckets(
        clicks,
        errors,
        on=["user_id"],
        point_ts="ts",
        start_ts="start_ts",
        end_ts="end_ts",
        bucket_seconds=300,
    )
    return joined.groupBy("error_id").agg(F.count(F.lit(1)).alias("n_clicks"))


@register(
    "timeseries_similar_users",
    oracle="""
    WITH hourly AS (
      SELECT user_id AS key, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
             CAST(round(SUM(CAST(value AS DECIMAL(18,4))) * 10000) AS BIGINT) AS v
      FROM events GROUP BY 1, 2
    ), probe AS (
      SELECT hr, v AS pv FROM hourly WHERE key = 1
    ), scored AS (
      SELECT h.key, CAST(SUM((h.v - p.pv) * (h.v - p.pv)) AS BIGINT) AS d2,
             COUNT(*) AS common_buckets
      FROM hourly h JOIN probe p USING (hr)
      WHERE h.key != 1
      GROUP BY h.key
      HAVING COUNT(*) >= 3
    )
    SELECT key, d2, common_buckets, rank FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY d2, key) AS rank FROM scored
    ) t WHERE rank <= 10
    """,
)
def timeseries_similar_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search: the 10 users whose hourly activity
    series sit closest (squared-L2 over shared buckets, integer-exact) to
    user 1's — probe broadcast, one aggregation shuffle, top-k."""
    from hotdog_spark.operators.temporal import timeseries_topk_similar

    ev = table(spark, sf_dir, "events")
    return timeseries_topk_similar(
        ev, "ts", "user_id", "value", probe_key=1, k=10, min_common=3
    )


@register(
    "upsert_latest_state",
    oracle="""
    SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts, value
    FROM events
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def upsert_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog → current state: latest event per (user, event_type) —
    batch upsert/log-compaction semantics, deterministic under timestamp
    ties via the event_id tiebreak.  One keyed shuffle."""
    from hotdog_spark.operators.temporal import latest_snapshot

    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", "ts", "value"
    )
    return latest_snapshot(ev, ["user_id", "event_type"], "ts", "event_id")


@register(
    "scd2_user_state_history",
    oracle="""
    SELECT user_id, event_id, event_type,
           CAST(ts AS TIMESTAMP) AS valid_from,
           LEAD(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS valid_to
    FROM events
    """,
)
def scd2_user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history build: each user event becomes a validity
    interval [valid_from, valid_to), NULL end = current — the
    point-in-time join target for feature backfills.  Pure lead()
    window, one keyed shuffle."""
    from hotdog_spark.operators.temporal import scd2_intervals

    ev = table(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "ts")
    return scd2_intervals(ev, ["user_id"], "ts", "event_id").select(
        "user_id", "event_id", "event_type", "valid_from", "valid_to"
    )


@register(
    "interval_overlap_error_bursts",
    oracle="""
    WITH err AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS s,
             CAST(ts AS TIMESTAMP) + INTERVAL 5 MINUTE AS e
      FROM events WHERE event_type = 'error'
    )
    SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
           epoch_us(least(a.e, b.e)) - epoch_us(greatest(a.s, b.s)) AS overlap_us
    FROM err a JOIN err b
      ON a.user_id = b.user_id AND a.event_id < b.event_id
     AND a.s <= b.e AND b.s <= a.e
    """,
)
def interval_overlap_error_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join: pairs of a user's 5-minute error
    windows that overlap (error bursts), with the exact overlap duration
    in microseconds.  The inequality pair join becomes a bucketed
    equi-join emitting each pair exactly once — no all-pairs blowup, no
    post-join distinct."""
    from hotdog_spark.operators.temporal import interval_overlap_join

    ev = table(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    win = F.expr("INTERVAL 5 MINUTES")
    a = ev.select(
        F.col("event_id").alias("a_id"),
        "user_id",
        F.col("ts").alias("a_s"),
        (F.col("ts") + win).alias("a_e"),
    )
    b = ev.select(
        F.col("event_id").alias("b_id"),
        F.col("user_id").alias("user_id_b"),
        F.col("ts").alias("b_s"),
        (F.col("ts") + win).alias("b_e"),
    ).withColumnRenamed("user_id_b", "user_id")
    from hotdog_spark.operators import epoch_us

    ov = interval_overlap_join(
        a, b, ["user_id"], "a_s", "a_e", "b_s", "b_e", bucket_seconds=300
    ).filter(F.col("a_id") < F.col("b_id"))
    return ov.select(
        "user_id",
        "a_id",
        "b_id",
        (
            epoch_us(F.least("a_e", "b_e"))
            - epoch_us(F.greatest("a_s", "b_s"))
        ).alias("overlap_us"),
    )


@register(
    "asof_forward_next_purchase",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
    ), purch AS (
      SELECT user_id, ts, MIN(event_id) AS purchase_id
      FROM ev WHERE event_type = 'purchase' GROUP BY user_id, ts
    ), clicks AS (
      SELECT event_id, user_id, ts FROM ev WHERE event_type = 'click'
    )
    SELECT c.event_id, c.user_id, c.ts,
           p.purchase_id AS asof_purchase_id, p.ts AS asof_ts
    FROM clicks c ASOF JOIN purch p
      ON c.user_id = p.user_id AND c.ts <= p.ts
    """,
)
def asof_forward_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, ``direction='forward'``: each click attached to the
    user's EARLIEST purchase at or after it — time-to-conversion's join
    step.  Completes the oracle-backed coverage of all three as-of
    directions (backward = click_attribution, nearest = nearest_click);
    same union-and-carry single-shuffle plan, carry running backward.
    Oracle: DuckDB's native forward ASOF JOIN (ts <=) — an independent
    implementation."""
    ev = table(spark, sf_dir, "events")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("purchase_id"))
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    return ops.asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["purchase_id"],
        how="inner",
        direction="forward",
    ).select("event_id", "user_id", "ts", "asof_purchase_id", "asof_ts")
