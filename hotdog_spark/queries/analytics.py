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


@register(
    "anomaly_hourly_event_rates",
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)),
                      '%Y-%m-%d %H:%M:%S') AS hr,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ), stats AS (
      SELECT event_type,
             SUM(n) AS total, SUM(n * n) AS sumsq, COUNT(*) AS cnt
      FROM hourly GROUP BY event_type
    )
    SELECT h.event_type, h.hr, h.n,
           (CAST(h.n AS DOUBLE) - CAST(s.total AS DOUBLE) / s.cnt)
             / sqrt(CAST(s.sumsq AS DOUBLE) / s.cnt
                    - (CAST(s.total AS DOUBLE) / s.cnt)
                      * (CAST(s.total AS DOUBLE) / s.cnt)) AS zscore
    FROM hourly h JOIN stats s USING (event_type)
    WHERE CAST(s.sumsq AS DOUBLE) / s.cnt
          - (CAST(s.total AS DOUBLE) / s.cnt) * (CAST(s.total AS DOUBLE) / s.cnt) > 0
      AND abs(CAST(h.n AS DOUBLE) - CAST(s.total AS DOUBLE) / s.cnt)
          > 2 * sqrt(CAST(s.sumsq AS DOUBLE) / s.cnt
                     - (CAST(s.total AS DOUBLE) / s.cnt)
                       * (CAST(s.total AS DOUBLE) / s.cnt))
    """,
)
def anomaly_hourly_event_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate anomaly detection: hours whose event count sits >2σ from the
    type's mean.  Moments come from exact integer sums (total, sum of
    squares, hour count), so mean/σ/z reproduce bit-identically in IEEE
    doubles on any engine — the alerting query a topic-routing pipeline
    runs over its own flow metrics.  Two aggregates + a broadcast-sized
    stats join; no window over raw events."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    e = table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(
            "event_type",
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hr"
            ),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    stats = hourly.groupBy(F.col("event_type").alias("s_type")).agg(
        F.sum("n").alias("total"),
        F.sum(F.col("n") * F.col("n")).alias("sumsq"),
        F.count(F.lit(1)).alias("cnt"),
    )
    mean = F.col("total").cast("double") / F.col("cnt")
    var = F.col("sumsq").cast("double") / F.col("cnt") - mean * mean
    std = F.sqrt(var)
    z = (F.col("n").cast("double") - mean) / std
    return (
        hourly.join(broadcast(stats), hourly.event_type == F.col("s_type"))
        .filter((var > 0) & (F.abs(F.col("n").cast("double") - mean) > 2 * std))
        .select("event_type", "hr", "n", z.alias("zscore"))
    )


@register(
    "anomaly_mad_hourly_rates",
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)),
                      '%Y-%m-%d %H:%M:%S') AS hr,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ), c AS (
      SELECT event_type, COUNT(*) AS cnt FROM hourly GROUP BY event_type
    ), med AS (
      SELECT event_type, n AS med_n FROM (
        SELECT h.event_type, h.n, c.cnt,
               ROW_NUMBER() OVER (PARTITION BY h.event_type ORDER BY h.n) AS rn
        FROM hourly h JOIN c USING (event_type)
      ) WHERE rn = CAST(CEIL(0.5 * cnt) AS BIGINT)
    ), dev AS (
      SELECT h.event_type, h.hr, h.n, m.med_n,
             ABS(h.n - m.med_n) AS d
      FROM hourly h JOIN med m USING (event_type)
    ), mad AS (
      SELECT event_type, d AS mad_n FROM (
        SELECT v.event_type, v.d, c.cnt,
               ROW_NUMBER() OVER (PARTITION BY v.event_type ORDER BY v.d) AS rn
        FROM dev v JOIN c USING (event_type)
      ) WHERE rn = CAST(CEIL(0.5 * cnt) AS BIGINT)
    )
    SELECT v.event_type, v.hr, v.n AS n_events, v.med_n, mad.mad_n,
           (v.d > 3 * mad.mad_n) AS is_anomaly
    FROM dev v JOIN mad USING (event_type)
    """,
)
def anomaly_mad_hourly_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust rate anomaly detection: per event type, flag hours whose
    count deviates from the type's MEDIAN hourly count by more than
    3× the median absolute deviation (MAD).  The robust twin of
    `anomaly_hourly_event_rates`: mean/σ are dragged by the very
    outliers being hunted (one traffic spike inflates σ enough to hide
    a second), while median/MAD have a 50% breakdown point — the
    alerting rule monitoring literature actually recommends for bursty
    rates (Hampel filter, public).

    Integer-exact end to end: counts, type-1 medians (value at rank
    ceil(cnt/2)), absolute deviations, and the 3·MAD compare are all
    bigint ops, so both engines agree bit-for-bit — no σ-style float
    chain at all.  MAD = 0 (a type flat at its median most hours)
    flags ANY deviating hour, the documented razor-edge of the rule.

    Scale shape: the raw event stream is touched by ONE map-side
    combinable aggregate; medians are rank selections over the
    (type × hour) table, whose size is bounded by the TIME SPAN, not
    the corpus (a year of hourly buckets is 8 760 rows per type), so
    the two per-type rank windows and the broadcast joins back are
    fixed-cost at any data size."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast
    from pyspark.sql.window import Window

    from hotdog_spark.operators import track_persist

    e = table(spark, sf_dir, "events")
    # persisted: four consumers (cnt, median rank, deviations, final
    # join) would otherwise each re-run the corpus-sized aggregate
    hourly = track_persist(
        e.groupBy(
            "event_type",
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hr"
            ),
        ).agg(F.count(F.lit(1)).alias("n"))
    )
    cnt = hourly.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
    target = F.ceil(F.col("cnt") * 0.5)

    ranked_n = hourly.withColumn(
        "rn", F.row_number().over(Window.partitionBy("event_type").orderBy("n"))
    )
    med = (
        ranked_n.join(broadcast(cnt), "event_type")
        .filter(F.col("rn") == target)
        .select("event_type", F.col("n").alias("med_n"))
    )
    dev = hourly.join(broadcast(med), "event_type").withColumn(
        "d", F.abs(F.col("n") - F.col("med_n"))
    )
    ranked_d = dev.withColumn(
        "rn", F.row_number().over(Window.partitionBy("event_type").orderBy("d"))
    )
    mad = (
        ranked_d.join(broadcast(cnt), "event_type")
        .filter(F.col("rn") == target)
        .select("event_type", F.col("d").alias("mad_n"))
    )
    return dev.join(broadcast(mad), "event_type").select(
        "event_type",
        "hr",
        F.col("n").alias("n_events"),
        "med_n",
        "mad_n",
        (F.col("d") > 3 * F.col("mad_n")).alias("is_anomaly"),
    )


@register(
    "activity_streak_islands",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d
      FROM events
    ), numbered AS (
      SELECT user_id, d,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS rn
      FROM days
    )
    SELECT user_id,
           strftime(MIN(d), '%Y-%m-%d') AS streak_start,
           strftime(MAX(d), '%Y-%m-%d') AS streak_end,
           COUNT(*) AS n_days
    FROM numbered
    GROUP BY user_id, d - TO_DAYS(CAST(rn AS INT))
    HAVING COUNT(*) >= 7
    """,
)
def activity_streak_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive active days per user
    (date minus row-number is constant within a run), keeping 7-day+
    streaks.  One distinct + one window + one aggregate, all partitioned
    by user — the sequence shape behind retention streaks and SLA-gap
    audits."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    e = table(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    numbered = days.withColumn("rn", F.row_number().over(w))
    island = F.date_sub(F.col("d"), F.col("rn"))
    return (
        numbered.groupBy("user_id", island.alias("_island"))
        .agg(
            F.date_format(F.min("d"), "yyyy-MM-dd").alias("streak_start"),
            F.date_format(F.max("d"), "yyyy-MM-dd").alias("streak_end"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .filter(F.col("n_days") >= 7)
        .drop("_island")
    )


@register(
    "sessionize_user_events",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ), lagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS brk
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts,
             CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) - 1
                  AS BIGINT) AS session_id
      FROM lagged
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS start_ts, MAX(ts) AS end_ts,
           epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
    FROM sess GROUP BY user_id, session_id
    """,
)
def sessionize_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (30-min inactivity gap): gaps-and-islands
    lag + running-sum on ONE (user, ts) sorted window, then per-session
    stats on the same keys — one shuffle, no self-join.  The batch twin
    of the streaming session_window query."""
    from pyspark.sql import functions as F

    from hotdog_spark.operators.analytics import sessionize

    from hotdog_spark.operators import epoch_us

    ev = table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    s = sessionize(ev, "user_id", "ts", gap_seconds=1800, tiebreak_col="event_id")
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("start_ts"),
        F.max("ts").alias("end_ts"),
        (epoch_us(F.max("ts")) - epoch_us(F.min("ts"))).alias("duration_us"),
    )


@register(
    "profile_orders_columns",
    oracle="""
    SELECT 'o_custkey' AS col_name, COUNT(o_custkey) AS non_null,
           COUNT(DISTINCT o_custkey) AS n_distinct,
           CAST(MIN(o_custkey) AS VARCHAR) AS min_val,
           CAST(MAX(o_custkey) AS VARCHAR) AS max_val,
           COUNT(*) - COUNT(o_custkey) AS n_null FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(o_orderstatus), COUNT(DISTINCT o_orderstatus),
           CAST(MIN(o_orderstatus) AS VARCHAR), CAST(MAX(o_orderstatus) AS VARCHAR),
           COUNT(*) - COUNT(o_orderstatus) FROM orders
    UNION ALL
    SELECT 'o_orderpriority', COUNT(o_orderpriority), COUNT(DISTINCT o_orderpriority),
           CAST(MIN(o_orderpriority) AS VARCHAR), CAST(MAX(o_orderpriority) AS VARCHAR),
           COUNT(*) - COUNT(o_orderpriority) FROM orders
    UNION ALL
    SELECT 'o_orderdate', COUNT(o_orderdate), COUNT(DISTINCT o_orderdate),
           CAST(MIN(o_orderdate) AS VARCHAR), CAST(MAX(o_orderdate) AS VARCHAR),
           COUNT(*) - COUNT(o_orderdate) FROM orders
    """,
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling summary (null/distinct/min/max per column) computed
    in ONE aggregate over ONE scan — profiling cost stays a single table
    pass at any width, never a pass per column."""
    from hotdog_spark.operators.analytics import profile_columns

    return profile_columns(
        table(spark, sf_dir, "orders"),
        ["o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate"],
    )


@register(
    "gap_filled_hourly_rates",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr, COUNT(*) AS n
      FROM events GROUP BY 1
    ), b AS (SELECT MIN(hr) AS lo, MAX(hr) AS hi FROM hourly),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr FROM b
    )
    SELECT spine.hr, COALESCE(hourly.n, 0) AS n
    FROM spine LEFT JOIN hourly USING (hr)
    """,
)
def gap_filled_hourly_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly event rates: silent hours appear as explicit zeros via
    a generated hour spine (time-bounded, never data-sized) — the
    densification step before any differencing/anomaly model."""
    from hotdog_spark.operators.analytics import gap_filled_hourly_counts

    return gap_filled_hourly_counts(table(spark, sf_dir, "events"), "ts")


@register(
    "snapshot_diff_orders",
    oracle="""
    WITH old AS (
      SELECT o_orderkey, CAST(o_totalprice AS VARCHAR) AS h
      FROM orders WHERE o_orderkey % 10 != 3
    ), new AS (
      SELECT o_orderkey,
             CAST(CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1
                       ELSE o_totalprice END AS VARCHAR) AS h
      FROM orders WHERE o_orderkey % 10 != 7
    ), d AS (
      SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
             CASE WHEN old.o_orderkey IS NULL THEN 'added'
                  WHEN new.o_orderkey IS NULL THEN 'removed'
                  WHEN old.h = new.h THEN 'unchanged'
                  ELSE 'changed' END AS status
      FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
    )
    SELECT status, COUNT(*) AS n, MIN(o_orderkey) AS min_key
    FROM d GROUP BY status
    """,
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-diff CDC: two simulated snapshots of `orders` (disjoint
    key slices removed/added, every 5th price bumped) full-outer-joined on
    the key with a row hash — added/removed/changed/unchanged labels in
    one co-partitioned join."""
    from pyspark.sql import functions as F

    from hotdog_spark.operators.analytics import snapshot_diff

    o = table(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderkey") % 10 != 3).select("o_orderkey", "o_totalprice")
    new = o.filter(F.col("o_orderkey") % 10 != 7).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 1)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    d = snapshot_diff(old, new, "o_orderkey", ["o_totalprice"])
    return d.groupBy("status").agg(
        F.count(F.lit(1)).alias("n"), F.min("o_orderkey").alias("min_key")
    )


def _zorder_terms_sql(x: str, y: str, bits: int = 10) -> str:
    xt = " + ".join(f"((({x} >> {b}) & 1) << {2 * b})" for b in range(bits))
    yt = " + ".join(f"((({y} >> {b}) & 1) << {2 * b + 1})" for b in range(bits))
    return f"({xt} + {yt})"


@register(
    "export_zorder_tiles",
    oracle=f"""
    WITH keyed AS (
      SELECT user_id,
             CAST((EXTRACT(day FROM CAST(ts AS TIMESTAMP)) - 1) * 24
                  + EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) AS BIGINT) AS hour_idx
      FROM events
    ), z AS (
      SELECT user_id, hour_idx,
             {_zorder_terms_sql("(user_id & 1023)", "(hour_idx & 1023)")} >> 12 AS tile_id
      FROM keyed
    )
    SELECT tile_id, COUNT(*) AS n_events,
           MIN(user_id) AS min_user, MAX(user_id) AS max_user,
           MIN(hour_idx) AS min_hour, MAX(hour_idx) AS max_hour
    FROM z GROUP BY tile_id
    """,
)
def export_zorder_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering manifest — the data-skipping layout
    step (Delta/Iceberg OPTIMIZE ZORDER BY): events keyed by the bit
    interleave of (user_id, hour-of-month), tiled by the morton prefix.
    Each tile's min/max on BOTH dimensions is tight, so a predicate on
    either column prunes most tiles — the per-file stats a 100 TB lake
    layout lives on.  Plan: pure bit-arithmetic projection + ONE hash
    aggregate on tile_id; the full layout job would range-sort by the
    same key before writing, identical plan shape at any scale."""
    from pyspark.sql import functions as F

    from hotdog_spark.operators.sampling import zorder_key

    e = table(spark, sf_dir, "events")
    keyed = e.select(
        "user_id",
        (
            (F.dayofmonth("ts").cast("bigint") - 1) * 24
            + F.hour("ts").cast("bigint")
        ).alias("hour_idx"),
    )
    z = keyed.select(
        "user_id",
        "hour_idx",
        F.shiftright(
            zorder_key(
                F.col("user_id").bitwiseAND(F.lit(1023)),
                F.col("hour_idx").bitwiseAND(F.lit(1023)),
            ),
            12,
        ).alias("tile_id"),
    )
    return z.groupBy("tile_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("user_id").alias("min_user"),
        F.max("user_id").alias("max_user"),
        F.min("hour_idx").alias("min_hour"),
        F.max("hour_idx").alias("max_hour"),
    )


@register(
    "incremental_hourly_event_rollup",
    oracle="""
    SELECT event_type,
           strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)),
                    '%Y-%m-%d %H:%M:%S') AS hr,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)) AS BIGINT) AS sum_value_q,
           MIN(CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)) AS min_value_q,
           MAX(CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)) AS max_value_q,
           CAST(SUM(CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)) AS DOUBLE)
             / COUNT(*) AS avg_value_q
    FROM events
    GROUP BY 1, 2
    """,
)
def incremental_hourly_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance, proven equal to a full
    rebuild: the hourly per-type rollup is built as MERGEABLE STATE
    (count / integer sum / min / max — the commutative-monoid measures)
    from two disjoint slices aggregated independently (a 20-day "stored
    view" and a 10-day "new batch", split at a fixed cutoff), merged
    key-wise, then finalized (avg derived from the merged sums at read
    time).  The oracle is the from-scratch rollup over ALL rows —
    hash-equality IS the maintenance-correctness proof.

    Scale shape: this is how a 100 TB rolled-up view absorbs a new
    partition without rescanning history — each slice's aggregate
    touches only its own rows (map-side combinable), and the merge's
    input is view-sized (event_type x hour rows), never data-sized.
    Values quantized via the proven double -> DECIMAL(18,4) path so the
    merge is exact integers and order-free; avg is a single IEEE
    division, identical cross-engine.
    """
    from pyspark.sql import functions as F

    from hotdog_spark.operators import incremental as inc

    e = table(spark, sf_dir, "events").select(
        "event_type",
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hr"),
        "ts",
        (F.col("value").cast("decimal(18,4)") * 10000).cast("bigint").alias("vq"),
    )
    cutoff = F.lit("2024-01-21 00:00:00").cast("timestamp_ntz")
    base = e.filter(F.col("ts") < cutoff)
    delta = e.filter(F.col("ts") >= cutoff)
    state = inc.merge_states(
        inc.aggregate_state(base, ["event_type", "hr"], F.col("vq")),
        inc.aggregate_state(delta, ["event_type", "hr"], F.col("vq")),
    )
    return inc.finalize_state(state)


@register(
    "quantile_exact_multipass_price",
    oracle="""
    WITH v AS (
      SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS value
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    ), o AS (
      SELECT value, ROW_NUMBER() OVER (ORDER BY value) AS rn FROM v
    ), n AS (SELECT COUNT(*) AS n FROM v
    ), r AS (
      SELECT 'p50' AS q_label,
             GREATEST(1, CAST(CEIL(0.50 * (SELECT n FROM n)) AS BIGINT)) AS target_rank
      UNION ALL
      SELECT 'p95', GREATEST(1, CAST(CEIL(0.95 * (SELECT n FROM n)) AS BIGINT))
      UNION ALL
      SELECT 'p99', GREATEST(1, CAST(CEIL(0.99 * (SELECT n FROM n)) AS BIGINT))
    )
    SELECT r.q_label, r.target_rank, o.value
    FROM r JOIN o ON o.rn = r.target_rank
    """,
)
def quantile_exact_multipass_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT p50/p95/p99 of l_extendedprice (in cents) with NO global
    sort: iterative histogram refinement — each round is one map-side
    combinable aggregate binning the candidate range into 4096 equal
    buckets, the driver locates the target rank's bucket (O(buckets)
    state) and recurses into it; all three quantiles share each scan
    via an array-explode classification.  TWO total passes for a money
    domain (the clamped coarse histogram narrows every quantile
    straight to the exact tail — r12) vs the full range-partitioned
    shuffle a sort-based exact quantile costs, and vs
    percentile_approx's error bars.  The oracle
    is the brute-force ROW_NUMBER rank selection — same type-1
    semantics (rank = ceil(q*n), duplicates counted), exact match
    required."""
    from pyspark.sql import functions as F

    from hotdog_spark.operators.quantiles import exact_quantiles_df

    li = table(spark, sf_dir, "lineitem").select(
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents")
    )
    return exact_quantiles_df(
        spark, li, "cents", [0.50, 0.95, 0.99], ["p50", "p95", "p99"]
    )


@register(
    "winsorize_event_values",
    oracle="""
    WITH v AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS q_val
      FROM events WHERE value IS NOT NULL
    ), nn AS (SELECT COUNT(*) AS n FROM v
    ), r AS (
      SELECT q_val, ROW_NUMBER() OVER (ORDER BY q_val) AS rn FROM v
    ), lo AS (
      SELECT q_val AS lo FROM r
      WHERE rn = (SELECT GREATEST(1, CAST(CEIL(0.01 * n) AS BIGINT)) FROM nn)
    ), hi AS (
      SELECT q_val AS hi FROM r
      WHERE rn = (SELECT GREATEST(1, CAST(CEIL(0.99 * n) AS BIGINT)) FROM nn)
    )
    SELECT event_type, COUNT(*) AS n_events,
           CAST(SUM(GREATEST((SELECT lo FROM lo),
                             LEAST((SELECT hi FROM hi), q_val))) AS BIGINT)
             AS sum_winsor_q,
           COUNT(CASE WHEN q_val < (SELECT lo FROM lo) THEN 1 END)
             AS n_clamped_low,
           COUNT(CASE WHEN q_val > (SELECT hi FROM hi) THEN 1 END)
             AS n_clamped_high
    FROM v GROUP BY event_type
    """,
)
def winsorize_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized per-type value aggregates: clamp every event value to
    the corpus-wide EXACT [p1, p99] band, then aggregate — the standard
    robust-mean treatment for metrics whose tails are fat or corrupt
    (a handful of 10^6-valued rows otherwise own every per-type sum).

    Composes the multipass exact-quantile operator: the two global cut
    points come back to the driver as two scalars (two jobs, no
    global sort — see `quantile_exact_multipass_price`), then one
    map-side-combinable aggregate applies the clamp inline.  Values
    ride the proven double → DECIMAL(18,4) quantizer so the clamp
    compares and the sums accumulate in exact bigints — the oracle's
    brute-force ROW_NUMBER rank selection lands on the identical
    quanta.  Returns (event_type, n_events, sum_winsor_q,
    n_clamped_low, n_clamped_high); the clamp counts are the
    tail-health report (a jump in n_clamped_high = a new corrupt
    source, caught before it moves the mean)."""
    from pyspark.sql import functions as F

    from hotdog_spark.operators.quantiles import exact_quantiles_multipass

    ev = table(spark, sf_dir, "events").select(
        "event_type",
        (F.col("value").cast("decimal(18,4)") * 10000)
        .cast("bigint")
        .alias("q_val"),
    ).filter(F.col("q_val").isNotNull())
    res = exact_quantiles_multipass(ev, "q_val", [0.01, 0.99])
    lo, hi = res[0][2], res[1][2]
    clamped = F.greatest(F.lit(lo), F.least(F.lit(hi), F.col("q_val")))
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(clamped).alias("sum_winsor_q"),
        F.count(F.when(F.col("q_val") < lo, F.lit(1))).alias("n_clamped_low"),
        F.count(F.when(F.col("q_val") > hi, F.lit(1))).alias("n_clamped_high"),
    )


@register(
    "seq_frequent_event_bigrams",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type AS a,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS b
      FROM events
    ), tr AS (
      SELECT user_id, a, b FROM ordered WHERE b IS NOT NULL
    ), pair AS (
      SELECT a, b, COUNT(*) AS n_transitions,
             COUNT(DISTINCT user_id) AS n_users
      FROM tr GROUP BY a, b
    ), marg AS (
      SELECT a AS t, COUNT(*) AS n_out FROM tr GROUP BY a
    ), marg_in AS (
      SELECT b AS t, COUNT(*) AS n_in FROM tr GROUP BY b
    ), tot AS (SELECT COUNT(*) AS n FROM tr)
    SELECT p.a AS prev_type, p.b AS next_type,
           p.n_transitions, p.n_users,
           CAST(p.n_transitions * (SELECT n FROM tot) AS DOUBLE)
             / CAST(mo.n_out * mi.n_in AS DOUBLE) AS lift
    FROM pair p
    JOIN marg mo ON mo.t = p.a
    JOIN marg_in mi ON mi.t = p.b
    WHERE p.n_transitions >= 5
    """,
)
def seq_frequent_event_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern mining, support-2 stage: per-user consecutive
    event-type transitions (deterministic order: ts, event_id tiebreak),
    their support (occurrences + distinct users) and LIFT vs the
    independence assumption — the Markov-transition / next-event-model
    input and the classic first stage of PrefixSpan-style mining, with
    min-support pruning (>=5) applied before anything downstream.

    Scale shape: one user-keyed window sort (the same shuffle
    sessionization pays — at 100 TB this rides a bucketed-by-user
    layout), then ONE keyed aggregate over transition rows; margins are
    type-cardinality-sized and broadcast back.  Lift is a single IEEE
    division of exact bigint products, so it is bit-identical
    cross-engine."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    from hotdog_spark.operators import track_persist

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = track_persist(
        e.select(
            "user_id",
            F.col("event_type").alias("a"),
            F.lead("event_type").over(w).alias("b"),
        ).filter(F.col("b").isNotNull())
    )
    pair = tr.groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.countDistinct("user_id").alias("n_users"),
    )
    marg_out = tr.groupBy("a").agg(F.count(F.lit(1)).alias("n_out"))
    marg_in = tr.groupBy("b").agg(F.count(F.lit(1)).alias("n_in"))
    total = tr.count()
    return (
        pair.join(broadcast(marg_out), "a")
        .join(broadcast(marg_in), "b")
        .filter(F.col("n_transitions") >= 5)
        .select(
            F.col("a").alias("prev_type"),
            F.col("b").alias("next_type"),
            "n_transitions",
            "n_users",
            (
                (F.col("n_transitions") * F.lit(total)).cast("double")
                / (F.col("n_out") * F.col("n_in")).cast("double")
            ).alias("lift"),
        )
    )
