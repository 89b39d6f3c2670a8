"""Temporal joins Spark lacks as built-ins: as-of join and point-in-
interval range join, both expressed in shapes that scale.

The reference implements no joins at all (SURVEY.md §2.9); these are
north-star additions for event/training-data pipelines, designed so that
the expensive part is always ONE hash shuffle:

* ``asof_join`` — the classic "latest right row at or before the left
  row's time, per key".  A naive implementation is an inequality join
  (O(n·m) nested loop in any engine).  The scalable shape is
  union-and-carry-forward: tag both sides, union them, sort within each
  key partition by (time, side), and carry the right side's values
  forward with ``last(..., ignorenulls)``.  Cost: one shuffle on the key,
  one sort — identical to what a purpose-built sort-merge as-of join
  (Flink temporal join, QuestDB/kdb asof) does internally.
* ``range_join_buckets`` — "points joined to intervals containing them,
  per key".  The scalable shape is bucketing: quantize time into
  fixed-width buckets, explode each interval into the buckets it covers,
  equi-join points on (key, bucket), then re-filter exactly.  This turns
  an inequality join into an equi-join whose fan-out is
  interval_width/bucket_width, which AQE can size and skew-split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hotdog_spark.operators import epoch_s, epoch_us


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    how: str = "inner",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach one right row sharing the ``on`` keys:

    * ``direction='backward'`` (default): latest right with
      ``right_ts <= left_ts`` — the classic as-of;
    * ``'forward'``: earliest right with ``right_ts >= left_ts``;
    * ``'nearest'``: whichever of the two is closer in time (ties →
      backward) — pandas ``merge_asof`` semantics throughout (exact
      matches allowed).

    Returns the left rows plus ``right_cols`` (each aliased
    ``asof_<name>``) and ``asof_ts``.  ``how='left'`` keeps unmatched left
    rows with nulls; ``'inner'`` drops them.

    All three directions are the same union-and-carry shape — one shuffle
    on the key, one sort; forward is the mirrored frame
    (first over [current, following]) and nearest evaluates both frames
    in ONE window pass and picks per row.

    Right-side rows must be unique per (on, right_ts) — pre-aggregate if
    not — so the carry is deterministic in every engine.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    lcols = left.columns
    # at equal _t the right row must be eligible in BOTH directions:
    # backward scans [unbounded, current] (right sorts first → included),
    # forward scans [current, unbounded] and uses side 2 (right sorts
    # after left → included).  nearest uses side 0; its forward frame
    # misses exact ties, but a tie has delta 0 and backward wins ties
    # anyway, so the result is unaffected.
    right_side = 2 if direction == "forward" else 0
    tagged_left = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in right_cols],
        F.lit(None).cast("timestamp").alias("_rt"),
    )
    tagged_right = right.select(
        *[F.lit(None).cast(dict(left.dtypes).get(c, "string")).alias(c) for c in lcols if c not in on],
        *[F.col(k) for k in on],
        F.col(right_ts).alias("_t"),
        F.lit(right_side).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        F.col(right_ts).alias("_rt"),
    ).select(*tagged_left.columns)

    ordering = Window.partitionBy(*on).orderBy(F.col("_t"), F.col("_side"))
    wb = ordering.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = ordering.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    union = tagged_left.unionByName(tagged_right)

    if direction == "backward":
        carried = union.select(
            *[F.col(c) for c in lcols],
            F.col("_side"),
            *[
                F.last(F.col(f"_r_{c}"), ignorenulls=True).over(wb).alias(f"asof_{c}")
                for c in right_cols
            ],
            F.last(F.col("_rt"), ignorenulls=True).over(wb).alias("asof_ts"),
        )
    elif direction == "forward":
        carried = union.select(
            *[F.col(c) for c in lcols],
            F.col("_side"),
            *[
                F.first(F.col(f"_r_{c}"), ignorenulls=True).over(wf).alias(f"asof_{c}")
                for c in right_cols
            ],
            F.first(F.col("_rt"), ignorenulls=True).over(wf).alias("asof_ts"),
        )
    else:  # nearest: both carries in one window pass, pick per row
        both = union.select(
            *[F.col(c) for c in lcols],
            F.col("_side"),
            F.col("_t"),
            *[
                F.last(F.col(f"_r_{c}"), ignorenulls=True).over(wb).alias(f"_b_{c}")
                for c in right_cols
            ],
            F.last(F.col("_rt"), ignorenulls=True).over(wb).alias("_bt"),
            *[
                F.first(F.col(f"_r_{c}"), ignorenulls=True).over(wf).alias(f"_f_{c}")
                for c in right_cols
            ],
            F.first(F.col("_rt"), ignorenulls=True).over(wf).alias("_ft"),
        )
        back_wins = F.col("_ft").isNull() | (
            F.col("_bt").isNotNull()
            & (
                epoch_us("_t") - epoch_us("_bt")
                <= epoch_us("_ft") - epoch_us("_t")
            )
        )
        carried = both.select(
            *[F.col(c) for c in lcols],
            F.col("_side"),
            *[
                F.when(back_wins, F.col(f"_b_{c}"))
                .otherwise(F.col(f"_f_{c}"))
                .alias(f"asof_{c}")
                for c in right_cols
            ],
            F.when(back_wins, F.col("_bt")).otherwise(F.col("_ft")).alias("asof_ts"),
        )

    out = carried.filter(F.col("_side") == 1).drop("_side")
    if how == "inner":
        out = out.filter(F.col("asof_ts").isNotNull())
    return out


def range_join_buckets(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_seconds: int = 300,
) -> DataFrame:
    """Join point rows to every interval row (same keys) whose
    ``[start_ts, end_ts]`` contains ``point_ts``.

    Intervals are exploded into the fixed-width epoch buckets they span;
    points carry exactly one bucket; the join is an equi-join on
    (keys..., bucket) followed by the exact BETWEEN re-filter.  Pick
    ``bucket_seconds`` near the typical interval width so fan-out stays
    O(1) per interval.  Returns all point columns + all interval columns.
    """
    b = F.lit(bucket_seconds)
    p = points.withColumn("_bucket", (epoch_s(point_ts) / b).cast("bigint"))
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (epoch_s(start_ts) / b).cast("bigint"),
                (epoch_s(end_ts) / b).cast("bigint"),
            )
        ),
    )
    joined = p.join(iv, on=[*on, "_bucket"]).filter(
        F.col(point_ts).between(F.col(start_ts), F.col(end_ts))
    )
    return joined.drop("_bucket")


def timeseries_topk_similar(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    probe_key,
    k: int = 10,
    min_common: int = 3,
    bucket: str = "hour",
) -> DataFrame:
    """Distributed time-series similarity search (the REPOSE/EDBT-2019
    problem shape): which keys' activity series most resemble the probe
    key's?

    Pipeline: bucket timestamps → exact per-(key, bucket) totals
    (decimal-summed, then integer-quantized ×10000 so distances are
    engine-exact) → broadcast the probe's series → co-indexed squared-L2
    over shared buckets → top-k by distance.

    Scale shape: the per-bucket aggregation is the only full shuffle; the
    probe series is a few-hundred-row broadcast, so scoring is map-side;
    top-k is TakeOrderedAndProject.  Returns (key, d2, common_buckets,
    rank).
    """
    from pyspark.sql.window import Window

    hourly = (
        df.select(
            F.col(key_col).alias("key"),
            F.date_trunc(bucket, F.col(ts_col)).alias("hr"),
            F.col(value_col).cast("decimal(18,4)").alias("v_raw"),
        )
        .groupBy("key", "hr")
        .agg(
            F.round(F.sum("v_raw") * 10000).cast("bigint").alias("v")
        )
    )
    probe = hourly.filter(F.col("key") == probe_key).select(
        F.col("hr").alias("p_hr"), F.col("v").alias("pv")
    )
    diff = F.col("v") - F.col("pv")
    scored = (
        hourly.filter(F.col("key") != probe_key)
        .join(F.broadcast(probe), F.col("hr") == F.col("p_hr"))
        .groupBy("key")
        .agg(
            F.sum(diff * diff).alias("d2"),
            F.count(F.lit(1)).alias("common_buckets"),
        )
        .filter(F.col("common_buckets") >= min_common)
    )
    # top-k first (TakeOrderedAndProject: per-partition heaps, no global
    # sort), THEN rank the k survivors — the ranking window only ever sees
    # k rows, so the single-partition window is harmless at any scale.
    topk = scored.orderBy(F.col("d2"), F.col("key")).limit(k)
    w = Window.orderBy(F.col("d2"), F.col("key"))
    return topk.withColumn("rank", F.row_number().over(w))


def latest_snapshot(
    df: DataFrame, keys: list[str], ts_col: str, tiebreak_col: str
) -> DataFrame:
    """Upsert compaction: the latest row per key — the batch equivalent of
    replaying a changelog into a keyed state store (Kafka log compaction,
    MERGE INTO ... WHEN MATCHED UPDATE).

    Deterministic even with timestamp ties via the explicit tiebreak
    column.  One shuffle on the key; the ranking window rides it.
    """
    w = Window.partitionBy(*keys).orderBy(
        F.col(ts_col).desc(), F.col(tiebreak_col).desc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


def scd2_intervals(
    df: DataFrame, keys: list[str], ts_col: str, tiebreak_col: str
) -> DataFrame:
    """Slowly-changing-dimension (type 2) history: each change event
    becomes a validity interval ``[valid_from, valid_to)``, with NULL
    ``valid_to`` marking the current row — the point-in-time join target
    every feature-store backfill needs.

    Pure ``lead()`` window over the change log: one keyed shuffle, no
    self-join, no state.
    """
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col), F.col(tiebreak_col))
    return df.withColumn("valid_from", F.col(ts_col)).withColumn(
        "valid_to", F.lead(ts_col).over(w)
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int = 300,
) -> DataFrame:
    """Join interval rows to interval rows (same keys) whose closed
    ranges overlap: ``l.start <= r.end AND r.start <= l.end``.

    Both sides explode into fixed-width epoch buckets and equi-join on
    (keys..., bucket) — the same trick as ``range_join_buckets``, with
    one extra subtlety: a pair overlapping across several shared buckets
    would match once per bucket, so only the pair's FIRST shared bucket
    (``max(bucket(l.start), bucket(r.start))``, which any overlapping
    pair shares) emits the row.  Exactly-once without a distinct, so no
    post-join dedup shuffle.  Returns all left + right columns.
    """
    b = F.lit(bucket_seconds)

    def bucket(col: str) -> Column:
        return (epoch_s(col) / b).cast("bigint")

    l = left.withColumn(
        "_bucket", F.explode(F.sequence(bucket(left_start), bucket(left_end)))
    )
    r = right.withColumn(
        "_bucket", F.explode(F.sequence(bucket(right_start), bucket(right_end)))
    )
    return (
        l.join(r, [*on, "_bucket"])
        .filter(
            (F.col(left_start) <= F.col(right_end))
            & (F.col(right_start) <= F.col(left_end))
            & (F.col("_bucket") == F.greatest(bucket(left_start), bucket(right_start)))
        )
        .drop("_bucket")
    )
