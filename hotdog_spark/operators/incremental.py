"""Incremental materialized-view maintenance: mergeable aggregate state.

The 100 TB workflow this models: a rolled-up view (hourly per-type event
stats, daily revenue, …) is too expensive to rebuild from scratch every
time a new partition of raw data lands.  The standard fix — what
Spark's own streaming aggregation state, Druid segments, and every
incremental-view system do — is to keep the view as *mergeable partial
state* (count / sum / min / max, never avg or stddev directly) so a new
batch is aggregated alone (touching only its own rows) and MERGED into
the stored state with a key-wise combine.  Derived measures (averages,
rates) are computed only at read time, from the merged state.

The algebra: a measure is incrementally maintainable under insert-only
deltas iff it is a commutative monoid homomorphism — count (+), sum
(+), min (min), max (max) are; avg is not, but factors through
(sum, count).  This module implements exactly that discipline:

* :func:`aggregate_state` — raw rows → keyed state (one map-side
  combinable aggregate over ONLY the given slice).
* :func:`merge_states` — state ⊕ state → state (union + one keyed
  aggregate whose input is view-sized, not data-sized).
* :func:`finalize_state` — state → serving view (pure projection;
  derived columns appear only here).

Exactness: counts/mins/maxes are integers; sums are cent-quantized
bigints, so merge order can never change a bit and
``finalize(merge(state(base), state(delta))) == finalize(state(all))``
holds exactly — the registered query's oracle asserts precisely this
equality against a from-scratch rebuild.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: The mergeable state columns this module maintains, in order.
STATE_COLS = ("n_rows", "sum_value_q", "min_value_q", "max_value_q")


def aggregate_state(
    df: DataFrame, keys: list[str], value_q: Column
) -> DataFrame:
    """Keyed mergeable state over one slice of raw rows.

    ``value_q`` must be an integral column expression (quantize
    floats upstream) — integer sums are what make the merge exact.
    One hash aggregate, map-side combinable; output is view-sized.
    """
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(value_q).alias("sum_value_q"),
        F.min(value_q).alias("min_value_q"),
        F.max(value_q).alias("max_value_q"),
    )


def merge_states(*states: DataFrame) -> DataFrame:
    """⊕ over any number of state tables sharing a schema: union, then
    one keyed aggregate applying each column's monoid op.  Input is
    view-sized (never raw-data-sized) — this is the whole point: a new
    batch costs its own aggregation plus this small combine."""
    if not states:
        raise ValueError("merge_states needs at least one state table")
    acc = states[0]
    for s in states[1:]:
        acc = acc.unionByName(s)
    keys = [c for c in acc.columns if c not in STATE_COLS]
    return acc.groupBy(*keys).agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("sum_value_q").alias("sum_value_q"),
        F.min("min_value_q").alias("min_value_q"),
        F.max("max_value_q").alias("max_value_q"),
    )


def finalize_state(state: DataFrame) -> DataFrame:
    """Serving-time projection: derive the non-mergeable measures from
    the mergeable state.  avg = one exact-integer-sum / count division
    (a single float op, so it is bit-identical in any engine that does
    IEEE double division — no accumulation order involved)."""
    return state.select(
        *[c for c in state.columns if c not in STATE_COLS],
        F.col("n_rows"),
        F.col("sum_value_q"),
        F.col("min_value_q"),
        F.col("max_value_q"),
        (
            F.col("sum_value_q").cast("double")
            / F.col("n_rows").cast("double")
        ).alias("avg_value_q"),
    )
