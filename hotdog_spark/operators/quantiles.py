"""Exact quantiles at scale without a global sort.

``percentile_approx`` trades accuracy for one pass; a global sort is
exact but costs a full range-partitioned shuffle of the column — the
two standard options at 100 TB.  This module implements the third,
classic option (iterative histogram refinement, a.k.a. distributed
binary search / BlinkDB's exact fallback): repeatedly count into
``buckets`` equal-width bins over the candidate range, locate the bin
containing the target rank, and recurse into it.  Each round is ONE
map-side-combinable aggregate whose output is O(buckets) rows; the
driver holds only the bin counters.  For a 64-bit integer domain the
worst case is ceil(64 / log2(buckets)) + 1 = 7 rounds at the default
4096 buckets; real money/count domains (≤ ~2^24 distinct cents) narrow
to a ≤ tail_cap range in ONE round, so the whole computation is three
jobs: bootstrap aggregate, one histogram, one exact tail.

All quantiles are refined SIMULTANEOUSLY: each round scans the
persisted value column once, classifying every row into (quantile,
bin) via an array-of-structs projection + explode (≤ |quantiles|
entries per row), so the number of full-column passes does not grow
with the number of quantiles requested.

Exactness/determinism: values must be integers (quantize money to
cents upstream); rank semantics are type-1 (value whose 1-based rank
is ``ceil(q·n)`` in ascending order, duplicates counted) — exactly
reproducible in SQL with ROW_NUMBER, which is what the registered
query's oracle does.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hotdog_spark.operators import track_persist


def exact_quantiles_multipass(
    df: DataFrame,
    value_col: str,
    qs: list[float],
    buckets: int = 4096,
    tail_cap: int = 4096,
) -> list[tuple[float, int, int]]:
    """Exact type-1 quantiles of an integer column.

    Returns [(q, rank, value)] with ``rank = max(1, ceil(q·n))`` over
    the ``n`` non-null rows.  Driver memory: O(buckets · |qs|) counters
    per round plus one ≤ ``tail_cap``-distinct-value tail per quantile
    in the final round.  Raises ``ValueError`` on an empty column.
    """
    from hotdog_spark.operators import fan_out

    # fan_out BEFORE the persist: the cached column otherwise inherits a
    # compact scan's single partition and every refinement pass runs
    # one-core (r10 audit); at scale the input is multi-partition and
    # this no-ops
    vals = track_persist(
        fan_out(
            df.select(F.col(value_col).cast("bigint").alias("v")).filter(
                F.col("v").isNotNull()
            )
        )
    )
    # one bootstrap aggregate: count + min + max share the scan that
    # materializes the persist (separate count()/agg() actions cost one
    # extra full pass each — pure job-latency at any scale)
    row = vals.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    ).first()
    n = int(row["n"])
    if n == 0:
        raise ValueError("exact_quantiles_multipass: no non-null rows")
    # state per quantile: [lo, hi, remaining_rank]; rank counted within [lo, hi]
    state = {
        i: [int(row["lo"]), int(row["hi"]), max(1, math.ceil(q * n))]
        for i, q in enumerate(qs)
    }
    done: dict[int, int] = {}

    while True:
        active = {
            i: s for i, s in state.items() if i not in done and s[1] - s[0] + 1 > tail_cap
        }
        if not active:
            break
        # one shared scan: classify each row into (quantile_idx, bin)
        entries = []
        widths = {}
        for i, (lo, hi, _r) in active.items():
            w = -((hi - lo + 1) // -buckets)  # ceil division
            widths[i] = w
            entries.append(
                F.when(
                    (F.col("v") >= F.lit(lo)) & (F.col("v") <= F.lit(hi)),
                    F.struct(
                        F.lit(i).alias("qi"),
                        # integer div, NOT float division: double rounding
                        # would misclassify bins once |v| exceeds 2^53
                        F.expr(f"(v - {lo}) div {w}").alias("bin"),
                    ),
                )
            )
        counts = (
            vals.select(
                F.explode(
                    F.filter(F.array(*entries), lambda x: x.isNotNull())
                ).alias("e")
            )
            .groupBy("e.qi", "e.bin")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        hist: dict[int, dict[int, int]] = {i: {} for i in active}
        for r_ in counts:
            hist[r_["qi"]][r_["bin"]] = r_["c"]
        for i, (lo, hi, rank) in active.items():
            w = widths[i]
            cum = 0
            for b in range(buckets):
                c = hist[i].get(b, 0)
                if cum + c >= rank:
                    new_lo = lo + b * w
                    state[i] = [new_lo, min(hi, new_lo + w - 1), rank - cum]
                    break
                cum += c
            else:  # defensive: rank beyond counted mass cannot happen
                raise AssertionError("rank not located in histogram")

    # final exact pass over the narrow ranges, shared the same way
    pending = [i for i in state if i not in done]
    if pending:
        entries = [
            F.when(
                (F.col("v") >= F.lit(state[i][0])) & (F.col("v") <= F.lit(state[i][1])),
                F.struct(F.lit(i).alias("qi"), F.col("v").alias("val")),
            )
            for i in pending
        ]
        tail_rows = (
            vals.select(
                F.explode(
                    F.filter(F.array(*entries), lambda x: x.isNotNull())
                ).alias("e")
            )
            .groupBy("e.qi", "e.val")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        by_q: dict[int, list[tuple[int, int]]] = {i: [] for i in pending}
        for r_ in tail_rows:
            by_q[r_["qi"]].append((r_["val"], r_["c"]))
        for i in pending:
            rank = state[i][2]
            cum = 0
            for val, c in sorted(by_q[i]):
                if cum + c >= rank:
                    done[i] = val
                    break
                cum += c
            else:
                raise AssertionError("rank not located in tail")

    return [
        (q, max(1, math.ceil(q * n)), done[i]) for i, q in enumerate(qs)
    ]


def exact_quantiles_df(
    spark: SparkSession,
    df: DataFrame,
    value_col: str,
    qs: list[float],
    labels: list[str],
    **kw,
) -> DataFrame:
    """DataFrame wrapper: (q_label, target_rank, value) — one row per
    requested quantile, computed distributed, materialized as a tiny
    driver-built result (|qs| rows, same shape as a collected k-means
    model)."""
    res = exact_quantiles_multipass(df, value_col, qs, **kw)
    return spark.createDataFrame(
        [(labels[i], r, v) for i, (_q, r, v) in enumerate(res)],
        "q_label string, target_rank bigint, value bigint",
    )
