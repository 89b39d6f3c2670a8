"""Exact quantiles at scale without a global sort.

``percentile_approx`` trades accuracy for one pass; a global sort is
exact but costs a full range-partitioned shuffle of the column — the
two standard options at 100 TB.  This module implements the third,
classic option (iterative histogram refinement, a.k.a. distributed
binary search / BlinkDB's exact fallback): repeatedly count into
``buckets`` equal-width bins over the candidate range, locate the bin
containing the target rank, and recurse into it.  Each round is ONE
map-side-combinable aggregate whose output is O(buckets) rows; the
driver holds only the bin counters.  The first pass is a clamped
coarse-bin histogram (count/min/max per tail_cap-wide bin, bounded at
2·coarse_cap+1 groups for any domain) that yields n, the range, AND
the first narrowing in one job; for a 64-bit integer domain the worst
case after it is ceil(64 / log2(buckets)) rounds at the default 4096
buckets; real money/count domains (≤ ~2^27 distinct cents) land every
quantile in a ≤ tail_cap bin immediately, so the whole computation is
TWO jobs: the coarse histogram and one exact tail pass.

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
    coarse_cap: int = 32768,
) -> list[tuple[float, int, int]]:
    """Exact type-1 quantiles of an integer column.

    Returns [(q, rank, value)] with ``rank = max(1, ceil(q·n))`` over
    the ``n`` non-null rows.  Driver memory: O(coarse_cap) bin rows for
    the first pass, O(buckets · |qs|) counters per refinement round,
    plus one ≤ ``tail_cap``-distinct-value tail per quantile in the
    final round.  Raises ``ValueError`` on an empty column.
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
    # ONE coarse pre-pass replaces the old bootstrap aggregate AND the
    # first refinement round (r12, guide §1.2 "how many full passes are
    # unavoidable"): bin by exact floor division into tail_cap-wide
    # value-aligned bins — (v - pmod(v, W)) div W is exact floor(v/W)
    # for negatives too, no double rounding anywhere — CLAMPED into
    # [-coarse_cap, +coarse_cap] so the group count, the shuffle and the
    # driver collect are bounded by 2·coarse_cap+1 rows for ANY value
    # domain (a high-entropy 64-bit column cannot turn this into a
    # per-value shuffle; map-side combine bounds each task's output the
    # same way).  Per-bin count/min/max give n and, for every quantile,
    # either (a) an interior bin whose true value span is ≤ tail_cap →
    # straight to the exact tail pass, or (b) a clamped edge bin whose
    # exact [min, max] seeds the refinement loop with a range no wider
    # than the old bootstrap's [lo, hi].  Clamping preserves bin-order
    # monotonicity in v, so the cumulative walk over bins sorted by bin
    # id IS a walk in value order — the same type-1 rank selection as
    # before, exactly.  Money/quantized-metric domains resolve every
    # quantile via (a): TWO full passes total (coarse + exact tail)
    # where the old shape paid three (bootstrap + histogram + tail).
    _b = F.expr(f"(v - pmod(v, {tail_cap})) div {tail_cap}")
    _b = F.greatest(F.least(_b, F.lit(coarse_cap)), F.lit(-coarse_cap))
    coarse = (
        vals.groupBy(_b.alias("b"))
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    )
    if not coarse:
        raise ValueError("exact_quantiles_multipass: no non-null rows")
    coarse.sort(key=lambda r_: r_["b"])
    n = sum(r_["c"] for r_ in coarse)
    # state per quantile: [lo, hi, remaining_rank]; rank counted within [lo, hi]
    state: dict[int, list[int]] = {}
    for i, q in enumerate(qs):
        rank = max(1, math.ceil(q * n))
        cum = 0
        for r_ in coarse:
            if cum + r_["c"] >= rank:
                state[i] = [int(r_["mn"]), int(r_["mx"]), rank - cum]
                break
            cum += r_["c"]
        else:  # defensive: rank ≤ n = total counted mass by construction
            raise AssertionError("rank not located in coarse histogram")
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
