"""Mergeable KMV (k-minimum-values) distinct-count sketch — the
deterministic, ORACLE-CHECKABLE member of the sketch-rollup family.

Why this exists (r6/r7 driver-contract saga): Spark's HLL++
(`approx_count_distinct`) emits engine-specific estimates, so the HLL
rollup can never hash-match a DuckDB oracle and had to move to the
bench-only registry.  KMV is the classic alternative (Bar-Yossef et
al. 2002, "Counting distinct elements in a data stream", public): keep
the k smallest values of a uniform hash; the kth smallest value m
estimates distinct ≈ (k-1)·H/m for hash space [0, H).  Every piece —
md5 prefix hash, k-smallest set, integer floor-divide estimate — is a
pure function of the data, identical in any engine, so the ESTIMATE
ITSELF hash-matches cross-engine, collisions and all.

Scale shape (the 100 TB posture): stage 1 is an Arrow-batched
mapInPandas kernel holding ONE bounded max-heap per (partition, key) —
state is n_keys × k longs, never rows — and emits one k-array row per
key per partition.  Stage 2 merges partials with a keyed aggregate:
k·partitions longs per key cross the wire, not rows-per-user (the
exact count shuffles every distinct user id; this shuffles ≤ k·P).
k-min merge is a semilattice (commutative, associative, idempotent),
so the merged sketch equals the sketch of the union — which is exactly
what the DuckDB oracle computes directly.

Determinism contract: hash = first 13 md5 hex chars of the value's
string form, parsed as a 52-bit integer (Spark ``conv(…,16,10)`` ==
DuckDB ``('0x'||…)::BIGINT``); estimate = (k-1)·2^52 // max(m, 1) in
pure BIGINT (k-1 ≤ 63 keeps the product under 2^58 — no overflow in
either engine).  Hash collisions fold into the sketch identically on
both sides (KMV estimates the distinct count of the hash multiset —
standard semantics).
"""

from __future__ import annotations

import heapq
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: 52-bit hash space: 13 hex chars, safely inside BIGINT products.
HASH_BITS = 52
HASH_SPACE = 1 << HASH_BITS


def _hash52(col) -> "F.Column":
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 13), 16, 10
    ).cast("long")


def kmv_partials(
    df: DataFrame, key_col: str, val_col: str, k: int = 64
) -> DataFrame:
    """Stage 1 alone: per-(partition, key) k-min arrays as (key, mins)
    rows — the MERGEABLE sketch state.  Partials from different batches
    / days / streams union and re-finalize to exactly the sketch of the
    combined data (k-min merge is a semilattice), which is what makes
    this the incremental-rollup form: persist partials per slice, merge
    on read."""
    from hotdog_spark.dist import ensure_shipped

    ensure_shipped(df.sparkSession)
    assert 2 <= k <= 1024, "k outside the sane sketch range"

    hashed = (
        df.select(F.col(key_col).alias("key"), _hash52(F.col(val_col)).alias("h"))
        .filter(F.col("h").isNotNull())
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # bounded per-key state: a size-k max-heap (negated values) plus
        # its membership set for O(1) duplicate rejection
        heaps: dict = {}
        members: dict = {}
        for pdf in batches:
            for key, h in zip(pdf["key"], pdf["h"]):
                h = int(h)
                hp = heaps.get(key)
                if hp is None:
                    hp = heaps[key] = []
                    members[key] = set()
                mem = members[key]
                if h in mem:
                    continue
                if len(hp) < k:
                    heapq.heappush(hp, -h)
                    mem.add(h)
                elif h < -hp[0]:
                    mem.discard(-heapq.heappushpop(hp, -h))
                    mem.add(h)
        # empty partitions yield NO batch: an empty dict would build a
        # DataFrame whose columns default to float64, and Arrow cannot
        # convert an empty float64 ndarray to list<int64> (observed only
        # under local[32], where input partitions can be empty)
        if heaps:
            yield pd.DataFrame(
                {
                    "key": list(heaps),
                    "mins": [sorted(-x for x in hp) for hp in heaps.values()],
                }
            )

    key_type = hashed.schema["key"].dataType.simpleString()
    return hashed.mapInPandas(kernel, f"key {key_type}, mins array<long>")


def kmv_finalize(partials: DataFrame, key_col: str, k: int = 64) -> DataFrame:
    """Stage 2: merge (key, mins) partials — from one pass or from any
    number of unioned incremental slices — and emit the estimate row
    per key (see :func:`kmv_distinct` for the output contract)."""
    merged = partials.groupBy("key").agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("mins")))),
            1,
            k,
        ).alias("mins")
    )
    n = F.size("mins")
    kth = F.element_at("mins", n)
    # integer `div`, NOT float `/` + cast: (k-1)·2^52 exceeds a double's
    # 53-bit mantissa, so float division would silently round the
    # estimate off the oracle's exact quotient
    est_full = F.expr(
        f"CAST({(k - 1) * HASH_SPACE} AS BIGINT) div "
        "greatest(element_at(mins, size(mins)), CAST(1 AS BIGINT))"
    )
    return merged.select(
        F.col("key").alias(key_col),
        n.cast("bigint").alias("n_sketch"),
        F.when(n < k, F.lit(-1)).otherwise(kth).cast("bigint").alias("kth_min"),
        F.when(n < k, n.cast("bigint")).otherwise(est_full).alias("est_distinct"),
    )

def kmv_distinct(
    df: DataFrame, key_col: str, val_col: str, k: int = 64
) -> DataFrame:
    """Per-key KMV sketch + deterministic distinct estimate (the
    one-shot composition of :func:`kmv_partials` → :func:`kmv_finalize`).

    Returns (key, n_sketch, kth_min, est_distinct): ``n_sketch`` is the
    number of hashes kept (< k means the group's distinct count is
    exact and ``est_distinct`` just reports it), ``kth_min`` the
    largest kept hash (-1 for exact groups — sortable, never NULL),
    ``est_distinct`` the (k-1)·2^52 // kth estimator.
    """
    return kmv_finalize(kmv_partials(df, key_col, val_col, k), key_col, k)
