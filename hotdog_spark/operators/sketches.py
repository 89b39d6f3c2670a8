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

    # KMV only ever looks at DISTINCT hashes, so dedup (key, h) BEFORE the
    # exchange: ``distinct()`` runs a map-side partial aggregate on the
    # scan side, so the one shuffle carries only the per-partition-distinct
    # pairs (sf0.1 events: 100k rows → 7.5k pairs, a 13× byte shrink; at
    # 100 TB the partial hash aggregate spills to sort-based like any
    # Spark aggregate).  This replaced the r10 round-robin ``fan_out``,
    # which regressed both KMV bench queries (BENCH_r10: 2.75× / 1.75× vs
    # r9) — the r11 A/B showed ANY full-stream exchange costs ~1 s at
    # sf0.1 regardless of partitioner, so the fix is fewer bytes, not a
    # different partitioner.  The distinct's final aggregate also spreads
    # rows by hash(key, h) across shuffle partitions — the same
    # parallelism fan_out bought — and leaves an Exchange below the
    # Python stage, so the no-single-task-Python invariant holds
    # structurally (scripts/plan_audit.py).
    hashed = (
        df.select(F.col(key_col).alias("key"), _hash52(F.col(val_col)).alias("h"))
        .filter(F.col("h").isNotNull())
        .distinct()
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # bounded per-key state: a size-k max-heap (negated values).  No
        # membership set: the upstream distinct() delivers globally
        # deduplicated (key, h) pairs, so duplicate rejection is free.
        heaps: dict = {}
        for pdf in batches:
            for key, h in zip(pdf["key"], pdf["h"]):
                h = int(h)
                hp = heaps.get(key)
                if hp is None:
                    hp = heaps[key] = []
                if len(hp) < k:
                    heapq.heappush(hp, -h)
                elif h < -hp[0]:
                    heapq.heappushpop(hp, -h)
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


#: est_union is multiplied by jaccard_ppm (≤ 10^6) in pure BIGINT, so the
#: estimate must stay under (2^63-1)/10^6 ≈ 9.2e12 distinct values.  Any
#: real corpus is orders of magnitude below this; the bound exists to fail
#: LOUDLY on pathological hash clustering instead of wrapping silently
#: (same guard idiom as queries/similarity.py::_guarded_simpson_ppm).
SET_EST_BOUND = ((1 << 63) - 1) // 1_000_000


def guarded_est_union() -> "F.Column":
    """``est_union`` with the overflow bound enforced in-plan: raises via
    ``raise_error`` when the estimate exceeds SET_EST_BOUND instead of
    letting the downstream jaccard_ppm·est_union BIGINT multiply wrap
    silently.  Split out so the guard is unit-testable on a forged
    over-bound row (an organic trigger needs a kth-min hash below
    ~3·10⁴ out of 2⁵², i.e. never at any feasible corpus size)."""
    return F.expr(
        f"CASE WHEN est_union > {SET_EST_BOUND} THEN "
        f"raise_error(concat('kmv_set_relations: est_union=', "
        f"CAST(est_union AS STRING), ' exceeds the {SET_EST_BOUND} "
        f"exact-bigint bound (jaccard_ppm*est_union would overflow); "
        f"use kmv_distinct per key instead')) "
        f"ELSE est_union END"
    ).alias("est_union")


def kmv_set_relations(
    df: DataFrame, key_col: str, val_col: str, k: int = 64
) -> DataFrame:
    """Pairwise SET RELATIONS between every pair of key groups, computed
    entirely from their KMV sketches — the classic theta-sketch-style
    union/intersection estimate (Beyer et al. 2007, "On synopses for
    distinct-value estimation under multiset operations", public), kept
    deterministic and oracle-checkable by the same 52-bit md5 hash
    contract as :func:`kmv_distinct`.

    Algebra: the k smallest hashes of A ∪ B are exactly the k smallest
    of (mins_A ∪ mins_B) — k-min merge is a semilattice — so the union
    sketch needs no second data pass.  Within the union sketch U, the
    fraction ρ = |U ∩ mins_A ∩ mins_B| / |U| is an unbiased Jaccard
    estimator, and |A ∩ B| ≈ ρ · est(|A ∪ B|).  When |U| < k the union
    sketch IS the full union, every member set is exact, and the
    intersection count is exact (reported verbatim).

    All arithmetic is BIGINT with floor division, identical in Spark and
    DuckDB, so estimates hash-match cross-engine including collision
    effects.  est_union is range-guarded (raise_error past
    SET_EST_BOUND) so the jaccard_ppm·est_union product can never wrap.

    Scale shape: ONE sketch pass over the data (bounded per-key heaps,
    k·P longs per key on the wire), then an all-pairs join over the
    per-key sketch table — bounded by n_keys² ROWS OF k LONGS, never by
    data size; at 100 TB with a bounded key domain (event types,
    sources, languages) this is a broadcast-sized self-join.

    Returns one row per unordered key pair (key_a < key_b):
    (key_a, key_b, n_union_sketch, est_union, inter_in_sketch,
    jaccard_ppm, est_intersection).
    """
    return kmv_set_relations_from_partials(
        kmv_partials(df, key_col, val_col, k), k
    )


def kmv_set_relations_from_partials(partials: DataFrame, k: int = 64) -> DataFrame:
    """Set relations from ACCUMULATED (key, mins) partials — the
    incremental/streaming form: partials appended per micro-batch / day
    / slice merge to exactly the sketch of the union (semilattice), so
    finalizing accumulated state equals the one-shot batch answer
    bit-for-bit (tests/test_streaming.py pins the parity)."""
    merged = partials.groupBy("key").agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("mins")))),
            1,
            k,
        ).alias("mins")
    )
    a = merged.select(F.col("key").alias("key_a"), F.col("mins").alias("mins_a"))
    b = merged.select(F.col("key").alias("key_b"), F.col("mins").alias("mins_b"))
    pairs = a.join(F.broadcast(b), F.col("key_a") < F.col("key_b"))

    u = F.slice(
        F.array_sort(F.array_distinct(F.concat("mins_a", "mins_b"))), 1, k
    )
    paired = pairs.select(
        "key_a",
        "key_b",
        u.alias("mu"),
        F.size(F.array_intersect(F.array_intersect(u, "mins_a"), "mins_b"))
        .cast("bigint")
        .alias("inter_in_sketch"),
    )
    n_u = F.size("mu")
    est_union_full = F.expr(
        f"CAST({(k - 1) * HASH_SPACE} AS BIGINT) div "
        "greatest(element_at(mu, size(mu)), CAST(1 AS BIGINT))"
    )
    paired = paired.select(
        "key_a",
        "key_b",
        n_u.cast("bigint").alias("n_union_sketch"),
        F.when(n_u < k, n_u.cast("bigint")).otherwise(est_union_full)
        .alias("est_union"),
        "inter_in_sketch",
    )
    paired = paired.withColumn("est_union", guarded_est_union())
    jac = F.expr("(1000000 * inter_in_sketch) div n_union_sketch")
    return paired.select(
        "key_a",
        "key_b",
        "n_union_sketch",
        "est_union",
        "inter_in_sketch",
        jac.alias("jaccard_ppm"),
        # exact mode (|U| < k): U is the full union and inter_in_sketch
        # IS |A ∩ B| — report it verbatim, no estimator rounding
        F.when(F.col("n_union_sketch") < k, F.col("inter_in_sketch"))
        .otherwise(F.expr("((1000000 * inter_in_sketch) div n_union_sketch)"
                          " * est_union div 1000000"))
        .alias("est_intersection"),
    )
