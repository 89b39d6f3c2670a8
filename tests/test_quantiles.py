"""Exact multipass quantiles vs a driver-side sorted-list reference."""

import math
import random

import pytest
from pyspark.sql import functions as F

from hotdog_spark.operators.quantiles import (
    exact_quantiles_df,
    exact_quantiles_multipass,
)


def _reference(values, q):
    s = sorted(values)
    rank = max(1, math.ceil(q * len(s)))
    return rank, s[rank - 1]


def _check(spark, values, qs, **kw):
    df = spark.createDataFrame([(v,) for v in values], "x bigint")
    got = exact_quantiles_multipass(df, "x", qs, **kw)
    for (q, rank, val), want_q in zip(got, qs):
        w_rank, w_val = _reference(values, want_q)
        assert (rank, val) == (w_rank, w_val), (q, rank, val, w_rank, w_val)


def test_random_wide_domain(spark):
    rng = random.Random(42)
    values = [rng.randrange(-(10**12), 10**12) for _ in range(5000)]
    _check(spark, values, [0.01, 0.5, 0.95, 0.99, 1.0])


def test_heavy_duplicates(spark):
    rng = random.Random(1)
    values = [rng.choice([7, 7, 7, 42, 1000]) for _ in range(3000)]
    _check(spark, values, [0.1, 0.5, 0.9])


def test_narrow_domain_single_tail_pass(spark):
    # domain smaller than tail_cap: no histogram round at all
    values = list(range(100)) * 3
    _check(spark, values, [0.5, 0.99])


def test_forces_multiple_refinement_rounds(spark):
    rng = random.Random(9)
    values = [rng.randrange(0, 2**60) for _ in range(2000)]
    # tiny buckets/tail_cap force ~6 rounds over the 2^60 domain
    _check(spark, values, [0.5], buckets=16, tail_cap=32)


def test_mixed_interior_and_clamped_edge_bins(spark):
    # r12 coarse pre-pass: one quantile must resolve in a tail-ready
    # INTERIOR bin while another lands in a CLAMPED edge bin wider than
    # tail_cap (seeding the refinement loop from the edge bin's exact
    # [min, max]) — the per-quantile branch the fused first pass added.
    rng = random.Random(7)
    # 80% of mass in a narrow band near 0 (interior bins), 20% spread
    # over a huge positive range (clamped at +coarse_cap, width >> cap)
    values = [rng.randrange(0, 50_000) for _ in range(4000)]
    values += [rng.randrange(2**40, 2**59) for _ in range(1000)]
    _check(spark, values, [0.5, 0.99], buckets=64, tail_cap=256)


def test_negative_and_boundary_values(spark):
    values = [-(10**9), -5, -5, 0, 3, 10**9]
    _check(spark, values, [0.001, 0.5, 1.0])


def test_empty_raises(spark):
    df = spark.createDataFrame([], "x bigint")
    with pytest.raises(ValueError):
        exact_quantiles_multipass(df, "x", [0.5])


def test_df_wrapper_shape(spark):
    df = spark.createDataFrame([(v,) for v in range(10)], "x bigint")
    out = exact_quantiles_df(spark, df, "x", [0.5], ["p50"]).collect()
    assert [tuple(r) for r in out] == [("p50", 5, 4)]
