"""Incremental-view state algebra: merge must be exactly equivalent to
a from-scratch rebuild, for any slicing and any merge order."""

from pyspark.sql import functions as F

from hotdog_spark.operators import incremental as inc


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k string, v bigint")


def test_merge_equals_full_rebuild_any_slicing(spark):
    import random

    rng = random.Random(7)
    data = [(f"k{rng.randrange(5)}", rng.randrange(-1000, 1000)) for _ in range(200)]
    full = inc.aggregate_state(_mk(spark, data), ["k"], F.col("v"))
    for n_slices in (2, 3, 5):
        slices = [data[i::n_slices] for i in range(n_slices)]
        merged = inc.merge_states(
            *[inc.aggregate_state(_mk(spark, s), ["k"], F.col("v")) for s in slices]
        )
        assert _rows(merged) == _rows(full)


def test_merge_is_commutative_and_associative(spark):
    a = inc.aggregate_state(_mk(spark, [("x", 1), ("y", 5)]), ["k"], F.col("v"))
    b = inc.aggregate_state(_mk(spark, [("x", 3)]), ["k"], F.col("v"))
    c = inc.aggregate_state(_mk(spark, [("y", -2), ("z", 9)]), ["k"], F.col("v"))
    ab_c = inc.merge_states(inc.merge_states(a, b), c)
    a_bc = inc.merge_states(a, inc.merge_states(b, c))
    cba = inc.merge_states(c, b, a)
    assert _rows(ab_c) == _rows(a_bc) == _rows(cba)


def test_finalize_derives_avg_from_merged_sums(spark):
    s = inc.aggregate_state(_mk(spark, [("x", 1), ("x", 2)]), ["k"], F.col("v"))
    out = inc.finalize_state(s).collect()[0]
    assert out["n_rows"] == 2
    assert out["sum_value_q"] == 3
    assert out["min_value_q"] == 1
    assert out["max_value_q"] == 2
    assert out["avg_value_q"] == 1.5


def test_merge_keeps_keys_disjoint_slices(spark):
    a = inc.aggregate_state(_mk(spark, [("only_a", 4)]), ["k"], F.col("v"))
    b = inc.aggregate_state(_mk(spark, [("only_b", 7)]), ["k"], F.col("v"))
    got = {r["k"]: r["n_rows"] for r in inc.merge_states(a, b).collect()}
    assert got == {"only_a": 1, "only_b": 1}
