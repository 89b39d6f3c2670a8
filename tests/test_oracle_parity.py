"""Local mirror of the driver's DuckDB-oracle harness.

Runs every registered query's Spark implementation AND its DuckDB oracle
at sf0.001 and asserts exact, order-insensitive equality of values and
column names — the same bar as CORRECTNESS_r{N}.json, caught early.
"""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("HOTDOG_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


def _canon(df):
    """pandas frame → sorted list of row tuples with canonical values.

    Values are TYPE-PREFIXED so integer-vs-float drift between the two
    engines cannot be masked by string formatting.  This is exactly the
    class of bug the r1 driver caught (DuckDB SUM(int) → HUGEINT →
    float64 in pandas, vs Spark BIGINT → int64): ``123`` and ``123.0``
    hash differently under the driver, so they must compare differently
    here too.  Decimals keep their own prefix (both engines surface
    ``decimal.Decimal`` objects for DECIMAL columns, which the driver
    accepts), and bools are distinguished from ints.
    """
    import decimal

    cols = sorted(df.columns)
    df = df[cols]

    def canon_val(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            # a sortable sentinel, not Python None: rows that tie on their
            # leading columns would otherwise hit None-vs-str in sorted()
            return "\x00:null"
        if hasattr(v, "item"):
            v = v.item()
        if isinstance(v, bool):
            return f"b:{v}"
        if isinstance(v, int):
            return f"i:{v}"
        if isinstance(v, float):
            return f"f:{v:.10g}"
        if isinstance(v, decimal.Decimal):
            return f"d:{v}"
        return f"s:{v}"

    rows = sorted(tuple(canon_val(v) for v in row) for row in df.itertuples(index=False))
    return cols, rows


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    spark_df = QUERIES[name](spark, SF_DIR).toPandas()
    if name not in ORACLES:
        # rows-only check, mirroring the driver's weaker path
        assert len(spark_df) >= 0
        return
    duck_df = duck.execute(ORACLES[name]).fetchdf()
    s_cols, s_rows = _canon(spark_df)
    d_cols, d_rows = _canon(duck_df)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    mismatches = [
        (a, b) for a, b in zip(s_rows, d_rows) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_harness_detects_mismatches(spark, duck):
    """Negative control: the comparator must FLAG a wrong result — guards
    against the sweep silently going vacuous (e.g. a canon() bug folding
    every value to the same string)."""
    name = "q6_forecast_revenue"
    spark_df = QUERIES[name](spark, SF_DIR).toPandas()
    sc, sr = _canon(spark_df)
    # value perturbation
    wrong = duck.execute(
        f"SELECT revenue + 1 AS revenue, n FROM ({ORACLES[name]}) t"
    ).fetchdf()
    dc, dr = _canon(wrong)
    assert sc == dc and sr != dr
    # column-name perturbation
    renamed = duck.execute(
        f"SELECT revenue AS not_revenue, n FROM ({ORACLES[name]}) t"
    ).fetchdf()
    dc2, _ = _canon(renamed)
    assert sc != dc2
    # row-count perturbation
    fewer = duck.execute(f"SELECT * FROM ({ORACLES[name]}) t LIMIT 0").fetchdf()
    _, dr3 = _canon(fewer)
    assert sr != dr3
