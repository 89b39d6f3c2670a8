"""Relational operator surface: scans, filters, joins (broadcast / sort-
merge / semi / anti), aggregations (hash, distinct, rollup, cube), window
functions (ranking + running frames), sort/limit/top-k, set operations, and
the scalar string/date/JSON function families — each as a driver-checkable
query with a DuckDB oracle.

The reference implements none of these (SURVEY.md §2.9) — they are the
built-in Spark capabilities our engine exposes so a user of the reference
gets a full query surface on the same tables their rules route into.

Determinism rules (so order-insensitive value hashes match DuckDB exactly):

* never SUM raw doubles — cast 2-decimal money/qty columns to DECIMAL
  first (exact arithmetic in both engines), cast the final value back to
  double;
* averages = double division of exact decimal sums by counts;
* window/top-k orderings always carry a unique tie-break key;
* dates are emitted as formatted strings.

Scale posture (100 TB): dimension joins (region/nation) are explicitly
``broadcast()``; fact-fact joins shuffle on their keys and rely on AQE for
skew; every aggregation is partial-aggregable (map-side combine) — no
driver-side collects anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from hotdog_spark.queries import register
from hotdog_spark.sources.batch import table


def _dec(col, prec=12, scale=2):
    return col.cast(f"decimal({prec},{scale})")


# ---------------------------------------------------------------------------
# Aggregation: TPC-H Q1 pricing summary (hash agg, partial agg, decimals)
# ---------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                    * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE)
             AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    qty = _dec(F.col("l_quantity"))
    price = _dec(F.col("l_extendedprice"))
    one = F.lit(1).cast("decimal(4,2)")
    disc_price = price * (one - _dec(F.col("l_discount"), 4))
    charge = disc_price * (one + _dec(F.col("l_tax"), 4))
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(price).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Scan + filter pushdown: TPC-H Q6 forecast revenue
# ---------------------------------------------------------------------------

@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                   * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.02 AND 0.04
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tight selective scan — every predicate reaches the parquet reader
    (verify: PushedFilters in .explain)."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.04)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec(F.col("l_extendedprice")) * _dec(F.col("l_discount"), 4))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# Multi-join: segment revenue (customer ⋈ orders ⋈ lineitem)
# ---------------------------------------------------------------------------

@register(
    "q3_segment_revenue",
    oracle="""
    SELECT c_mktsegment,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY c_mktsegment
    """,
)
def q3_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    l = table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(4,2)")
    rev = _dec(F.col("l_extendedprice")) * (one - _dec(F.col("l_discount"), 4))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# Six-way join with broadcast dims: TPC-H Q5 regional revenue
# ---------------------------------------------------------------------------

@register(
    "q5_regional_revenue",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """region/nation are broadcast (tiny dims); the fact joins shuffle on
    their keys and AQE re-plans at runtime."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    one = F.lit(1).cast("decimal(4,2)")
    rev = _dec(F.col("l_extendedprice")) * (one - _dec(F.col("l_discount"), 4))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Broadcast dim join
# ---------------------------------------------------------------------------

@register(
    "join_broadcast_dims",
    oracle="""
    SELECT r_name, COUNT(*) AS n_nations,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
    FROM region
    JOIN nation ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    GROUP BY r_name
    """,
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    return (
        c.join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.sum(_dec(F.col("c_acctbal"))).cast("double").alias("total_bal"),
        )
    )


# ---------------------------------------------------------------------------
# Semi / anti joins
# ---------------------------------------------------------------------------

@register(
    "join_semi_customers_with_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_semi_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    """,
)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: customers with no *recent* orders (the date filter keeps
    the result non-empty at every scale factor, so the check is not
    vacuous)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------

@register(
    "window_topk_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) t WHERE rn <= 3
    """,
)
def window_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via ranking window; the tie-break on o_orderkey
    makes the result deterministic.  At scale this shuffles once on
    o_custkey — the partition key carries the whole operator."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_running_customer_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend
    FROM orders
    """,
)
def window_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(_dec(F.col("o_totalprice"))).over(w).cast("double").alias("running_spend"),
    )


@register(
    "window_rank_dense_lag",
    oracle="""
    SELECT o_custkey, o_orderkey,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           LAG(o_orderkey, 1, -1) OVER w AS prev_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_rank_dense_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.lag("o_orderkey", 1, -1).over(w).alias("prev_order"),
    )


# ---------------------------------------------------------------------------
# Sort / limit / global top-k
# ---------------------------------------------------------------------------

@register(
    "topk_orders_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def topk_orders_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition
    heaps then a k-row driver merge, no full sort at any scale."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Grouping sets: rollup / cube; distinct aggregation
# ---------------------------------------------------------------------------

@register(
    "agg_rollup_returnflag",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP computed by RE-AGGREGATION FROM THE FINEST LEVEL rather
    than Spark's Expand-based plan.  `.rollup()` plans an Expand that
    replicates EVERY input row once per grouping set (3× the fact table
    through the partial aggregate — sf10-measured: 5.4 s vs 1.06 s at
    sf1, the whole delta being the 180 M expanded rows).  sum/count are
    algebraic, so the (returnflag, linestatus) level — a handful of
    rows — re-aggregates EXACTLY into the higher levels: one scan of
    the fact table, then two aggregations over ≤ |distinct groups|
    rows.  Same answer as GROUP BY ROLLUP by the re-aggregation law
    (decimal sums are exact, so even the doubles match bit-for-bit:
    the cast happens after the final decimal sum in both forms)."""
    l = table(spark, sf_dir, "lineitem")
    finest = l.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_dec(F.col("l_quantity"))).alias("_sq"),
        F.count(F.lit(1)).alias("n"),
    )
    from hotdog_spark.operators import track_persist

    finest = track_persist(finest)
    lvl1 = finest.groupBy("l_returnflag").agg(
        F.sum("_sq").alias("_sq"), F.sum("n").alias("n")
    ).withColumn("l_linestatus", F.lit(None).cast("string"))
    lvl0 = finest.agg(
        F.sum("_sq").alias("_sq"), F.sum("n").alias("n")
    ).select(
        F.lit(None).cast("string").alias("l_returnflag"),
        F.lit(None).cast("string").alias("l_linestatus"),
        "_sq",
        "n",
    )
    return (
        finest.select("l_returnflag", "l_linestatus", "_sq", "n")
        .unionByName(lvl1.select("l_returnflag", "l_linestatus", "_sq", "n"))
        .unionByName(lvl0)
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            F.col("_sq").cast("double").alias("sum_qty"),
            "n",
        )
    )


@register(
    "agg_cube_priority_status",
    oracle="""
    SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
           COALESCE(o_orderstatus, 'ALL') AS status,
           COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
)
def agg_cube_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE via re-aggregation from the finest level — same move as
    agg_rollup_returnflag (see its docstring for the measurement):
    Spark's .cube() Expand would push every fact row through the
    partial aggregate 4× (one per grouping set); count is algebraic, so
    the (priority, status) level re-aggregates exactly into the three
    coarser levels over a handful of rows."""
    from hotdog_spark.operators import track_persist

    o = table(spark, sf_dir, "orders")
    finest = track_persist(
        o.groupBy("o_orderpriority", "o_orderstatus").agg(
            F.count(F.lit(1)).alias("n")
        )
    )
    by_p = finest.groupBy("o_orderpriority").agg(F.sum("n").alias("n")).select(
        "o_orderpriority", F.lit(None).cast("string").alias("o_orderstatus"), "n"
    )
    by_s = finest.groupBy("o_orderstatus").agg(F.sum("n").alias("n")).select(
        F.lit(None).cast("string").alias("o_orderpriority"), "o_orderstatus", "n"
    )
    total = finest.agg(F.sum("n").alias("n")).select(
        F.lit(None).cast("string").alias("o_orderpriority"),
        F.lit(None).cast("string").alias("o_orderstatus"),
        "n",
    )
    return (
        finest.select("o_orderpriority", "o_orderstatus", "n")
        .unionByName(by_p)
        .unionByName(by_s)
        .unionByName(total)
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n",
        )
    )


@register(
    "agg_distinct_customers_per_priority",
    oracle="""
    SELECT o_orderpriority AS priority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_distinct_customers_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------

@register(
    "set_except_nations",
    oracle="""
    SELECT DISTINCT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
    EXCEPT
    SELECT DISTINCT s_nationkey FROM supplier WHERE s_acctbal > 9000
    """,
)
def set_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    rich_c = c.filter(F.col("c_acctbal") > 9000).select(
        F.col("c_nationkey").alias("nationkey")
    ).distinct()
    rich_s = s.filter(F.col("s_acctbal") > 9000).select(
        F.col("s_nationkey").alias("nationkey")
    ).distinct()
    return rich_c.exceptAll(rich_s)


@register(
    "set_intersect_union_nations",
    oracle="""
    (SELECT DISTINCT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9500
     INTERSECT
     SELECT DISTINCT s_nationkey FROM supplier WHERE s_acctbal > 5000)
    UNION
    SELECT DISTINCT c_nationkey FROM customer WHERE c_acctbal < -900
    """,
)
def set_intersect_union_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    a = c.filter(F.col("c_acctbal") > 9500).select(
        F.col("c_nationkey").alias("nationkey")
    ).distinct()
    b = s.filter(F.col("s_acctbal") > 5000).select(
        F.col("s_nationkey").alias("nationkey")
    ).distinct()
    d = c.filter(F.col("c_acctbal") < -900).select(
        F.col("c_nationkey").alias("nationkey")
    ).distinct()
    return a.intersect(b).union(d).distinct()


# ---------------------------------------------------------------------------
# Scalar function families
# ---------------------------------------------------------------------------

@register(
    "string_functions",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_u,
           lower(p_type) AS type_l,
           length(p_name) AS name_len,
           substring(p_type, 1, 5) AS type_pre,
           regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
           replace(p_brand, '#', '-') AS brand_dash,
           trim(concat('  ', p_name, ' ')) AS trimmed,
           reverse(p_brand) AS brand_rev
    FROM part
    """,
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.lower("p_type").alias("type_l"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_pre"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.replace(F.col("p_brand"), F.lit("#"), F.lit("-")).alias("brand_dash"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
    )


@register(
    "date_functions",
    oracle="""
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           EXTRACT(year FROM o_orderdate) AS yr,
           EXTRACT(month FROM o_orderdate) AS mo,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY 1, 2, 3
    """,
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
                "month_start"
            ),
            F.year("o_orderdate").cast("long").alias("yr"),
            F.month("o_orderdate").cast("long").alias("mo"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec(F.col("o_totalprice"))).cast("double").alias("revenue"),
        )
    )


@register(
    "json_functions",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n,
           MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_min,
           MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_max
    FROM events
    GROUP BY 1
    """,
)
def json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.groupBy((k % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(k).alias("k_min"),
            F.max(k).alias("k_max"),
        )
    )


@register(
    "case_when_price_buckets",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 200000 THEN 'medium'
                ELSE 'large' END AS bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY bucket
    """,
)
def case_when_price_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
    )
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec(F.col("o_totalprice"))).cast("double").alias("total"),
        )
    )


# ---------------------------------------------------------------------------
# Correlated-scalar-style aggregation join (orders above their customer avg)
# ---------------------------------------------------------------------------

@register(
    "orders_above_customer_avg",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey
    FROM orders o
    JOIN (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price
      FROM orders GROUP BY o_custkey
    ) a ON o.o_custkey = a.o_custkey
    WHERE o.o_totalprice > a.avg_price
    """,
)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    avg = o.groupBy("o_custkey").agg(
        (F.sum(_dec(F.col("o_totalprice"))).cast("double") / F.count(F.lit(1))).alias(
            "avg_price"
        )
    ).withColumnRenamed("o_custkey", "a_custkey")
    return (
        o.join(avg, o.o_custkey == avg.a_custkey)
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .select("o_orderkey", "o_custkey")
    )


# ---------------------------------------------------------------------------
# Additional TPC-H-style coverage (adapted to the available columns)
# ---------------------------------------------------------------------------

@register(
    "q4_priority_with_late_items",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q4_priority_with_late_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS correlated subquery → left-semi join on the
    fact table, then a tiny hash aggregate (the semi join ships only
    orderkeys, never lineitem payload)."""
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    lineitem = table(spark, sf_dir, "lineitem")
    late = orders.join(
        lineitem,
        (lineitem.l_orderkey == orders.o_orderkey)
        & (lineitem.l_shipdate > F.date_add(orders.o_orderdate, 60)),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "q10_returned_item_revenue",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-07-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: lost-revenue-from-returns top-20.  Facts join on their
    keys (AQE-managed), nation broadcasts, deterministic tie-break on
    custkey."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    rev = (_dec(F.col("l_extendedprice")) * (F.lit(1).cast("decimal(4,2)") - _dec(F.col("l_discount"), 4))).alias("rev")
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    return (
        joined.groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q14_promo_revenue_share",
    oracle="""
    SELECT CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                    THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
                         * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))
                    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
           / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                      * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
           * 100.0 AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
      AND l.l_shipdate < TIMESTAMP '1996-04-01'
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share — selective month scan (pushed to
    parquet), part join, conditional aggregation."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    p = table(spark, sf_dir, "part")
    rev = _dec(F.col("l_extendedprice")) * (F.lit(1).cast("decimal(4,2)") - _dec(F.col("l_discount"), 4))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(12,2)"))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            (
                F.sum(promo).cast("double")
                / F.sum(rev).cast("double")
                * F.lit(100.0)
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "q18_large_volume_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o.o_totalprice, CAST(b.total_qty AS DOUBLE) AS total_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-volume orders — HAVING on a fact aggregate feeds a
    join back to orders/customer; the aggregate output is tiny, so the
    back-joins broadcast under AQE."""
    l = table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(_dec(F.col("l_quantity"))).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
            F.col("total_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@register(
    "agg_grouping_sets_mixed",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """,
)
def agg_grouping_sets_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (priority totals, status totals, grand
    total in one pass) — one shuffle produces all three groupings."""
    orders = table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        """
    )


@register(
    "agg_percentiles_price",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.25) AS p25,
           quantile_cont(l_extendedprice, 0.50) AS p50,
           quantile_cont(l_extendedprice, 0.75) AS p75
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentiles_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per return flag (Spark `percentile`
    ≡ DuckDB `quantile_cont`).  At 100 TB swap for approx_percentile with
    a bounded error — same plan shape, sketch-mergeable."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.25D)").alias("p25"),
            F.expr("percentile(l_extendedprice, 0.50D)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.75D)").alias("p75"),
        )
    )


@register(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS "P"
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (crosstab): order counts by priority × status.  The value
    list is explicit, so no extra distinct-values job runs and the plan
    is a single hash aggregate."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.coalesce(F.count(F.lit(1)), F.lit(0)))
        .na.fill(0, ["F", "O", "P"])
    )


@register(
    "agg_collect_nations_per_region",
    oracle="""
    SELECT r.r_name, array_to_string(list_sort(list(DISTINCT n.n_name)), ',') AS nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def agg_collect_nations_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: sorted distinct nation list per region, joined
    to a string for engine-neutral comparison."""
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    return (
        n.join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.array_join(F.sort_array(F.collect_set("n_name")), ",").alias("nations"))
    )


@register(
    "join_salted_hot_key",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY o_orderpriority
    """,
)
def join_salted_hot_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted join registered against the PLAIN join's oracle — the
    semantic-equivalence proof that salting (deterministic salt on the
    large side, small side replicated saltx) changes only the shuffle
    layout, never the result.  The manual lever for hot keys that defeat
    even AQE skew splitting."""
    from hotdog_spark.operators.skew import salted_join

    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    joined = salted_join(
        o, c.withColumnRenamed("c_custkey", "o_custkey"), on=["o_custkey"], salt=8
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec(F.col("o_totalprice"), 14)).cast("double").alias("total"),
    )


@register(
    "null_handling_functions",
    oracle="""
    SELECT o_orderkey,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_or_open,
           CASE WHEN o_totalprice > 100000 THEN NULL
                ELSE o_totalprice END AS small_price,
           COALESCE(CASE WHEN o_totalprice > 100000 THEN NULL
                         ELSE o_totalprice END, -1.0) AS small_price_filled,
           LEAST(o_orderkey % 7, o_custkey % 5) AS least_mod,
           GREATEST(o_orderkey % 7, o_custkey % 5) AS greatest_mod,
           (CASE WHEN o_orderstatus = 'F' THEN NULL ELSE o_orderkey END
            IS NOT NULL) AS open_flag
    FROM orders
    """,
)
def null_handling_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling scalar surface: coalesce / nullif / least / greatest
    / IS NOT NULL over `orders` — completing the conditional-function
    family next to string/date/json/case_when.  Pure projection."""
    o = table(spark, sf_dir, "orders")
    small = F.when(F.col("o_totalprice") > 100000, F.lit(None)).otherwise(
        F.col("o_totalprice")
    )
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("open")).alias(
            "status_or_open"
        ),
        small.alias("small_price"),
        F.coalesce(small, F.lit(-1.0)).alias("small_price_filled"),
        F.least(F.col("o_orderkey") % 7, F.col("o_custkey") % 5).alias("least_mod"),
        F.greatest(F.col("o_orderkey") % 7, F.col("o_custkey") % 5).alias(
            "greatest_mod"
        ),
        F.when(F.col("o_orderstatus") == "F", F.lit(None))
        .otherwise(F.col("o_orderkey"))
        .isNotNull()
        .alias("open_flag"),
    )


@register(
    "dq_constraint_report",
    oracle="""
    SELECT 'orders_custkey_fk' AS check_name,
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)) AS n_violations,
           (SELECT COUNT(*) FROM orders) AS n_checked
    UNION ALL
    SELECT 'lineitem_orderkey_fk',
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)),
           (SELECT COUNT(*) FROM lineitem)
    UNION ALL
    SELECT 'lineitem_quantity_range',
           (SELECT COUNT(*) FROM lineitem
            WHERE l_quantity < 1 OR l_quantity > 50),
           (SELECT COUNT(*) FROM lineitem)
    UNION ALL
    SELECT 'orders_totalprice_positive',
           (SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0),
           (SELECT COUNT(*) FROM orders)
    UNION ALL
    SELECT 'orders_orderkey_unique',
           (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders),
           (SELECT COUNT(*) FROM orders)
    UNION ALL
    SELECT 'customer_mktsegment_domain',
           (SELECT COUNT(*) FROM customer
            WHERE c_mktsegment NOT IN ('AUTOMOBILE','BUILDING','FURNITURE',
                                       'HOUSEHOLD','MACHINERY')),
           (SELECT COUNT(*) FROM customer)
    """,
)
def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality constraint validation (the dbt-test / Deequ shape):
    FK orphans via LEFT ANTI joins (dims broadcast), range / domain /
    uniqueness violations via single aggregates — six checks, each one
    scan or one broadcast anti-join, unioned into a small report.  The
    lake-health gate a 100 TB ingest runs before publishing a
    partition."""
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    c = table(spark, sf_dir, "customer")

    def _report(name, violations, checked):
        return violations.crossJoin(checked).select(
            F.lit(name).alias("check_name"),
            F.col("v").alias("n_violations"),
            F.col("n").alias("n_checked"),
        )

    fk_orders = _report(
        "orders_custkey_fk",
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("v")),
        o.agg(F.count(F.lit(1)).alias("n")),
    )
    fk_lineitem = _report(
        "lineitem_orderkey_fk",
        l.join(o.select("o_orderkey"), l.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("v")),
        l.agg(F.count(F.lit(1)).alias("n")),
    )
    qty_range = _report(
        "lineitem_quantity_range",
        l.agg(
            F.sum(
                ((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).cast("bigint")
            ).alias("v")
        ),
        l.agg(F.count(F.lit(1)).alias("n")),
    )
    price_pos = _report(
        "orders_totalprice_positive",
        o.agg(F.sum((F.col("o_totalprice") <= 0).cast("bigint")).alias("v")),
        o.agg(F.count(F.lit(1)).alias("n")),
    )
    pk_unique = _report(
        "orders_orderkey_unique",
        o.agg(
            (F.count(F.lit(1)) - F.count_distinct(F.col("o_orderkey"))).alias("v")
        ),
        o.agg(F.count(F.lit(1)).alias("n")),
    )
    seg_domain = _report(
        "customer_mktsegment_domain",
        c.agg(
            F.sum(
                (~F.col("c_mktsegment").isin(
                    "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"
                )).cast("bigint")
            ).alias("v")
        ),
        c.agg(F.count(F.lit(1)).alias("n")),
    )
    return (
        fk_orders.unionAll(fk_lineitem).unionAll(qty_range)
        .unionAll(price_pos).unionAll(pk_unique).unionAll(seg_domain)
    )


@register(
    "stats_join_key_profile",
    oracle="""
    WITH sides AS (
      SELECT 'orders.o_custkey' AS side, o_custkey AS k FROM orders
      UNION ALL
      SELECT 'lineitem.l_orderkey', l_orderkey FROM lineitem
    ), per_key AS (
      SELECT side, k, COUNT(*) AS n FROM sides GROUP BY side, k
    ), stats AS (
      SELECT side,
             COUNT(*) AS ndv,
             CAST(SUM(n) AS BIGINT) AS n_rows,
             MAX(n) AS max_group,
             CAST(SUM(n * n) AS BIGINT) AS sum_sq_group
      FROM per_key GROUP BY side
    ), hot AS (
      SELECT side, MAX(n) AS hot_n,
             MIN(k) FILTER (WHERE is_hot) AS hot_key
      FROM (
        SELECT side, k, n,
               n = MAX(n) OVER (PARTITION BY side) AS is_hot
        FROM per_key
      ) GROUP BY side
    )
    SELECT s.side, s.ndv, s.n_rows, s.max_group,
           CAST(s.n_rows AS DOUBLE) / s.ndv AS avg_group,
           CAST(s.sum_sq_group AS DOUBLE) / s.n_rows AS expected_probe_amp,
           h.hot_key,
           CAST(s.max_group * s.ndv AS DOUBLE) / s.n_rows AS skew_factor
    FROM stats s JOIN hot h USING (side)
    """,
)
def stats_join_key_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-planning statistics for the two fact-side join keys — the
    report that decides broadcast vs shuffle vs salting BEFORE a 100 TB
    join runs: NDV (exact), row count, max/avg group size, the hottest
    key (lowest key among ties, deterministic), expected probe
    amplification E[group size of a random row] = sum(n_i^2)/N (what a
    shuffle join actually pays under skew), and skew_factor =
    max_group/avg_group.  skew_factor >> 1 is the salting trigger;
    sum(n^2) is the join-output estimator for self/fk joins.

    Scale shape: one map-side-combinable (side, key) count, then a
    side-keyed rollup of the tiny per-key table — classic two-level
    aggregation; nothing data-sized reaches the driver.  Floats are
    single divisions of exact bigints, bit-identical cross-engine."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    o = table(spark, sf_dir, "orders").select(
        F.lit("orders.o_custkey").alias("side"), F.col("o_custkey").alias("k")
    )
    li = table(spark, sf_dir, "lineitem").select(
        F.lit("lineitem.l_orderkey").alias("side"), F.col("l_orderkey").alias("k")
    )
    per_key = (
        o.unionByName(li).groupBy("side", "k").agg(F.count(F.lit(1)).alias("n"))
    )
    # hot key rides the SAME side-rollup as the other stats (r11, guide
    # §1.2/§2.4): max over struct(n, -k) picks the largest group and the
    # LOWEST key among ties — identical to the previous window + min,
    # without the second evaluation of per_key (both fact tables were
    # scanned twice), the window exchange, and the join.
    stats = per_key.groupBy("side").agg(
        F.count(F.lit(1)).alias("ndv"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_group"),
        F.sum(F.col("n") * F.col("n")).alias("sum_sq_group"),
        (-F.max(F.struct(F.col("n"), (-F.col("k")).alias("nk"))).getField("nk"))
        .alias("hot_key"),
    )
    return stats.select(
        "side",
        "ndv",
        "n_rows",
        "max_group",
        (F.col("n_rows").cast("double") / F.col("ndv").cast("double")).alias(
            "avg_group"
        ),
        (
            F.col("sum_sq_group").cast("double") / F.col("n_rows").cast("double")
        ).alias("expected_probe_amp"),
        "hot_key",
        (
            (F.col("max_group") * F.col("ndv")).cast("double")
            / F.col("n_rows").cast("double")
        ).alias("skew_factor"),
    )


@register(
    "stats_numeric_correlations",
    oracle="""
    WITH q AS (
      SELECT CAST(l_quantity AS BIGINT) AS x1,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 10000 AS x2,
             CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS x3,
             CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT) AS x4
      FROM lineitem
    ), m AS (
      SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
             CAST(SUM(x1) AS DECIMAL(38,0)) AS s1, CAST(SUM(x2) AS DECIMAL(38,0)) AS s2,
             CAST(SUM(x3) AS DECIMAL(38,0)) AS s3, CAST(SUM(x4) AS DECIMAL(38,0)) AS s4,
             CAST(SUM(x1*x1) AS DECIMAL(38,0)) AS s11, CAST(SUM(x2*x2) AS DECIMAL(38,0)) AS s22,
             CAST(SUM(x3*x3) AS DECIMAL(38,0)) AS s33, CAST(SUM(x4*x4) AS DECIMAL(38,0)) AS s44,
             CAST(SUM(x1*x2) AS DECIMAL(38,0)) AS s12, CAST(SUM(x1*x3) AS DECIMAL(38,0)) AS s13,
             CAST(SUM(x1*x4) AS DECIMAL(38,0)) AS s14, CAST(SUM(x2*x3) AS DECIMAL(38,0)) AS s23,
             CAST(SUM(x2*x4) AS DECIMAL(38,0)) AS s24, CAST(SUM(x3*x4) AS DECIMAL(38,0)) AS s34
      FROM q
    )
    SELECT pair, CAST(n AS BIGINT) AS n_rows,
           CAST(num AS DOUBLE)
             / (sqrt(CAST(d1 AS DOUBLE)) * sqrt(CAST(d2 AS DOUBLE))) AS corr
    FROM (
      SELECT 'quantity~price_h' AS pair, n, n*s12 - s1*s2 AS num,
             n*s11 - s1*s1 AS d1, n*s22 - s2*s2 AS d2 FROM m
      UNION ALL
      SELECT 'quantity~discount_pc', n, n*s13 - s1*s3, n*s11 - s1*s1, n*s33 - s3*s3 FROM m
      UNION ALL
      SELECT 'quantity~tax_pc', n, n*s14 - s1*s4, n*s11 - s1*s1, n*s44 - s4*s4 FROM m
      UNION ALL
      SELECT 'price_h~discount_pc', n, n*s23 - s2*s3, n*s22 - s2*s2, n*s33 - s3*s3 FROM m
      UNION ALL
      SELECT 'price_h~tax_pc', n, n*s24 - s2*s4, n*s22 - s2*s2, n*s44 - s4*s4 FROM m
      UNION ALL
      SELECT 'discount_pc~tax_pc', n, n*s34 - s3*s4, n*s33 - s3*s3, n*s44 - s4*s4 FROM m
    )
    """,
)
def stats_numeric_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations of the four lineitem measures from
    EXACT integer moments in ONE pass — the multivariate profiling step
    (feature redundancy / leakage detection) done the way a 100 TB
    engine must: 14 map-side-combinable integer sums (no per-pair
    passes, no sampling), then corr assembled per pair as a fixed
    5-op IEEE chain (cast, sqrt, sqrt, multiply, divide) over
    decimal-exact determinant terms, so every digit matches the oracle.
    Units are chosen to bound the moments (price floored to
    hundred-dollar units, discount/tax in percent-hundredths) — sums of
    squares stay < 1e15 even at 6e8 rows.  The 6 output rows are
    exploded from the single moment row, keeping the whole computation
    in-plan."""
    from pyspark.sql import functions as F

    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("bigint").alias("x1"),
        # via exact cents then integer floor-div: a direct double->bigint
        # cast ROUNDS in DuckDB but TRUNCATES in Spark (measured: one
        # flipped unit moved corr by 1e-6) — the decimal path is the
        # engine-agnostic quantizer
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) div 10000"
        ).alias("x2"),
        (F.col("l_discount").cast("decimal(18,2)") * 100).cast("bigint").alias("x3"),
        (F.col("l_tax").cast("decimal(18,2)") * 100).cast("bigint").alias("x4"),
    )
    # Py4J expression diet (r12, guide §7.3): the 15 moment aggregates
    # and the 6-struct pair array used to be composed op-by-op through
    # the Column API (~3,400 gateway round-trips traced per build);
    # each now arrives as one parsed SQL string building the identical
    # expression tree — same COUNT/SUM/CAST/Multiply nodes, same
    # decimal(38,0) moment types, every oracle digit unchanged.
    d38 = "DECIMAL(38,0)"
    aggs = [F.expr(f"CAST(COUNT(1) AS {d38}) AS n")]
    for i in range(1, 5):
        aggs.append(F.expr(f"CAST(SUM(x{i}) AS {d38}) AS s{i}"))
    for i in range(1, 5):
        for j in range(i, 5):
            aggs.append(F.expr(f"CAST(SUM(x{i} * x{j}) AS {d38}) AS s{i}{j}"))
    m = li.agg(*aggs)
    pairs = [
        ("quantity~price_h", 1, 2),
        ("quantity~discount_pc", 1, 3),
        ("quantity~tax_pc", 1, 4),
        ("price_h~discount_pc", 2, 3),
        ("price_h~tax_pc", 2, 4),
        ("discount_pc~tax_pc", 3, 4),
    ]
    structs = ", ".join(
        f"named_struct('pair', '{name}', "
        f"'num', n * s{min(i, j)}{max(i, j)} - s{i} * s{j}, "
        f"'d1', n * s{i}{i} - s{i} * s{i}, "
        f"'d2', n * s{j}{j} - s{j} * s{j})"
        for name, i, j in pairs
    )
    rows = F.expr(f"array({structs})")
    return (
        m.select(F.col("n").cast("bigint").alias("n_rows"), F.explode(rows).alias("e"))
        .select(
            F.col("e.pair").alias("pair"),
            "n_rows",
            (
                F.col("e.num").cast("double")
                / (
                    F.sqrt(F.col("e.d1").cast("double"))
                    * F.sqrt(F.col("e.d2").cast("double"))
                )
            ).alias("corr"),
        )
    )


@register(
    "basket_part_pairs",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ), pairs AS (
      SELECT a.pk AS part_a, b.pk AS part_b
      FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
    )
    SELECT part_a, part_b, COUNT(*) AS n_orders
    FROM pairs GROUP BY part_a, part_b
    HAVING COUNT(*) >= 2
    """,
)
def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence (the support-2 itemset stage): part
    pairs ordered together in >= 2 orders.  The pair generation is a
    WITHIN-ORDER self-join — fanout bounded by order size (TPC-H max 7
    lines), so pair volume is <= C(7,2) * |orders|, linear in data, and
    the join key (l_orderkey) is the natural co-location key: with
    lineitem bucketed by orderkey this is a zero-exchange join.  The
    classic a-priori first step, NOT an all-pairs over the part
    catalog."""
    from pyspark.sql import functions as F

    # Two shuffles, no join: group each order's distinct parts into a
    # sorted array (collect_set dedups in the same aggregate — no
    # separate DISTINCT shuffle), then emit the C(k,2) pairs JVM-side
    # from the bounded array and count.  The self-join formulation
    # measured 17.9x at the sf1→sf10 decade (three data-sized shuffles
    # + the joined intermediate materialized); this shape is 2 shuffles
    # and the pair explode never leaves the task.
    baskets = (
        table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("ok"))
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
    )
    pairs = baskets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("parts"),
                    lambda x, i: F.transform(
                        F.slice(
                            F.col("parts"),
                            i + 2,
                            F.greatest(F.size("parts") - i - 1, F.lit(0)),
                        ),
                        lambda y: F.struct(
                            x.alias("part_a"), y.alias("part_b")
                        ),
                    ),
                )
            )
        ).alias("p")
    )
    return (
        pairs.groupBy(F.col("p.part_a").alias("part_a"), F.col("p.part_b").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
    )


@register(
    "stats_revenue_trend_by_nation",
    oracle="""
    WITH monthly AS (
      SELECT c_nationkey AS nation,
             (EXTRACT(YEAR FROM o_orderdate) - 1995) * 12
               + EXTRACT(MONTH FROM o_orderdate) - 1 AS x,
             SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS y
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2
    ), m AS (
      SELECT nation, CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
             CAST(SUM(x) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(x * x) AS DECIMAL(38,0)) AS sxx,
             CAST(SUM(x * y) AS DECIMAL(38,0)) AS sxy
      FROM monthly GROUP BY nation
    )
    SELECT nation, CAST(n AS BIGINT) AS n_months,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) AS slope_cents_per_month,
           CAST(sy * sxx - sx * sxy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) AS intercept_cents
    FROM m WHERE n * sxx - sx * sx > 0
    """,
)
def stats_revenue_trend_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation revenue trend: OLS slope/intercept of monthly revenue
    over the month index, assembled from EXACT integer moments (month
    index, cent-quantized revenue) — the grouped-regression pattern for
    'which segments are growing' over arbitrary group counts in two
    keyed aggregates, no per-group iteration.  Each output float is one
    IEEE division of decimal-exact terms.  Months with no orders are
    absent (trend over observed months, stated contract).  Scale shape:
    monthly cells = nations x months (tiny), moments ride a second
    nation-keyed aggregate; the broadcast customer join is the only
    data-sized operation."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    monthly = (
        o.join(broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nation"),
            (
                (F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1
            ).alias("x"),
        )
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
            ).alias("y")
        )
    )
    d38 = "decimal(38,0)"
    m = monthly.groupBy("nation").agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum("x").cast(d38).alias("sx"),
        F.sum("y").cast(d38).alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast(d38).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast(d38).alias("sxy"),
    )
    det = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return m.filter(det > 0).select(
        "nation",
        F.col("n").cast("bigint").alias("n_months"),
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / det.cast("double")
        ).alias("slope_cents_per_month"),
        (
            (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")).cast("double")
            / det.cast("double")
        ).alias("intercept_cents"),
    )
