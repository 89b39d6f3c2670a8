"""Extended TPC-H-style coverage: the remaining classic query shapes,
adapted to the driver tables' columns (no partsupp / l_shipmode /
l_commitdate / c_phone — see FIXTURES.md §B), each with a DuckDB oracle.

New plan shapes covered beyond queries/relational.py:

* q7  — two aliased broadcast joins of the same dim (nation as supplier
        nation AND customer nation) + OR-ed pair predicate;
* q8  — market-share: conditional share of a group aggregate per year;
* q9  — profit by (nation, year) over a 5-way join with a LIKE filter;
* q13 — LEFT OUTER join with an extra join-side predicate + double
        aggregation (distribution of counts);
* q15 — aggregate feeding an exact-max scalar comparison (top supplier);
* q16 — distinct-count variety over an IN/NOT-LIKE filtered join
        (lineitem stands in for partsupp as the part↔supplier relation);
* q17 — correlated scalar subquery (per-part average) → aggregate join;
* q19 — disjunction of three conjunctive predicate groups (OR pushdown);
* q21 — double-correlated EXISTS / NOT EXISTS self-joins on the fact;
* q22 — scalar subquery threshold + anti join + grouped aggregate.

The reference implements none of these (SURVEY.md §2.9); they complete the
engine's relational surface on the same tables its rules route into.

Scale posture: nation/region are always ``broadcast()``; the q21
self-semi/anti joins shuffle lineitem on l_orderkey only (key co-location
across all three legs); q15/q17/q22 scalar aggregates are single-row
broadcasts, never driver collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from hotdog_spark.queries import register
from hotdog_spark.sources.batch import table


def _dec(col, prec=12, scale=2):
    return col.cast(f"decimal({prec},{scale})")


def _one():
    return F.lit(1).cast("decimal(4,2)")


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations, by year
# ---------------------------------------------------------------------------

@register(
    "q7_nation_trade_volume",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             EXTRACT(year FROM l.l_shipdate) AS l_year,
             CAST(l.l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))
               AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the nation dim joins twice under different roles
    (supplier side and customer side) — two independent broadcasts of the
    same tiny table; the pair filter lands after both."""
    s = table(spark, sf_dir, "supplier")
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    volume = _dec(F.col("l_extendedprice")) * (_one() - _dec(F.col("l_discount"), 4))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(volume).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q8 — market share of one supplier nation within a customer region
# ---------------------------------------------------------------------------

@register(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume
                         ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))
               AS volume,
             n2.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of regional order
    volume per year — conditional numerator over a shared group
    denominator, computed in a single aggregate pass."""
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    volume = _dec(F.col("l_extendedprice")) * (_one() - _dec(F.col("l_discount"), 4))
    num = F.when(F.col("supp_nation") == "NATION_5", volume).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    return (
        l.join(broadcast(p), l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (F.sum(num).cast("double") / F.sum(volume).cast("double")).alias(
                "mkt_share"
            )
        )
    )


# ---------------------------------------------------------------------------
# Q9 — product-line profit by supplier nation and year
# ---------------------------------------------------------------------------

@register(
    "q9_product_profit",
    oracle="""
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             EXTRACT(year FROM o.o_orderdate) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))
               AS amount
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (profit term adapted: no ps_supplycost in the
    driver tables, so profit = discounted revenue).  The LIKE filter
    shrinks part before its broadcast; facts shuffle on their keys."""
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    n = table(spark, sf_dir, "nation")
    amount = _dec(F.col("l_extendedprice")) * (_one() - _dec(F.col("l_discount"), 4))
    return (
        l.join(broadcast(p), l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# Q13 — distribution of orders per customer (incl. zero)
# ---------------------------------------------------------------------------

@register(
    "q13_customer_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: LEFT OUTER join keeps order-less customers (COUNT of a
    null column = 0), with the priority exclusion living in the join
    condition, not a post-filter — semantics differ, and the oracle pins
    the correct one.  Double aggregation: per-customer count, then the
    distribution of counts."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# Q15 — top supplier(s) by quarterly revenue
# ---------------------------------------------------------------------------

@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the quarter's max-revenue supplier.  The revenue CTE is
    aggregated once and reused for both the scalar max and the join (Spark
    reuses the exchange); the max comparison stays in exact decimals."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            _dec(F.col("l_extendedprice")) * (_one() - _dec(F.col("l_discount"), 4))
        ).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    s = table(spark, sf_dir, "supplier")
    return (
        rev.join(broadcast(mx), rev.total_revenue == mx.max_revenue)
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Q16 — part/supplier variety (lineitem as the part↔supplier relation)
# ---------------------------------------------------------------------------

@register(
    "q16_part_supplier_variety",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (1, 5, 10, 15, 20, 25)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (lineitem stands in for the absent partsupp):
    how many distinct suppliers serve each surviving (brand, type, size).
    NOT-LIKE + IN-list prune part before its broadcast; COUNT(DISTINCT)
    expands then de-dups partial-aggregably."""
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 5, 10, 15, 20, 25))
    )
    l = table(spark, sf_dir, "lineitem")
    return (
        l.join(broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q17 — revenue from small-quantity orders of one brand
# ---------------------------------------------------------------------------

@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
             AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (
      SELECT l_partkey,
             0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                    / COUNT(*)) AS qty_threshold
      FROM lineitem GROUP BY l_partkey
    ) a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity < a.qty_threshold
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: correlated scalar subquery (per-part 20%-of-average
    quantity threshold) decorrelated into an aggregate join.  The per-part
    average uses exact decimal sums / counts so both engines compute the
    identical double threshold."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    thresholds = l.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (
            F.lit(0.2)
            * (F.sum(_dec(F.col("l_quantity"))).cast("double") / F.count(F.lit(1)))
        ).alias("qty_threshold")
    )
    return (
        l.join(broadcast(p), l.l_partkey == p.p_partkey)
        .join(thresholds, l.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (F.sum(_dec(F.col("l_extendedprice"))).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


# ---------------------------------------------------------------------------
# Q19 — discounted revenue under OR-ed predicate groups
# ---------------------------------------------------------------------------

@register(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
               AS DOUBLE) AS revenue,
           COUNT(*) AS n
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: three conjunctive groups OR-ed across both join sides.
    Catalyst derives the common single-side implications (brand IN-list on
    part, quantity range on lineitem) and pushes them below the join while
    keeping the exact disjunction above it."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    g1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & q.between(1, 11)
    )
    g2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 25)
        & q.between(10, 20)
    )
    g3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 35)
        & q.between(20, 30)
    )
    rev = _dec(F.col("l_extendedprice")) * (_one() - _dec(F.col("l_discount"), 4))
    return (
        l.join(broadcast(p), l.l_partkey == p.p_partkey)
        .filter(g1 | g2 | g3)
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who shipped last on multi-supplier finished orders
# ---------------------------------------------------------------------------

@register(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s.s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (l_receiptdate/l_commitdate absent — "kept the
    order waiting" becomes "shipped strictly last among the order's
    suppliers"): correlated EXISTS → left-semi self-join, correlated
    NOT EXISTS → left-anti self-join with a non-equi shipdate leg.  All
    three lineitem legs hash on l_orderkey, so at scale this is one
    co-partitioned shuffle reused across both self-joins."""
    l1 = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    l2 = l1.select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    l3 = l1.select(
        F.col("l_orderkey").alias("l3_orderkey"),
        F.col("l_suppkey").alias("l3_suppkey"),
        F.col("l_shipdate").alias("l3_shipdate"),
    )
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = table(spark, sf_dir, "supplier")
    candidates = (
        l1.join(o, l1.l_orderkey == o.o_orderkey, "left_semi")
        .join(
            l2,
            (F.col("l_orderkey") == F.col("l2_orderkey"))
            & (F.col("l_suppkey") != F.col("l2_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("l3_orderkey"))
            & (F.col("l_suppkey") != F.col("l3_suppkey"))
            & (F.col("l3_shipdate") > F.col("l_shipdate")),
            "left_anti",
        )
    )
    return (
        candidates.join(broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ---------------------------------------------------------------------------
# Q22 — dormant customers with above-average balances, by nation
# ---------------------------------------------------------------------------

@register(
    "q22_dormant_rich_customers",
    oracle="""
    SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority IN ('1-URGENT', '2-HIGH'))
    GROUP BY c_nationkey
    """,
)
def q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (c_phone country code absent — nationkey is the
    country bucket): customers richer than the positive-balance average
    with no urgent/high-priority order.  The average is a one-row
    broadcast; the NOT EXISTS is a left-anti join against orders.

    Dormancy predicate tuned to the synthetic generator (VERDICT r7
    item 1): every sf0.01 customer has at least one order, so the
    literal never-ordered population is empty at the driver's gate
    scale.  'Never placed an urgent/high order' keeps the identical
    anti-join-under-scalar-threshold shape and is nonempty at every
    verified scale: 1 group at sf0.001, 7 at sf0.01, 25 at
    sf0.1/sf1/sf10 (measured)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(_dec(F.col("c_acctbal"))).cast("double") / F.count(F.lit(1))).alias(
                "avg_bal"
            )
        )
    )
    return (
        c.join(broadcast(avg_bal), c.c_acctbal > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec(F.col("c_acctbal"))).cast("double").alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Q12 — late-shipment priority classification (l_shipmode absent:
# l_returnflag is the classification dimension, o_orderdate+90d the
# lateness proxy for the missing l_commitdate/l_receiptdate)
# ---------------------------------------------------------------------------

@register(
    "q12_late_shipment_priority",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
    GROUP BY l_returnflag
    """,
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join-side lateness predicate (non-equi on the two
    fact dates) feeding a conditional two-way classification aggregate."""
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q2 — best supplier per part in a region (partsupp absent: distinct
# lineitem (part, supplier) pairs are the relation; "min cost" becomes
# "max account balance")
# ---------------------------------------------------------------------------

@register(
    "q2_best_regional_supplier",
    oracle="""
    WITH ps AS (
      SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey FROM lineitem
    ), cand AS (
      SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM part p
      JOIN ps ON ps.partkey = p.p_partkey
      JOIN supplier s ON s.s_suppkey = ps.suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE p.p_size = 15 AND r.r_name = 'ASIA'
    )
    SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY p_partkey
                                   ORDER BY s_acctbal DESC, s_suppkey) AS rn
      FROM cand
    ) t WHERE rn = 1
    """,
)
def q2_best_regional_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated "best row per group" decorrelated into
    an arg-max ranking window over the filtered join; the distinct
    (part, supplier) projection collapses lineitem once before any joins."""
    from pyspark.sql.window import Window

    ps = (
        table(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey"))
        .distinct()
    )
    p = table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cand = (
        ps.join(broadcast(p), ps.partkey == p.p_partkey)
        .join(s, ps.suppkey == s.s_suppkey)
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    w = Window.partitionBy("p_partkey").orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
    return (
        cand.select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# Q20 — suppliers with significant stock of a part family, by nation
# (partsupp/availqty absent: shipped quantity from lineitem is the stock
# proxy; the two-level nested-IN chain is the shape under test)
# ---------------------------------------------------------------------------

@register(
    "q20_heavy_shippers_of_green_parts",
    oracle="""
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l
      WHERE l.l_partkey IN (
        SELECT p_partkey FROM part WHERE p_name LIKE '%blue%'
      )
      GROUP BY l.l_suppkey
      HAVING SUM(CAST(l.l_quantity AS DECIMAL(12,2))) > 1700
    )
    """,
)
def q20_heavy_shippers_of_green_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: two-level nested IN — an inner IN (a part-name
    family) pruning the fact aggregate whose HAVING feeds the outer IN
    (heavy suppliers), ending in a dim join.  Both INs decorrelate to
    left-semi joins; the part-side semi is a broadcast, the supplier-side
    list is a tiny aggregate output.

    Predicate tuned to the synthetic generator (VERDICT r7 item 1): the
    original TPC-H '%green%' colour token does not exist in the synthetic
    ``p_name`` vocabulary (colours are red/blue/…), and per-supplier
    shipped qty over a 10% name family is scale-stable at ~1.0k-2.8k, so
    '%blue%' + HAVING > 1700 selects a real, nonempty strict subset at
    every scale: 2/10 suppliers at sf0.001, 82/100 at sf0.01, 740/1000 at
    sf0.1, 7,831/10,000 at sf1, 79,716/100,000 at sf10 (measured)."""
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%blue%"))
    l = table(spark, sf_dir, "lineitem")
    heavy = (
        l.join(broadcast(p), l.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(_dec(F.col("l_quantity"))).alias("qty"))
        .filter(F.col("qty") > 1700)
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    return (
        s.join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
    )


# ---------------------------------------------------------------------------
# Q11 — nations holding a significant share of total shipped value
# (partsupp absent: lineitem value by supplier nation is the holding)
# ---------------------------------------------------------------------------

@register(
    "q11_significant_nation_value",
    oracle="""
    WITH nv AS (
      SELECT n.n_name,
             SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))) AS value_
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      GROUP BY n.n_name
    )
    SELECT n_name, CAST(value_ AS DOUBLE) AS total_value
    FROM nv
    WHERE value_ > (SELECT SUM(value_) * 0.05 FROM nv)
    """,
)
def q11_significant_nation_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: grouped totals filtered by a fraction-of-global
    scalar (HAVING > SUM(...)*x).  The grouped aggregate is computed once
    and reused for the one-row global sum (exchange reuse); the threshold
    comparison stays in exact decimals."""
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    nv = (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(_dec(F.col("l_extendedprice"), 14)).alias("value_"))
    )
    total = nv.agg((F.sum("value_") * F.lit(0.05)).alias("threshold"))
    return (
        nv.join(broadcast(total), nv.value_ > total.threshold)
        .select("n_name", F.col("value_").cast("double").alias("total_value"))
    )
