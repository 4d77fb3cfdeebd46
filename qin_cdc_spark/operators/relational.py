"""Relational query surface (SURVEY.md §2.B) — pure DataFrame/Catalyst.

Every function takes ``(spark, sf_dir)`` and returns a DataFrame; the
paired DuckDB oracle SQL lives in ``ORACLES`` under the same key.  All
computed columns are aliased identically on both sides (the driver's
compare hashes values under sorted column names).

Scale notes (100 TB design intent, verified on .explain at sf0.1):

- Dimension joins (region/nation/supplier/part) are explicitly
  ``broadcast()`` — at any SF these stay KB-to-GB while fact tables grow,
  so the join must never shuffle the fact side.
- Fact-fact joins (orders⋈lineitem) shuffle on the join key; AQE handles
  skew splitting.  On a real deployment co-locating by bucketing
  ``l_orderkey``/``o_orderkey`` removes the shuffle entirely.
- Aggregations use partial (map-side) aggregation automatically; we keep
  grouping keys low-cardinality-first where possible.
- Window functions shuffle once on ``partitionBy`` and sort within
  partitions — the per-customer partitions here are tiny and uniform.

Reference parity: the reference engine (qin-cdc) has no query surface of
its own — its OLAP targets (StarRocks/Doris) answer these.  Per
SURVEY.md §2.B these operators are the declared query capabilities of
our engine over synced tables.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.functions import broadcast

from qin_cdc_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# Flagship aggregations
# ---------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: scan → filter → hash agg.

    Catalyst pushes the shipdate filter into the parquet scan
    (PushedFilters) and prunes to the 7 referenced columns (ReadSchema);
    partial aggregation makes the shuffle carry only
    |returnflag×linestatus| rows per partition.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
            ).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       sum(l_extendedprice) AS sum_base_price,
       sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
       sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
       avg(l_quantity) AS avg_qty,
       avg(l_extendedprice) AS avg_price,
       avg(l_discount) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: 3-way join + agg + deterministic top-10.

    customer is the small side → broadcast; orders⋈lineitem shuffles on
    orderkey (AQE coalesces).  Tie-break on o_orderkey makes the top-10
    set deterministic.
    """
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1995-03-15"))
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1995-03-15"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


Q3_ORACLE = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       sum(l_extendedprice * (1 - l_discount)) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style 6-way join: all dims broadcast, one fact shuffle."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


Q5_ORACLE = """
SELECT n_name, r_name,
       sum(l_extendedprice * (1 - l_discount)) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY n_name, r_name
"""


# ---------------------------------------------------------------------------
# Projection & filter (reference transforms A15-A17, A19 analog)
# ---------------------------------------------------------------------------

def proj_select_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """select / alias-rename / computed column / drop.

    This is the Spark form of the reference's column mapper + rename /
    delete-column transforms (SURVEY §2.A A15/A16/A19,
    /root/reference/transforms/trans_rename_column.go:62-74,
    core/meta.go:78-104): a pure projection Catalyst folds into the scan.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.withColumnRenamed("o_orderpriority", "priority")
        .withColumn("price_band", F.floor(F.col("o_totalprice") / 1000).cast("int"))
        .drop("o_orderdate")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "priority", "price_band")
    )


PROJ_ORACLE = """
SELECT o_orderkey, o_custkey, o_orderstatus,
       o_orderpriority AS priority,
       CAST(floor(o_totalprice / 1000) AS INTEGER) AS price_band
FROM orders
"""


def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive/disjunctive predicates, IN, BETWEEN, LIKE, null check."""
    part = load_table(spark, sf_dir, "part")
    return part.filter(
        (F.col("p_size").between(10, 40))
        & (F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
        & (F.col("p_name").like("%a%"))
        & (F.col("p_retailprice").isNotNull())
        & ((F.col("p_size") % 2 == 0) | (F.col("p_retailprice") > 1200))
    ).select("p_partkey", "p_name", "p_brand", "p_size", "p_retailprice")


FILTER_ORACLE = """
SELECT p_partkey, p_name, p_brand, p_size, p_retailprice
FROM part
WHERE p_size BETWEEN 10 AND 40
  AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
  AND p_name LIKE '%a%'
  AND p_retailprice IS NOT NULL
  AND (p_size % 2 = 0 OR p_retailprice > 1200)
"""


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------

def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "inner")
        .select("o_orderkey", "c_custkey", "c_name", "o_totalprice")
    )


JOIN_INNER_ORACLE = """
SELECT o_orderkey, c_custkey, c_name, o_totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
"""


def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers left-joined to their high-value orders; nulls preserved."""
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left")
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
    )


JOIN_LEFT_ORACLE = """
SELECT c_custkey, c_name, o_orderkey, o_totalprice
FROM customer LEFT JOIN (
  SELECT * FROM orders WHERE o_totalprice > 400000
) o ON c_custkey = o_custkey
"""


def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of customer-nations vs supplier-nations."""
    cn = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    sn = (
        load_table(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return (
        cn.join(sn, cn.c_nationkey == sn.s_nationkey, "full_outer")
        .select("c_nationkey", "n_customers", "s_nationkey", "n_suppliers")
    )


JOIN_FULL_ORACLE = """
SELECT c_nationkey, n_customers, s_nationkey, n_suppliers
FROM (SELECT c_nationkey, count(*) AS n_customers FROM customer GROUP BY c_nationkey) c
FULL OUTER JOIN
     (SELECT s_nationkey, count(*) AS n_suppliers FROM supplier GROUP BY s_nationkey) s
ON c_nationkey = s_nationkey
"""


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers that have at least one URGENT order (left semi)."""
    cust = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


JOIN_SEMI_ORACLE = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
"""


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no orders at all (left anti)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


JOIN_ANTI_ORACLE = """
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
"""


def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of two tiny dims (5 x 25 rows) — only sane when both
    sides are small; anything larger must be an equi/broadcast join."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return region.crossJoin(nation).select("r_regionkey", "r_name", "n_nationkey", "n_name")


JOIN_CROSS_ORACLE = """
SELECT r_regionkey, r_name, n_nationkey, n_name FROM region CROSS JOIN nation
"""


def join_range_nonequi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range (theta) join: lineitems shipped AFTER their order date.

    The equi half (orderkey) keeps this a hash join; the range predicate
    is evaluated as a post-join filter — never express this as a pure
    theta join (that would force a nested-loop/cartesian at scale).
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(
            orders,
            (li.l_orderkey == orders.o_orderkey)
            & (li.l_shipdate > orders.o_orderdate)
            & (F.datediff(li.l_shipdate, orders.o_orderdate) <= 30),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_quick_ships"),
            F.avg(F.datediff(li.l_shipdate, orders.o_orderdate)).alias("avg_lag_days"),
        )
    )


JOIN_RANGE_ORACLE = """
SELECT o_orderpriority,
       count(*) AS n_quick_ships,
       avg(datediff('day', o_orderdate, l_shipdate)) AS avg_lag_days
FROM lineitem JOIN orders
  ON l_orderkey = o_orderkey
 AND l_shipdate > o_orderdate
 AND datediff('day', o_orderdate, l_shipdate) <= 30
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Aggregation
# ---------------------------------------------------------------------------

def agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("o_totalprice").alias("sum_price"),
        F.avg("o_totalprice").alias("avg_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


AGG_BASIC_ORACLE = """
SELECT o_orderstatus,
       count(*) AS n_orders,
       sum(o_totalprice) AS sum_price,
       avg(o_totalprice) AS avg_price,
       min(o_totalprice) AS min_price,
       max(o_totalprice) AS max_price
FROM orders GROUP BY o_orderstatus
"""


def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(distinct) — expands to a two-phase agg under Catalyst."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


AGG_DISTINCT_ORACLE = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps,
       count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (status, priority); NULL marks the subtotal rows."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("o_totalprice").alias("sum_price"),
    )


AGG_ROLLUP_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders, sum(o_totalprice) AS sum_price
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_quantity").alias("sum_qty"),
    )


AGG_CUBE_ORACLE = """
SELECT l_returnflag, l_linestatus, count(*) AS n_rows, sum(l_quantity) AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders, avg(o_totalprice) AS avg_price
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


AGG_GROUPING_SETS_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders, avg(o_totalprice) AS avg_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------

def win_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number per customer over totalprice desc (orderkey tiebreak)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return orders.select(
        "o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn")
    )


WIN_ROW_NUMBER_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice,
       -- INTEGER casts throughout these oracles: DuckDB window/rank/length
       -- functions return BIGINT where Spark's are int — align the driver hash
       CAST(row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey ASC)
            AS INTEGER) AS rn
FROM orders
"""


def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank + dense_rank over a deliberately tie-heavy key (p_size)."""
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.col("p_size").asc())
    return part.select(
        "p_brand",
        "p_partkey",
        "p_size",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


WIN_RANK_ORACLE = """
SELECT p_brand, p_partkey, p_size,
       CAST(rank() OVER (PARTITION BY p_brand ORDER BY p_size ASC)
            AS INTEGER) AS rnk,
       CAST(dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size ASC)
            AS INTEGER) AS drnk
FROM part
"""


def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Previous/next order value per customer in date order."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice", 1).over(w).alias("prev_price"),
        F.lead("o_totalprice", 1).over(w).alias("next_price"),
    )


WIN_LAG_LEAD_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice,
       lag(o_totalprice, 1) OVER w AS prev_price,
       lead(o_totalprice, 1) OVER w AS next_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
"""


def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer (rowsBetween unbounded-preceding)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey", "o_orderkey", F.sum("o_totalprice").over(w).alias("running_total")
    )


WIN_RUNNING_SUM_ORACLE = """
SELECT o_custkey, o_orderkey,
       sum(o_totalprice) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate ASC, o_orderkey ASC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       AS running_total
FROM orders
"""


def win_range_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rangeBetween: count of same-brand parts within ±5 of each size."""
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.col("p_size").asc()).rangeBetween(-5, 5)
    return part.select(
        "p_brand", "p_partkey", "p_size", F.count(F.lit(1)).over(w).alias("n_near_size")
    )


WIN_RANGE_BETWEEN_ORACLE = """
SELECT p_brand, p_partkey, p_size,
       count(*) OVER (PARTITION BY p_brand ORDER BY p_size ASC
                      RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS n_near_size
FROM part
"""


def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — the scalable top-k idiom: one window
    shuffle, filter on rank.  Never sort-then-collect per group."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


TOPK_PER_GROUP_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn <= 3
"""


def sort_limit_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-50 — Spark executes as per-partition top-k + merge
    (TakeOrderedAndProject), never a full global sort."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(50)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


SORT_LIMIT_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50
"""


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------

def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two key sets (by name — order-safe)."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side")
    )
    return cust.unionByName(supp)


SETOP_UNION_ALL_ORACLE = """
SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
UNION ALL
SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
"""


def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.unionByName(supp).distinct()


SETOP_UNION_DISTINCT_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
"""


def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation keys present among BOTH customers and suppliers."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.intersect(supp)


SETOP_INTERSECT_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
"""


def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation keys with customers but no suppliers (EXCEPT distinct)."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.subtract(supp)


SETOP_EXCEPT_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
"""


# ---------------------------------------------------------------------------
# Scalar functions
# ---------------------------------------------------------------------------

def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concat / substring / upper / split — all JVM-side built-ins."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.concat(F.col("c_name"), F.lit("@"), F.col("c_mktsegment")).alias("tagged"),
        F.upper(F.col("c_mktsegment")).alias("segment_uc"),
        F.substring(F.col("c_name"), 1, 8).alias("name_prefix"),
        F.size(F.split(F.col("c_name"), "#")).alias("name_parts"),
        F.length(F.col("c_name")).alias("name_len"),
    )


FN_STRING_ORACLE = """
SELECT c_custkey,
       concat(c_name, '@', c_mktsegment) AS tagged,
       upper(c_mktsegment) AS segment_uc,
       substring(c_name, 1, 8) AS name_prefix,
       CAST(len(string_split(c_name, '#')) AS INTEGER) AS name_parts,
       CAST(length(c_name) AS INTEGER) AS name_len
FROM customer
"""


def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc / year / month / datediff."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.trunc(F.col("o_orderdate"), "month").alias("order_month"),
        F.year(F.col("o_orderdate")).alias("order_year"),
        F.month(F.col("o_orderdate")).alias("order_month_num"),
        F.datediff(F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_eoy"
        ),
    )


FN_DATE_ORACLE = """
SELECT o_orderkey,
       date_trunc('month', o_orderdate) AS order_month,
       CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(month(o_orderdate) AS INTEGER) AS order_month_num,
       CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS INTEGER)
         AS days_to_eoy
FROM orders
"""


def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round / abs / floor / ceil / mod on positive money values."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice"), 1).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor(F.col("l_quantity")).alias("qty_floor"),
        F.ceil(F.col("l_tax") * 100).alias("tax_pct_ceil"),
        (F.col("l_orderkey") % 7).alias("ok_mod7"),
    )


FN_MATH_ORACLE = """
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice, 1) AS price_r1,
       abs(l_discount - 0.05) AS disc_dev,
       CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
       CAST(ceil(l_tax * 100) AS BIGINT) AS tax_pct_ceil,
       l_orderkey % 7 AS ok_mod7
FROM lineitem
"""


def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size / element_at / slice + F.aggregate over array<float>.

    The L2-norm is computed with F.aggregate (JVM higher-order function)
    — no Python UDF; stays inside codegen.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size(F.col("embedding")).alias("dim"),
        F.element_at(F.col("embedding"), 1).alias("first_val"),
        F.aggregate(
            F.col("embedding"),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        ).alias("sq_norm"),
    )


FN_ARRAY_ORACLE = """
SELECT vec_id,
       CAST(len(embedding) AS INTEGER) AS dim,
       embedding[1] AS first_val,
       list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
         AS sq_norm
FROM embeddings
"""


def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object / from_json over the events.props JSON column."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object(F.col("props"), "$.k").alias("k_str"),
        F.get_json_object(F.col("props"), "$.k").cast("long").alias("k_num"),
    )


FN_JSON_ORACLE = """
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
FROM events
"""


# ---------------------------------------------------------------------------
# Registry for this module
# ---------------------------------------------------------------------------

QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_region_revenue": q5_region_revenue,
    "proj_select_alias": proj_select_alias,
    "filter_predicates": filter_predicates,
    "join_inner_equi": join_inner_equi,
    "join_left_outer": join_left_outer,
    "join_full_outer": join_full_outer,
    "join_semi": join_semi,
    "join_anti": join_anti,
    "join_cross": join_cross,
    "join_range_nonequi": join_range_nonequi,
    "agg_basic": agg_basic,
    "agg_distinct": agg_distinct,
    "agg_rollup": agg_rollup,
    "agg_cube": agg_cube,
    "agg_grouping_sets": agg_grouping_sets,
    "win_row_number": win_row_number,
    "win_rank_dense": win_rank_dense,
    "win_lag_lead": win_lag_lead,
    "win_running_sum": win_running_sum,
    "win_range_between": win_range_between,
    "topk_per_group": topk_per_group,
    "sort_limit_global": sort_limit_global,
    "setop_union_all": setop_union_all,
    "setop_union_distinct": setop_union_distinct,
    "setop_intersect": setop_intersect,
    "setop_except": setop_except,
    "fn_string": fn_string,
    "fn_date": fn_date,
    "fn_math": fn_math,
    "fn_array": fn_array,
    "fn_json": fn_json,
}

ORACLES = {
    "q1_pricing_summary": Q1_ORACLE,
    "q3_shipping_priority": Q3_ORACLE,
    "q5_region_revenue": Q5_ORACLE,
    "proj_select_alias": PROJ_ORACLE,
    "filter_predicates": FILTER_ORACLE,
    "join_inner_equi": JOIN_INNER_ORACLE,
    "join_left_outer": JOIN_LEFT_ORACLE,
    "join_full_outer": JOIN_FULL_ORACLE,
    "join_semi": JOIN_SEMI_ORACLE,
    "join_anti": JOIN_ANTI_ORACLE,
    "join_cross": JOIN_CROSS_ORACLE,
    "join_range_nonequi": JOIN_RANGE_ORACLE,
    "agg_basic": AGG_BASIC_ORACLE,
    "agg_distinct": AGG_DISTINCT_ORACLE,
    "agg_rollup": AGG_ROLLUP_ORACLE,
    "agg_cube": AGG_CUBE_ORACLE,
    "agg_grouping_sets": AGG_GROUPING_SETS_ORACLE,
    "win_row_number": WIN_ROW_NUMBER_ORACLE,
    "win_rank_dense": WIN_RANK_ORACLE,
    "win_lag_lead": WIN_LAG_LEAD_ORACLE,
    "win_running_sum": WIN_RUNNING_SUM_ORACLE,
    "win_range_between": WIN_RANGE_BETWEEN_ORACLE,
    "topk_per_group": TOPK_PER_GROUP_ORACLE,
    "sort_limit_global": SORT_LIMIT_ORACLE,
    "setop_union_all": SETOP_UNION_ALL_ORACLE,
    "setop_union_distinct": SETOP_UNION_DISTINCT_ORACLE,
    "setop_intersect": SETOP_INTERSECT_ORACLE,
    "setop_except": SETOP_EXCEPT_ORACLE,
    "fn_string": FN_STRING_ORACLE,
    "fn_date": FN_DATE_ORACLE,
    "fn_math": FN_MATH_ORACLE,
    "fn_array": FN_ARRAY_ORACLE,
    "fn_json": FN_JSON_ORACLE,
}
