"""Extended relational surface: subqueries, HAVING, CASE, casts, pivot,
more window functions, statistical aggregates, TPC-H-style workloads.

Same contract as operators/relational.py: every query aliased to match
its DuckDB oracle, built-ins only, Catalyst-optimized.
"""

from __future__ import annotations

from qin_cdc_spark.testing import gate_tmp

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.functions import broadcast

from qin_cdc_spark.sources.tables import load_table, register_views


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style: pure scan+filter+agg — the pushdown showcase
    (predicates reach the parquet reader as PushedFilters)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


Q6_ORACLE = """
SELECT sum(l_extendedprice * l_discount) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-style: join + conditional (CASE) aggregation."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
    high = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
    ).otherwise(0)
    return joined.groupBy("l_returnflag").agg(
        F.sum(high).alias("high_line_count"),
        F.sum(1 - high).alias("low_line_count"),
    )


Q12_ORACLE = """
SELECT l_returnflag,
       -- CAST AS BIGINT: DuckDB sum(int) is HUGEINT (→ float64 in pandas),
       -- Spark's is bigint — the round-1 driver hash-fail was exactly this.
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END)
            AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_returnflag
"""


def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style: broadcast dim join + ratio of conditional sums."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01")) & (F.col("l_shipdate") < F.lit("1996-10-01"))
    )
    part = load_table(spark, sf_dir, "part")
    joined = li.join(broadcast(part), li.l_partkey == part.p_partkey)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    return joined.agg(
        (F.lit(100.0) * F.sum(promo) / F.sum(rev)).alias("promo_revenue_pct")
    )


Q14_ORACLE = """
SELECT 100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                        THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
       / sum(l_extendedprice * (1 - l_discount)) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style: agg subquery feeding a semi-join filter."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
    )


Q18_ORACLE = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM orders
JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300) big
  ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery via SQL (Catalyst rewrites to semi-join)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
        """
    )


SUBQUERY_IN_ORACLE = """
SELECT o_orderkey, o_totalprice FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
"""


def subquery_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS (anti-join rewrite)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
        )
        """
    )


SUBQUERY_EXISTS_ORACLE = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
)
"""


def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate (above-average filter)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)
        """
    )


SCALAR_SUBQUERY_ORACLE = """
SELECT o_orderkey, o_totalprice FROM orders
WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)
"""


def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum("o_totalprice").alias("total"))
        .filter(F.col("n_orders") >= 20)
    )


AGG_HAVING_ORACLE = """
SELECT o_custkey, count(*) AS n_orders, sum(o_totalprice) AS total
FROM orders GROUP BY o_custkey HAVING count(*) >= 20
"""


def fn_case_cast_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/WHEN, cast matrix, coalesce/nullif."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("size_band"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        # decimal → string: exact fixed-scale text on both engines.  A bare
        # DECIMAL output hash-fails on the driver (DuckDB→pandas turns it
        # into float64, dropping trailing-zero cents; Spark keeps Decimal).
        F.col("o_totalprice").cast("decimal(18,2)").cast("string").alias("price_dec"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
            "status_or_open"
        ),
    )


FN_CASE_CAST_ORACLE = """
SELECT o_orderkey,
       CASE WHEN o_totalprice > 300000 THEN 'big'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'small' END AS size_band,
       CAST(o_orderkey AS VARCHAR) AS key_str,
       CAST(o_orderdate AS DATE) AS order_date,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_dec,
       coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open
FROM orders
"""


def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (oracle mirrors it as conditional aggregation)."""
    orders = load_table(spark, sf_dir, "orders")
    statuses = ["F", "O", "P"]
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", statuses)
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            *[F.coalesce(F.col(s), F.lit(0)).alias(f"n_{s}") for s in statuses],
        )
    )


PIVOT_ORACLE = """
SELECT o_orderpriority,
       count(*) FILTER (o_orderstatus = 'F') AS n_F,
       count(*) FILTER (o_orderstatus = 'O') AS n_O,
       count(*) FILTER (o_orderstatus = 'P') AS n_P
FROM orders GROUP BY o_orderpriority
"""


def win_ntile_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist / first & last value."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_orderstatus",
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("o_orderkey").over(wf).alias("first_key"),
        F.last("o_orderkey").over(wf).alias("last_key"),
    )


WIN_NTILE_ORACLE = """
SELECT o_orderstatus, o_orderkey,
       CAST(ntile(4) OVER w AS INTEGER) AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume,
       first_value(o_orderkey) OVER wf AS first_key,
       last_value(o_orderkey) OVER wf AS last_key
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice ASC, o_orderkey ASC),
       wf AS (PARTITION BY o_orderstatus ORDER BY o_totalprice ASC, o_orderkey ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates, rounded to absorb summation-order ulps."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("std_price"),
        F.round(F.var_samp("l_discount"), 8).alias("var_disc"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("covar_qty_price"),
    )


AGG_STATS_ORACLE = """
SELECT l_returnflag,
       round(stddev_samp(l_extendedprice), 4) AS std_price,
       round(var_samp(l_discount), 8) AS var_disc,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price
FROM lineitem GROUP BY l_returnflag
"""


def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median, p90)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.percentile("o_totalprice", 0.5).alias("median_price"),
        F.percentile("o_totalprice", 0.9).alias("p90_price"),
    )


AGG_PERCENTILE_ORACLE = """
SELECT o_orderstatus,
       quantile_cont(o_totalprice, 0.5) AS median_price,
       quantile_cont(o_totalprice, 0.9) AS p90_price
FROM orders GROUP BY o_orderstatus
"""


def explode_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode over array<float> (oracle: unnest WITH ORDINALITY)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    return emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).withColumn("pos", F.col("pos") + 1)


EXPLODE_ORACLE = """
SELECT vec_id, CAST(p AS INTEGER) AS pos, embedding[p] AS val
FROM (SELECT vec_id, embedding, unnest(range(1, len(embedding) + 1)) AS p
      FROM embeddings WHERE vec_id < 20)
"""


def approx_distinct_rows_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL) — engine-specific sketch estimates
    can't hash-match another engine, so the ORACLE-CHECKED surface is
    the accuracy contract instead (the sketch_hll_mergeable pattern):
    the exact per-group count is computed alongside (gate-scale harness;
    at 100 TB the sketch replaces it) and DuckDB asserts the estimate
    landed within the ±5% envelope.  Name kept for registry continuity
    — 'rows_only' is now historical."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    ).select(
        "l_returnflag",
        F.col("exact_parts").cast("long").alias("exact_parts"),
        (
            F.abs(F.col("approx") - F.col("exact_parts"))
            <= 0.05 * F.col("exact_parts")
        ).alias("approx_within_5pct"),
    )


APPROX_DISTINCT_ORACLE = """
SELECT l_returnflag,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       true AS approx_within_5pct
FROM lineitem GROUP BY 1
"""


QUERIES = {
    "q6_forecast_revenue": q6_forecast_revenue,
    "q12_shipmode_priority": q12_shipmode_priority,
    "q14_promo_effect": q14_promo_effect,
    "q18_large_orders": q18_large_orders,
    "subquery_in": subquery_in,
    "subquery_exists_correlated": subquery_exists_correlated,
    "scalar_subquery": scalar_subquery,
    "agg_having": agg_having,
    "fn_case_cast_null": fn_case_cast_null,
    "pivot_status_by_priority": pivot_status_by_priority,
    "win_ntile_percent": win_ntile_percent,
    "agg_stats": agg_stats,
    "agg_percentile": agg_percentile,
    "explode_posexplode": explode_posexplode,
    "approx_distinct_rows_only": approx_distinct_rows_only,
}

ORACLES = {
    "q6_forecast_revenue": Q6_ORACLE,
    "q12_shipmode_priority": Q12_ORACLE,
    "q14_promo_effect": Q14_ORACLE,
    "q18_large_orders": Q18_ORACLE,
    "subquery_in": SUBQUERY_IN_ORACLE,
    "subquery_exists_correlated": SUBQUERY_EXISTS_ORACLE,
    "scalar_subquery": SCALAR_SUBQUERY_ORACLE,
    "agg_having": AGG_HAVING_ORACLE,
    "fn_case_cast_null": FN_CASE_CAST_ORACLE,
    "pivot_status_by_priority": PIVOT_ORACLE,
    "win_ntile_percent": WIN_NTILE_ORACLE,
    "agg_stats": AGG_STATS_ORACLE,
    "agg_percentile": AGG_PERCENTILE_ORACLE,
    "explode_posexplode": EXPLODE_ORACLE,
    "approx_distinct_rows_only": APPROX_DISTINCT_ORACLE,
}


def asof_join_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every 'error' event, the user's most recent
    'purchase' at-or-before it (ASOF >=).

    Spark lacks a native ASOF JOIN; a range-join would explode to a
    broadcast-nested-loop at scale.  This is the scalable re-expression
    (SURVEY custom-operator path (a)): union both sides tagged, one
    window per user ordered by (ts, side), carry the last non-null
    purchase forward — ONE shuffle on user_id, linear scan, no pair
    blow-up.  Ordering puts the purchase before the error at equal ts,
    matching ASOF's inclusive bound.
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(0).alias("side"),
        F.col("event_id").alias("p_eid"),
        F.col("value").alias("p_val"),
        F.lit(None).cast("long").alias("event_id"),
    )
    e = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        "ts",
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("p_eid"),
        F.lit(None).cast("double").alias("p_val"),
        "event_id",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("side").asc(), F.col("p_eid").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    combined = p.unionByName(e).select(
        "user_id",
        "ts",
        "side",
        "event_id",
        F.last("p_eid", ignorenulls=True).over(w).alias("purch_event_id"),
        F.last("p_val", ignorenulls=True).over(w).alias("purch_value"),
    )
    return combined.filter(F.col("side") == 1).select(
        "user_id", "event_id", F.col("ts").alias("err_ts"), "purch_event_id", "purch_value"
    )


ASOF_ORACLE = """
SELECT e.user_id, e.event_id, e.ts AS err_ts,
       p.event_id AS purch_event_id, p.value AS purch_value
FROM (SELECT * FROM events WHERE event_type = 'error') e
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON e.user_id = p.user_id AND e.ts >= p.ts
"""


def scan_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source scan (§2.B scans row): round-trips the nation
    table through a JSONL file and reads it back with an explicit
    schema (schema-on-read; no inference job at scale)."""
    import tempfile

    nation = load_table(spark, sf_dir, "nation")
    path = gate_tmp("jsonl_scan_") + "/nation"
    nation.coalesce(1).write.mode("overwrite").json(path)
    return (
        spark.read.schema(nation.schema)
        .json(path)
        .select("n_nationkey", "n_name", "n_regionkey")
    )


SCAN_JSONL_ORACLE = """
SELECT n_nationkey, n_name, n_regionkey FROM nation
"""

QUERIES["asof_join_last_purchase"] = asof_join_last_purchase
QUERIES["scan_jsonl"] = scan_jsonl
ORACLES["asof_join_last_purchase"] = ASOF_ORACLE
ORACLES["scan_jsonl"] = SCAN_JSONL_ORACLE


def fn_string_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lpad/rpad/replace/translate/instr/repeat/reverse."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.lpad(F.col("c_mktsegment"), 12, "*").alias("seg_lpad"),
        F.rpad(F.col("c_mktsegment"), 12, "-").alias("seg_rpad"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_repl"),
        F.translate(F.col("c_mktsegment"), "AEIOU", "aeiou").alias("seg_trans"),
        F.instr(F.col("c_name"), "#").alias("hash_pos"),
        F.repeat(F.col("c_mktsegment"), 2).alias("seg_twice"),
        F.reverse(F.col("c_mktsegment")).alias("seg_rev"),
    )


FN_STRING_EXTRAS_ORACLE = """
SELECT c_custkey,
       lpad(c_mktsegment, 12, '*') AS seg_lpad,
       rpad(c_mktsegment, 12, '-') AS seg_rpad,
       replace(c_name, 'Customer', 'Cust') AS name_repl,
       translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_trans,
       CAST(strpos(c_name, '#') AS INTEGER) AS hash_pos,
       repeat(c_mktsegment, 2) AS seg_twice,
       reverse(c_mktsegment) AS seg_rev
FROM customer
"""


def fn_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map_from_arrays / map_keys / map_values / element access.

    Both engines preserve map insertion order, so keys/values arrays
    compare deterministically.
    """
    nation = load_table(spark, sf_dir, "nation")
    m = F.map_from_arrays(
        F.array(F.lit("key"), F.lit("region")),
        F.array(F.col("n_nationkey").cast("long"), F.col("n_regionkey").cast("long")),
    )
    return nation.select(
        "n_name",
        # arrays flattened to CSV: gate outputs are scalar-only by policy
        # (driver canon can't hash ndarray cells)
        F.array_join(F.map_keys(m), ",").alias("mkeys_csv"),
        F.array_join(
            F.transform(F.map_values(m), lambda v: v.cast("string")), ","
        ).alias("mvals_csv"),
        F.element_at(m, F.lit("region")).alias("region_val"),
    )


FN_MAP_ORACLE = """
SELECT n_name,
       array_to_string(map_keys(map(['key','region'],
                    [CAST(n_nationkey AS BIGINT), CAST(n_regionkey AS BIGINT)])), ',') AS mkeys_csv,
       array_to_string(map_values(map(['key','region'],
                      [CAST(n_nationkey AS BIGINT), CAST(n_regionkey AS BIGINT)])), ',') AS mvals_csv,
       map(['key','region'],
           [CAST(n_nationkey AS BIGINT), CAST(n_regionkey AS BIGINT)])['region'][1]
         AS region_val
FROM nation
"""

QUERIES["fn_string_extras"] = fn_string_extras
QUERIES["fn_map_ops"] = fn_map_ops
ORACLES["fn_string_extras"] = FN_STRING_EXTRAS_ORACLE
ORACLES["fn_map_ops"] = FN_MAP_ORACLE


def scan_partitioned_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned-table scan with partition pruning: orders written
    partitioned by o_orderstatus, read back with a partition filter —
    the layout/pruning pattern that bounds scan cost at 100 TB (the
    plan shows PartitionFilters, and non-matching directories are never
    opened).  tests assert the pruning in the physical plan."""
    import tempfile

    orders = load_table(spark, sf_dir, "orders")
    path = gate_tmp("part_scan_") + "/orders_by_status"
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    back = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F")
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("o_totalprice").alias("sum_price"),
    )


SCAN_PARTITIONED_ORACLE = """
SELECT o_orderpriority, count(*) AS n_orders, sum(o_totalprice) AS sum_price
FROM orders WHERE o_orderstatus = 'F' GROUP BY o_orderpriority
"""


def scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source scan with explicit schema + header."""
    import tempfile

    region = load_table(spark, sf_dir, "region")
    path = gate_tmp("csv_scan_") + "/region"
    region.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
    return (
        spark.read.schema(region.schema)
        .option("header", True)
        .csv(path)
        .select("r_regionkey", "r_name")
    )


SCAN_CSV_ORACLE = """
SELECT r_regionkey, r_name FROM region
"""


def sql_hint_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-surface broadcast hint (/*+ BROADCAST */)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT /*+ BROADCAST(nation) */ n_name, count(*) AS n_suppliers
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
        """
    )


SQL_HINT_ORACLE = """
SELECT n_name, count(*) AS n_suppliers
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""

QUERIES["scan_partitioned_pruned"] = scan_partitioned_pruned
QUERIES["scan_csv"] = scan_csv
QUERIES["sql_hint_broadcast"] = sql_hint_broadcast
ORACLES["scan_partitioned_pruned"] = SCAN_PARTITIONED_ORACLE
ORACLES["scan_csv"] = SCAN_CSV_ORACLE
ORACLES["sql_hint_broadcast"] = SQL_HINT_ORACLE


def scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source scan (columnar alternative to parquet; same pushdown/
    pruning properties through the same DataFrame surface)."""
    import tempfile

    nation = load_table(spark, sf_dir, "nation")
    path = gate_tmp("orc_scan_") + "/nation"
    nation.write.mode("overwrite").orc(path)
    return (
        spark.read.orc(path)
        .filter(F.col("n_regionkey") <= 2)
        .select("n_nationkey", "n_name", "n_regionkey")
    )


SCAN_ORC_ORACLE = """
SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_regionkey <= 2
"""


def setop_union_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName with allowMissingColumns — schema-evolution-tolerant
    append (new files carry extra columns; old rows take NULLs)."""
    region = load_table(spark, sf_dir, "region")
    old = region.select(F.col("r_regionkey").alias("key"), F.col("r_name").alias("name"))
    new = region.select(
        F.col("r_regionkey").alias("key"),
        F.col("r_name").alias("name"),
        F.length("r_name").alias("name_len"),
    )
    return old.unionByName(new, allowMissingColumns=True)


SETOP_UNION_MISSING_ORACLE = """
SELECT r_regionkey AS key, r_name AS name, NULL::INTEGER AS name_len FROM region
UNION ALL
SELECT r_regionkey, r_name, CAST(length(r_name) AS INTEGER) FROM region
"""


def agg_mode_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mode() / median() aggregates (order statistics family)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.mode("l_linenumber").alias("mode_line"),
        F.median("l_quantity").alias("median_qty"),
        F.count(F.lit(1)).alias("n"),
    )


AGG_MODE_MEDIAN_ORACLE = """
SELECT l_returnflag, mode(l_linenumber) AS mode_line,
       median(l_quantity) AS median_qty, count(*) AS n
FROM lineitem GROUP BY l_returnflag
"""


def win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value over a running frame (2nd order's price seen so far per
    status, in date order)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


WIN_NTH_VALUE_ORACLE = """
SELECT o_orderkey, o_orderstatus,
       nth_value(o_totalprice, 2) OVER (
         PARTITION BY o_orderstatus ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_price
FROM orders
"""

QUERIES["scan_orc"] = scan_orc
QUERIES["setop_union_missing"] = setop_union_missing
QUERIES["agg_mode_median"] = agg_mode_median
QUERIES["win_nth_value"] = win_nth_value
ORACLES["scan_orc"] = SCAN_ORC_ORACLE
ORACLES["setop_union_missing"] = SETOP_UNION_MISSING_ORACLE
ORACLES["agg_mode_median"] = AGG_MODE_MEDIAN_ORACLE
ORACLES["win_nth_value"] = WIN_NTH_VALUE_ORACLE


def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation with deterministic order (collect_list is
    unordered by contract — array_sort pins it, matching DuckDB's
    list(x ORDER BY x))."""
    nation = load_table(spark, sf_dir, "nation")
    # CSV-flattened array output: gate outputs are scalar-only by policy
    # (driver canon can't hash ndarray cells)
    return nation.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
            "nations_csv"
        ),
        F.count(F.lit(1)).alias("n"),
    )


AGG_COLLECT_SORTED_ORACLE = """
SELECT n_regionkey,
       array_to_string(list(n_name ORDER BY n_name), ',') AS nations_csv,
       count(*) AS n
FROM nation GROUP BY n_regionkey
"""


def fn_date_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar function family: add_months, last_day, quarter,
    dayofweek, day-of-year."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.add_months(d, 3).alias("plus_q"),
        F.last_day(d).alias("month_end"),
        F.quarter(d).alias("q"),
        F.dayofweek(d).alias("dow"),
        F.dayofyear(d).alias("doy"),
    )


FN_DATE_EXTRAS_ORACLE = """
SELECT o_orderkey,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus_q,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(quarter(o_orderdate) AS INTEGER) AS q,
       CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
       CAST(dayofyear(o_orderdate) AS INTEGER) AS doy
FROM orders
"""


def agg_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DECIMAL(18,2) money aggregation — no float accumulation
    drift by construction, the fixed-point path for financial rollups."""
    orders = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(18,2)")
    # Accumulate in exact decimal, publish as fixed-scale text: a DECIMAL
    # output column hash-fails on the driver (DuckDB→pandas float64 vs
    # Spark Decimal), while the string form is canon-proof on any hasher
    # and still shows the exact cents the decimal accumulation preserved.
    return orders.groupBy("o_orderstatus").agg(
        F.sum(price).cast("decimal(38,2)").cast("string").alias("sum_price_dec"),
        F.max(price).cast("string").alias("max_price_dec"),
        F.count(F.lit(1)).alias("n"),
    )


AGG_DECIMAL_EXACT_ORACLE = """
SELECT o_orderstatus,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR)
         AS sum_price_dec,
       CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS max_price_dec,
       count(*) AS n
FROM orders GROUP BY o_orderstatus
"""

QUERIES["agg_collect_sorted"] = agg_collect_sorted
QUERIES["fn_date_extras"] = fn_date_extras
QUERIES["agg_decimal_exact"] = agg_decimal_exact
ORACLES["agg_collect_sorted"] = AGG_COLLECT_SORTED_ORACLE
ORACLES["fn_date_extras"] = FN_DATE_EXTRAS_ORACLE
ORACLES["agg_decimal_exact"] = AGG_DECIMAL_EXACT_ORACLE


def win_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """last_value(... IGNORE NULLS) gap-fill: carry the last non-null
    'purchase' value forward over each user's event history — the
    canonical forward-fill."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    return ev.select(
        "event_id",
        "user_id",
        F.last(purchase_val, ignorenulls=True).over(w).alias("last_purchase_value"),
    )


WIN_IGNORE_NULLS_ORACLE = """
SELECT event_id, user_id,
       last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS last_purchase_value
FROM events
"""


def fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex function family: extract, extract-all, count."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_extract(F.col("text"), r"([a-z]+)ing\b", 1).alias("first_ing_stem"),
        # CSV-flattened (gate outputs are scalar-only by policy)
        F.array_join(
            F.regexp_extract_all(F.col("text"), F.lit(r"\b[a-z]{3}\b"), 0), ","
        ).alias("three_letter_csv"),
        F.regexp_count(F.col("text"), F.lit(r"\bthe\b")).alias("n_the"),
    )


FN_REGEXP_ORACLE = """
SELECT doc_id,
       coalesce(regexp_extract(text, '([a-z]+)ing\\b', 1), '') AS first_ing_stem,
       coalesce(array_to_string(regexp_extract_all(text, '\\b[a-z]{3}\\b'), ','), '')
         AS three_letter_csv,
       CAST(len(regexp_extract_all(text, '\\bthe\\b')) AS INTEGER) AS n_the
FROM documents
"""


def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grouping()/grouping_id over a cube — distinguishing real NULL
    group keys from superaggregate rows."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        # int on both sides: Spark grouping() is tinyint, DuckDB's is bigint
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_prio"),
    )


AGG_GROUPING_ID_ORACLE = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
       CAST(grouping(o_orderpriority) AS INTEGER) AS g_prio
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""

QUERIES["win_ignore_nulls"] = win_ignore_nulls
QUERIES["fn_regexp"] = fn_regexp
QUERIES["agg_grouping_id"] = agg_grouping_id
ORACLES["win_ignore_nulls"] = WIN_IGNORE_NULLS_ORACLE
ORACLES["fn_regexp"] = FN_REGEXP_ORACLE
ORACLES["agg_grouping_id"] = AGG_GROUPING_ID_ORACLE


def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt): per-status order metrics pivoted into
    (metric, value) rows — the DataFrame.unpivot surface."""
    orders = load_table(spark, sf_dir, "orders")
    wide = orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        F.sum("o_totalprice").alias("sum_price"),
        F.avg("o_totalprice").alias("avg_price"),
    )
    return wide.unpivot(
        "o_orderstatus", ["n_orders", "sum_price", "avg_price"], "metric", "value"
    )


UNPIVOT_METRICS_ORACLE = """
WITH wide AS (
  SELECT o_orderstatus, CAST(count(*) AS DOUBLE) AS n_orders,
         sum(o_totalprice) AS sum_price, avg(o_totalprice) AS avg_price
  FROM orders GROUP BY o_orderstatus)
SELECT o_orderstatus, 'n_orders' AS metric, n_orders AS value FROM wide
UNION ALL
SELECT o_orderstatus, 'sum_price', sum_price FROM wide
UNION ALL
SELECT o_orderstatus, 'avg_price', avg_price FROM wide
"""


def fn_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set-operation family over tokenized text: distinct+sort,
    slice, contains, position, except (stopword strip), join-to-string.
    All narrow higher-order functions — zero shuffle, codegen'd."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.trim(F.col("text")), r"\s+")
    return docs.select(
        "doc_id",
        # CSV-flattened array outputs (gate outputs are scalar-only by policy)
        F.array_join(F.sort_array(F.array_distinct(w)), ",").alias(
            "sorted_unique_csv"
        ),
        F.array_join(F.slice(w, 1, 5), ",").alias("first5_csv"),
        F.array_contains(w, "the").alias("has_the"),
        F.coalesce(F.array_position(w, "the"), F.lit(0)).cast("long").alias("the_pos"),
        F.array_join(
            F.sort_array(
                F.array_except(w, F.array(F.lit("the"), F.lit("a"), F.lit("of")))
            ),
            ",",
        ).alias("minus_stop_csv"),
        F.array_join(F.slice(w, 1, 5), " ").alias("first5_text"),
    )


FN_ARRAY_SETOPS_ORACLE = """
WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents)
SELECT doc_id,
       coalesce(array_to_string(list_sort(list_distinct(w)), ','), '')
         AS sorted_unique_csv,
       coalesce(array_to_string(w[1:5], ','), '') AS first5_csv,
       list_contains(w, 'the') AS has_the,
       CAST(coalesce(list_position(w, 'the'), 0) AS BIGINT) AS the_pos,
       coalesce(array_to_string(
         list_sort(list_distinct(list_filter(w, x -> x NOT IN ('the','a','of')))),
         ','), '') AS minus_stop_csv,
       array_to_string(w[1:5], ' ') AS first5_text
FROM t
"""


def date_spine_zerofill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-spine + zero-fill: sequence() of every day in the order
    range, left-joined to daily counts — the gaps-in-time-series
    pattern.  The spine is one row exploded (broadcast side); daily
    counts are one shuffle on date."""
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min(F.to_date("o_orderdate")).alias("lo"),
        F.max(F.to_date("o_orderdate")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("d")
    )
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        spine.join(daily, "d", "left")
        .select("d", F.coalesce(F.col("n"), F.lit(0)).alias("n_orders"))
    )


DATE_SPINE_ORACLE = """
WITH b AS (SELECT min(CAST(o_orderdate AS DATE)) AS lo,
                  max(CAST(o_orderdate AS DATE)) AS hi FROM orders),
spine AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d FROM b),
daily AS (SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n
          FROM orders GROUP BY 1)
SELECT spine.d AS d, coalesce(daily.n, 0) AS n_orders
FROM spine LEFT JOIN daily ON spine.d = daily.d
"""


def subquery_not_in_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN under three-valued logic: a NULL probe never qualifies
    (NULL NOT IN (...) is NULL, not TRUE) — Catalyst plans the
    null-aware anti-join; rows with nullified priority drop out."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n FROM orders
        WHERE nullif(o_orderpriority, '1-URGENT') NOT IN
              (SELECT o_orderpriority FROM orders
               WHERE o_orderpriority IN ('2-HIGH', '5-LOW'))
        GROUP BY o_orderpriority
        """
    )


SUBQUERY_NOT_IN_NULL_ORACLE = """
SELECT o_orderpriority, count(*) AS n FROM orders
WHERE nullif(o_orderpriority, '1-URGENT') NOT IN
      (SELECT o_orderpriority FROM orders
       WHERE o_orderpriority IN ('2-HIGH', '5-LOW'))
GROUP BY o_orderpriority
"""

QUERIES["unpivot_metrics"] = unpivot_metrics
QUERIES["fn_array_setops"] = fn_array_setops
QUERIES["date_spine_zerofill"] = date_spine_zerofill
QUERIES["subquery_not_in_null"] = subquery_not_in_null
ORACLES["unpivot_metrics"] = UNPIVOT_METRICS_ORACLE
ORACLES["fn_array_setops"] = FN_ARRAY_SETOPS_ORACLE
ORACLES["date_spine_zerofill"] = DATE_SPINE_ORACLE
ORACLES["subquery_not_in_null"] = SUBQUERY_NOT_IN_NULL_ORACLE


def fn_agg_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/ordered aggregate family: count_if, bool_and/bool_or,
    max_by/min_by (keyed on the globally-unique o_orderkey so ties
    cannot make the result nondeterministic)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.count_if(F.col("o_totalprice") > 100000).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_pos"),
        F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("any_urgent"),
        F.max_by("o_orderpriority", "o_orderkey").alias("prio_of_last_key"),
        F.min_by("o_orderpriority", "o_orderkey").alias("prio_of_first_key"),
    )


FN_AGG_EXTRAS_ORACLE = """
SELECT o_orderstatus,
       count(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
       bool_and(o_totalprice > 0) AS all_pos,
       bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
       arg_max(o_orderpriority, o_orderkey) AS prio_of_last_key,
       arg_min(o_orderpriority, o_orderkey) AS prio_of_first_key
FROM orders GROUP BY o_orderstatus
"""

QUERIES["fn_agg_extras"] = fn_agg_extras
ORACLES["fn_agg_extras"] = FN_AGG_EXTRAS_ORACLE


def sketch_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (DataSketches): one sketch per source
    group, unioned into a global distinct-customer estimate — the
    two-level pattern that makes distinct counts shuffle sketch bytes
    (KB) instead of values at 100 TB.  DuckDB's HLL is a different
    implementation, so the raw estimate has no exact oracle — instead
    the query carries its own measurement: the exact distinct count
    (computed alongside; at gate scale this is the test harness, at
    100 TB the sketch replaces it) and whether the merged estimate
    lands within the ±5% envelope the sketch family guarantees at this
    precision.  The oracle recomputes the exact side and asserts the
    bound held — an oracle-checked accuracy contract instead of a
    rows-only shrug."""
    orders = load_table(spark, sf_dir, "orders")
    per_status = orders.groupBy("o_orderstatus").agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    merged = per_status.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sk"))).alias("est"),
        F.sum("n_rows").alias("total_rows"),
    )
    exact = orders.agg(
        F.countDistinct("o_custkey").alias("exact_distinct_cust")
    )
    return merged.crossJoin(exact).select(
        "exact_distinct_cust",
        F.col("total_rows").cast("long").alias("total_rows"),
        (
            F.abs(F.col("est") - F.col("exact_distinct_cust"))
            <= 0.05 * F.col("exact_distinct_cust")
        ).alias("est_within_5pct"),
    )


SKETCH_HLL_MERGEABLE_ORACLE = """
SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_distinct_cust,
       CAST(count(*) AS BIGINT) AS total_rows,
       true AS est_within_5pct
FROM orders
"""

QUERIES["sketch_hll_mergeable"] = sketch_hll_mergeable
ORACLES["sketch_hll_mergeable"] = SKETCH_HLL_MERGEABLE_ORACLE


def hist_equi_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram: ntile(10) buckets over o_totalprice with
    per-bucket bounds and mass — the optimizer-statistics shape."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.orderBy(F.col("o_totalprice").asc(), F.col("o_orderkey").asc())
    return (
        orders.select("o_totalprice", F.ntile(10).over(w).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


HIST_EQUI_DEPTH_ORACLE = """
SELECT bucket, count(*) AS n, min(o_totalprice) AS lo, max(o_totalprice) AS hi
FROM (SELECT o_totalprice,
             CAST(ntile(10) OVER (ORDER BY o_totalprice ASC, o_orderkey ASC)
                  AS INTEGER) AS bucket
      FROM orders)
GROUP BY bucket
"""

QUERIES["hist_equi_depth"] = hist_equi_depth
ORACLES["hist_equi_depth"] = HIST_EQUI_DEPTH_ORACLE


def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar family (&, |, ^, shifts, popcount) + bit_and/
    bit_or aggregates — all codegen'd JVM expressions."""
    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return (
        orders.select(
            "o_orderstatus",
            k.bitwiseAND(F.lit(255)).alias("and255"),
            k.bitwiseOR(F.lit(16)).alias("or16"),
            k.bitwiseXOR(F.lit(99)).alias("xor99"),
            F.shiftleft(k, 2).alias("shl2"),
            F.shiftright(k, 3).alias("shr3"),
            F.bit_count(k).alias("pop"),
        )
        .groupBy("o_orderstatus")
        .agg(
            F.bit_and("and255").alias("agg_and"),
            F.bit_or("or16").alias("agg_or"),
            F.sum("xor99").alias("sum_xor"),
            F.sum("shl2").alias("sum_shl"),
            F.sum("shr3").alias("sum_shr"),
            F.sum("pop").alias("sum_pop"),
        )
    )


FN_BITWISE_ORACLE = """
SELECT o_orderstatus,
       bit_and(o_orderkey & 255) AS agg_and,
       bit_or(o_orderkey | 16) AS agg_or,
       CAST(sum(xor(o_orderkey, 99)) AS BIGINT) AS sum_xor,
       CAST(sum(o_orderkey << 2) AS BIGINT) AS sum_shl,
       CAST(sum(o_orderkey >> 3) AS BIGINT) AS sum_shr,
       CAST(sum(bit_count(o_orderkey)) AS BIGINT) AS sum_pop
FROM orders GROUP BY o_orderstatus
"""

QUERIES["fn_bitwise"] = fn_bitwise
ORACLES["fn_bitwise"] = FN_BITWISE_ORACLE


def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=>): NULL keys match each other —
    unlike plain equi-join where NULL = NULL is NULL.  Keys are
    nullified deterministically ('P' status → NULL) on both sides to
    exercise the semantics."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.groupBy(
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("ka")
    ).agg(F.count(F.lit(1)).alias("na"))
    b = orders.groupBy(
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("kb")
    ).agg(F.sum("o_totalprice").alias("sb"))
    return (
        a.join(b, F.col("ka").eqNullSafe(F.col("kb")))
        .select(F.col("ka").alias("k"), "na", F.round("sb", 2).alias("sb_r"))
    )


JOIN_NULL_SAFE_EQ_ORACLE = """
WITH a AS (SELECT nullif(o_orderstatus, 'P') AS ka, count(*) AS na
           FROM orders GROUP BY 1),
b AS (SELECT nullif(o_orderstatus, 'P') AS kb, sum(o_totalprice) AS sb
      FROM orders GROUP BY 1)
SELECT ka AS k, na, round(sb, 2) AS sb_r
FROM a JOIN b ON ka IS NOT DISTINCT FROM kb
"""


def win_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding time-range window: per event, activity in the user's
    preceding hour (rangeBetween on event-time seconds) — the
    rate-limiter / rolling-activity shape, computed with ONE shuffle on
    user_id.

    Determinism notes (both found by the sf0.1 spot-check, round 2):
    frame membership is defined on FLOOR-SECOND event time on both
    engines — Spark's unix_timestamp truncates to seconds, and an
    oracle using a microsecond-precision INTERVAL frame disagrees about
    boundary events; the summed value is quantized to integer cents so
    the windowed sum is exact regardless of either engine's in-frame
    summation order (a rounded float sum is a per-row rounding-boundary
    lottery at scale)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    cents = F.floor(F.col("value") * 100).cast("long")
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.sum(cents).over(w).alias("sum_cents_last_hour"),
    )


WIN_TIME_RANGE_ORACLE = """
SELECT event_id, user_id,
       count(*) OVER w AS n_last_hour,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER w AS BIGINT)
         AS sum_cents_last_hour
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""

QUERIES["join_null_safe_eq"] = join_null_safe_eq
QUERIES["win_time_range"] = win_time_range
ORACLES["join_null_safe_eq"] = JOIN_NULL_SAFE_EQ_ORACLE
ORACLES["win_time_range"] = WIN_TIME_RANGE_ORACLE


# --------------------------------------------------------------------------
# As-of join, FORWARD direction: for every 'error' event, the user's
# FIRST 'purchase' at-or-after it.  Same scalable shape as the backward
# form (one union + one window per user, no pair blow-up), scanned in
# descending time.  Tie rules pinned for determinism: inclusive at
# equal ts, smallest purchase event_id on equal-ts ties — the oracle's
# LATERAL ... ORDER BY ts, event_id LIMIT 1 independently encodes the
# same rule.
# --------------------------------------------------------------------------


def asof_join_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(0).alias("side"),
        F.col("event_id").alias("p_eid"),
        F.col("value").alias("p_val"),
        F.lit(None).cast("long").alias("event_id"),
    )
    e = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        "ts",
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("p_eid"),
        F.lit(None).cast("double").alias("p_val"),
        "event_id",
    )
    # descending scan: carry the most-recently-seen purchase, which is
    # the NEXT one in time; at equal ts purchases come first (side asc)
    # so the bound is inclusive, and equal-ts purchases scan in p_eid
    # DESC so the carried value ends at the smallest p_eid
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ts").desc(), F.col("side").asc(), F.col("p_eid").desc_nulls_last()
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    combined = p.unionByName(e).select(
        "user_id",
        "ts",
        "side",
        "event_id",
        F.last("p_eid", ignorenulls=True).over(w).alias("purch_event_id"),
        F.last("p_val", ignorenulls=True).over(w).alias("purch_value"),
    )
    return combined.filter(F.col("side") == 1).select(
        "user_id",
        "event_id",
        F.col("ts").alias("err_ts"),
        "purch_event_id",
        "purch_value",
    )


ASOF_FORWARD_ORACLE = """
SELECT e.user_id, e.event_id, e.ts AS err_ts,
       p.p_eid AS purch_event_id, p.p_val AS purch_value
FROM (SELECT * FROM events WHERE event_type = 'error') e
LEFT JOIN LATERAL (
  SELECT event_id AS p_eid, value AS p_val
  FROM events p
  WHERE p.event_type = 'purchase' AND p.user_id = e.user_id
    AND p.ts >= e.ts
  ORDER BY p.ts, p.event_id LIMIT 1) p ON true
"""

QUERIES["asof_join_next_purchase"] = asof_join_next_purchase
ORACLES["asof_join_next_purchase"] = ASOF_FORWARD_ORACLE


# --------------------------------------------------------------------------
# As-of join, NEAREST within a tolerance: the closest purchase within
# ±30 minutes of each error, backward preferred on exact distance ties.
# Two window passes over one tagged union (backward asc scan + forward
# desc scan, each carrying the candidate purchase id/value/timestamp),
# then a row-local pick — still one shuffle key (user_id), no pair
# explosion.  Distances are exact integer microseconds (unix_micros /
# epoch_us), so the tolerance predicate and tie rule are bit-identical
# across engines.
# --------------------------------------------------------------------------

ASOF_TOL_US = 30 * 60 * 1_000_000  # ±30 minutes


def asof_join_nearest_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.unix_micros("ts").alias("p_us"),
        F.lit(0).alias("side"),
        F.col("event_id").alias("p_eid"),
        F.col("value").alias("p_val"),
        F.lit(None).cast("long").alias("event_id"),
    )
    e = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("p_us"),
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("p_eid"),
        F.lit(None).cast("double").alias("p_val"),
        "event_id",
    )
    union = p.unionByName(e)
    wb = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("side").asc(), F.col("p_eid").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("side").asc(), F.col("p_eid").desc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    both = union.select(
        "user_id",
        "ts",
        "side",
        "event_id",
        F.last("p_eid", ignorenulls=True).over(wb).alias("b_eid"),
        F.last("p_val", ignorenulls=True).over(wb).alias("b_val"),
        F.last("p_us", ignorenulls=True).over(wb).alias("b_us"),
        F.last("p_eid", ignorenulls=True).over(wf).alias("f_eid"),
        F.last("p_val", ignorenulls=True).over(wf).alias("f_val"),
        F.last("p_us", ignorenulls=True).over(wf).alias("f_us"),
    ).filter(F.col("side") == 1)
    e_us = F.unix_micros("ts")
    b_d = e_us - F.col("b_us")  # >= 0 when present
    f_d = F.col("f_us") - e_us  # >= 0 when present
    b_ok = F.col("b_us").isNotNull() & (b_d <= ASOF_TOL_US)
    f_ok = F.col("f_us").isNotNull() & (f_d <= ASOF_TOL_US)
    # backward preferred on ties (b_d <= f_d keeps backward)
    pick_b = b_ok & (~f_ok | (b_d <= f_d))
    pick_f = f_ok & ~pick_b
    return both.select(
        "user_id",
        "event_id",
        F.col("ts").alias("err_ts"),
        F.when(pick_b, F.col("b_eid"))
        .when(pick_f, F.col("f_eid"))
        .alias("purch_event_id"),
        F.when(pick_b, F.col("b_val"))
        .when(pick_f, F.col("f_val"))
        .alias("purch_value"),
        F.when(pick_b, b_d).when(pick_f, f_d).alias("dist_us"),
    )


ASOF_NEAREST_ORACLE = f"""
SELECT e.user_id, e.event_id, e.ts AS err_ts,
       p.p_eid AS purch_event_id, p.p_val AS purch_value,
       p.dist_us
FROM (SELECT * FROM events WHERE event_type = 'error') e
LEFT JOIN LATERAL (
  SELECT event_id AS p_eid, value AS p_val,
         abs(epoch_us(p.ts) - epoch_us(e.ts)) AS dist_us
  FROM events p
  WHERE p.event_type = 'purchase' AND p.user_id = e.user_id
    AND abs(epoch_us(p.ts) - epoch_us(e.ts)) <= {ASOF_TOL_US}
  ORDER BY dist_us,
           CASE WHEN p.ts <= e.ts THEN 0 ELSE 1 END,
           CASE WHEN p.ts <= e.ts THEN -event_id ELSE event_id END
  LIMIT 1) p ON true
"""

QUERIES["asof_join_nearest_purchase"] = asof_join_nearest_purchase
ORACLES["asof_join_nearest_purchase"] = ASOF_NEAREST_ORACLE


def agg_stats_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical moments with EXACT integer arithmetic: per
    (returnflag, ship-month) group, the sample-variance numerator
    n·Σq² − (Σq)² and the covariance numerator n·Σqd − Σq·Σd between
    quantity and discount-percent.

    Float variance/corr aggregates are not bit-portable across engines
    (different summation orders and algorithms — Welford vs two-pass),
    so the published statistics are the cross-multiplied integer
    numerators over integer-valued columns (quantity is 1..50; discount
    ×100 is 0..10): any engine computes them bit-identically, and the
    real-valued statistic is numerator/(n·(n−1)) downstream.  Bounds:
    with per-group n ≤ ~1e8 and q ≤ 50, d ≤ 10 the numerators stay well
    inside int64; grouping by month keeps per-group n bounded at any
    corpus scale (use DECIMAL(38,0) sums if a coarser grouping is
    required).  One partial-agg shuffle carrying 5 longs per group."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    d = F.round(F.col("l_discount") * 100, 0).cast("long")
    g = (
        li.select(
            "l_returnflag",
            F.date_format("l_shipdate", "yyyy-MM").alias("ym"),
            q.alias("q"),
            d.alias("d"),
        )
        .groupBy("l_returnflag", "ym")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("q").alias("sum_q"),
            F.sum(F.col("q") * F.col("q")).alias("sum_q2"),
            F.sum("d").alias("sum_d"),
            F.sum(F.col("q") * F.col("d")).alias("sum_qd"),
        )
    )
    return g.select(
        "l_returnflag",
        "ym",
        F.col("n").cast("long").alias("n"),
        F.col("sum_q").cast("long").alias("sum_q"),
        (F.col("n") * F.col("sum_q2") - F.col("sum_q") * F.col("sum_q"))
        .cast("long")
        .alias("varnum_q"),
        (F.col("n") * F.col("sum_qd") - F.col("sum_q") * F.col("sum_d"))
        .cast("long")
        .alias("covnum_qd"),
    )


AGG_STATS_EXACT_ORACLE = """
SELECT l_returnflag, ym,
       CAST(n AS BIGINT) AS n,
       CAST(sum_q AS BIGINT) AS sum_q,
       CAST(n * sum_q2 - sum_q * sum_q AS BIGINT) AS varnum_q,
       CAST(n * sum_qd - sum_q * sum_d AS BIGINT) AS covnum_qd
FROM (
  SELECT l_returnflag, strftime(l_shipdate, '%Y-%m') AS ym,
         count(*) AS n,
         sum(CAST(l_quantity AS BIGINT)) AS sum_q,
         sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sum_q2,
         sum(CAST(round(l_discount * 100) AS BIGINT)) AS sum_d,
         sum(CAST(l_quantity AS BIGINT) * CAST(round(l_discount * 100) AS BIGINT)) AS sum_qd
  FROM lineitem GROUP BY 1, 2
)
"""

QUERIES["agg_stats_exact"] = agg_stats_exact
ORACLES["agg_stats_exact"] = AGG_STATS_EXACT_ORACLE
