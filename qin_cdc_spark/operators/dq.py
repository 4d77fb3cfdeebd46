"""Declarative data-quality checking (Deequ-style): constraint reports
and column profiles as one-pass aggregations.

Production pipelines gate every published table on a constraint suite
(completeness, domain membership, uniqueness, referential integrity).
The Spark-first shape: all row-local predicates collapse into ONE
map-side-combinable aggregation pass regardless of how many constraints
are declared (each is a ``sum(case when violated)`` over the same
scan); only uniqueness (one distinct agg) and referential checks (one
left-anti join per foreign key) add passes, and each is itself a
standard shuffle-on-key aggregation that scales with AQE.

The reference (qin-cdc) validates rows only implicitly (type casts at
the sink, `outputs/*/*_utils.go`); a declarative DQ surface is part of
making its pipelines production-complete, north-star §2.C adjacent.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from qin_cdc_spark.sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}


def check_constraints(
    df: DataFrame, rules: list[tuple[str, Column]]
) -> DataFrame:
    """Evaluate row-local constraints in ONE aggregation pass.

    ``rules`` maps constraint name → boolean Column that must hold for
    every row.  Returns (constraint, violations, total, status) with
    status 'pass'/'fail' — constant rows out, one scan in.
    """
    aggs = [F.count(F.lit(1)).alias("_total")] + [
        F.sum(F.when(~cond, 1).otherwise(0)).alias(f"_v{i}")
        for i, (_, cond) in enumerate(rules)
    ]
    row = df.agg(*aggs)
    # ONE agg row exploded into report rows — a union of per-constraint
    # selects would re-execute the aggregation (and re-scan the input)
    # once per constraint
    entries = F.array(
        *[
            F.struct(
                F.lit(name).alias("constraint"),
                F.col(f"_v{i}").cast("long").alias("violations"),
                F.col("_total").cast("long").alias("total"),
                F.when(F.col(f"_v{i}") == 0, F.lit("pass"))
                .otherwise(F.lit("fail"))
                .alias("status"),
            )
            for i, (name, _) in enumerate(rules)
        ]
    )
    return row.select(F.explode(entries).alias("e")).select("e.*")


def check_unique(df: DataFrame, name: str, cols: list[str]) -> DataFrame:
    """Uniqueness constraint: rows minus distinct key count = violations."""
    agg = df.agg(
        F.count(F.lit(1)).alias("_total"),
        F.count_distinct(*[F.col(c) for c in cols]).alias("_d"),
    )
    return agg.select(
        F.lit(name).alias("constraint"),
        (F.col("_total") - F.col("_d")).cast("long").alias("violations"),
        F.col("_total").cast("long").alias("total"),
        F.when(F.col("_total") == F.col("_d"), F.lit("pass"))
        .otherwise(F.lit("fail"))
        .alias("status"),
    )


def check_references(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str, name: str
) -> DataFrame:
    """Referential integrity: child keys missing from parent = violations."""
    total = child.agg(F.count(F.lit(1)).alias("_total"))
    orphans = (
        child.join(
            parent.select(F.col(parent_key).alias(child_key)).distinct(),
            child_key,
            "left_anti",
        ).agg(F.count(F.lit(1)).alias("_v"))
    )
    return total.crossJoin(orphans).select(
        F.lit(name).alias("constraint"),
        F.col("_v").cast("long").alias("violations"),
        F.col("_total").cast("long").alias("total"),
        F.when(F.col("_v") == 0, F.lit("pass")).otherwise(F.lit("fail")).alias("status"),
    )


def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The orders/lineitem publication gate: row-local domain rules in
    one pass + uniqueness + referential integrity."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    rowlocal = check_constraints(
        orders,
        [
            ("totalprice_positive", F.col("o_totalprice") > 0),
            ("orderdate_complete", F.col("o_orderdate").isNotNull()),
            (
                # coalesce: isin(null) is null, which ~cond would silently
                # uncount; a null status IS a domain violation
                "status_in_domain",
                F.coalesce(
                    F.col("o_orderstatus").isin("O", "F", "P"), F.lit(False)
                ),
            ),
            ("priority_complete", F.col("o_orderpriority").isNotNull()),
        ],
    )
    uniq = check_unique(orders, "orderkey_unique", ["o_orderkey"])
    refs = check_references(
        lineitem, "l_orderkey", orders, "o_orderkey", "lineitem_fk_orders"
    )
    return rowlocal.unionByName(uniq).unionByName(refs)


_DQ_ORACLE = """
WITH t AS (
  SELECT count(*) AS total,
         sum(CASE WHEN NOT (o_totalprice > 0) THEN 1 ELSE 0 END) AS v0,
         sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS v1,
         sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                    OR o_orderstatus IS NULL THEN 1 ELSE 0 END) AS v2,
         sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS v3,
         count(*) - count(DISTINCT o_orderkey) AS vu
  FROM orders),
fk AS (
  SELECT (SELECT count(*) FROM lineitem) AS total,
         (SELECT count(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_orderkey = l.l_orderkey)) AS v)
SELECT "constraint", CAST(violations AS BIGINT) AS violations,
       CAST(total AS BIGINT) AS total,
       CASE WHEN violations = 0 THEN 'pass' ELSE 'fail' END AS status
FROM (
  SELECT 'totalprice_positive' AS "constraint", v0 AS violations, total FROM t
  UNION ALL SELECT 'orderdate_complete', v1, total FROM t
  UNION ALL SELECT 'status_in_domain', v2, total FROM t
  UNION ALL SELECT 'priority_complete', v3, total FROM t
  UNION ALL SELECT 'orderkey_unique', vu, total FROM t
  UNION ALL SELECT 'lineitem_fk_orders', v, total FROM fk)
"""

QUERIES["dq_constraint_report"] = dq_constraint_report
ORACLES["dq_constraint_report"] = _DQ_ORACLE


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column completeness/distinctness profile, one scan.

    Exact distinct counts per column compile to Spark's Expand-based
    multi-distinct aggregation — one shuffle, counts carried as
    partials.  Output: (column, n_rows, n_nulls, n_distinct)."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(cols):
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_null{i}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"_d{i}"))
    row = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").cast("long").alias("n_rows"),
                F.col(f"_null{i}").cast("long").alias("n_nulls"),
                F.col(f"_d{i}").cast("long").alias("n_distinct"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return row.select(F.explode(entries).alias("e")).select("e.*")


def dq_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return profile_columns(
        orders, ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    )


_PROFILE_ORACLE = """
WITH t AS (
  SELECT count(*) AS n,
         sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS nl0,
         count(DISTINCT o_orderkey) AS d0,
         sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS nl1,
         count(DISTINCT o_custkey) AS d1,
         sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS nl2,
         count(DISTINCT o_orderstatus) AS d2,
         sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS nl3,
         count(DISTINCT o_orderpriority) AS d3
  FROM orders)
SELECT "column", CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_nulls AS BIGINT) AS n_nulls,
       CAST(n_distinct AS BIGINT) AS n_distinct
FROM (
  SELECT 'o_orderkey' AS "column", n AS n_rows, nl0 AS n_nulls, d0 AS n_distinct FROM t
  UNION ALL SELECT 'o_custkey', n, nl1, d1 FROM t
  UNION ALL SELECT 'o_orderstatus', n, nl2, d2 FROM t
  UNION ALL SELECT 'o_orderpriority', n, nl3, d3 FROM t)
"""

QUERIES["dq_profile_orders"] = dq_profile_orders
ORACLES["dq_profile_orders"] = _PROFILE_ORACLE
