"""Deterministic synthetic CDC change streams over the fixture tables.

FIXTURES.md §5: the correctness harness derives a seeded
insert/update/delete stream from ``orders``/``lineitem`` with a
monotonically increasing ``seq``.  The derivation below is pure
arithmetic on the key so the DuckDB oracle can reproduce it exactly:

orders stream (key o_orderkey, k = o_orderkey % 10):
- every row:        insert  seq = key*4      (base image)
- k in (1,3,5):     update  seq = key*4 + 1  (totalprice*1.1 r2, status 'U')
- k = 5:            update  seq = key*4 + 2  (totalprice*1.2 r2, status 'V')
- k in (7,9):       delete  seq = key*4 + 3

lineitem stream (composite key, k = l_orderkey % 7):
- every row:        insert  seq = (l_orderkey*100 + l_linenumber)*2
- k = 0:            update  seq = …*2 + 1    (quantity + 5)
- k = 3:            delete  seq = …*2 + 1
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qin_cdc_spark.sources.tables import load_table


def orders_change_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed change rows (op, seq, <orders columns>) in envelope-ready form."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey") % 10
    base_seq = F.col("o_orderkey") * 4

    inserts = o.select(
        F.lit("insert").alias("op"), base_seq.alias("seq"), *o.columns
    )
    upd1 = (
        o.filter(k.isin(1, 3, 5))
        .withColumn("o_totalprice", F.round(F.col("o_totalprice") * 1.1, 2))
        .withColumn("o_orderstatus", F.lit("U"))
        .select(F.lit("update").alias("op"), (base_seq + 1).alias("seq"), *o.columns)
    )
    upd2 = (
        o.filter(k == 5)
        .withColumn("o_totalprice", F.round(F.col("o_totalprice") * 1.2, 2))
        .withColumn("o_orderstatus", F.lit("V"))
        .select(F.lit("update").alias("op"), (base_seq + 2).alias("seq"), *o.columns)
    )
    dels = o.filter(k.isin(7, 9)).select(
        F.lit("delete").alias("op"), (base_seq + 3).alias("seq"), *o.columns
    )
    return inserts.unionByName(upd1).unionByName(upd2).unionByName(dels)


# DuckDB mirror of orders_change_stream, used as a CTE in the oracles.
ORDERS_STREAM_SQL = """
ev AS (
  SELECT 'insert' AS op, o_orderkey*4 AS seq, o_orderkey, o_custkey, o_orderstatus,
         o_totalprice, o_orderdate, o_orderpriority
  FROM orders
  UNION ALL
  SELECT 'update', o_orderkey*4+1, o_orderkey, o_custkey, 'U',
         round(o_totalprice*1.1, 2), o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 10 IN (1,3,5)
  UNION ALL
  SELECT 'update', o_orderkey*4+2, o_orderkey, o_custkey, 'V',
         round(o_totalprice*1.2, 2), o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 10 = 5
  UNION ALL
  SELECT 'delete', o_orderkey*4+3, o_orderkey, o_custkey, o_orderstatus,
         o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 10 IN (7,9)
)
"""


def lineitem_change_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fixture's (l_orderkey, l_linenumber) is not actually unique, but
    a CDC source table must have a unique PK — deterministically keep the
    first row per key under full-column ordering, mirrored in the oracle."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    tie_cols = [c for c in li.columns if c not in ("l_orderkey", "l_linenumber")]
    w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(*[F.col(c) for c in tie_cols])
    li = li.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    k = F.col("l_orderkey") % 7
    base_seq = (F.col("l_orderkey") * 100 + F.col("l_linenumber")) * 2

    inserts = li.select(F.lit("insert").alias("op"), base_seq.alias("seq"), *li.columns)
    upds = (
        li.filter(k == 0)
        .withColumn("l_quantity", F.col("l_quantity") + 5)
        .select(F.lit("update").alias("op"), (base_seq + 1).alias("seq"), *li.columns)
    )
    dels = li.filter(k == 3).select(
        F.lit("delete").alias("op"), (base_seq + 1).alias("seq"), *li.columns
    )
    return inserts.unionByName(upds).unionByName(dels)


LINEITEM_STREAM_SQL = """
li AS (
  SELECT * FROM lineitem
  QUALIFY row_number() OVER (
    PARTITION BY l_orderkey, l_linenumber
    ORDER BY l_partkey, l_suppkey, l_quantity, l_extendedprice, l_discount,
             l_tax, l_returnflag, l_linestatus, l_shipdate) = 1
),
ev AS (
  SELECT 'insert' AS op, (l_orderkey*100 + l_linenumber)*2 AS seq, *
  FROM li
  UNION ALL
  SELECT 'update', (l_orderkey*100 + l_linenumber)*2 + 1,
         l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity + 5,
         l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
  FROM li WHERE l_orderkey % 7 = 0
  UNION ALL
  SELECT 'delete', (l_orderkey*100 + l_linenumber)*2 + 1, *
  FROM li WHERE l_orderkey % 7 = 3
)
"""
