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


def _event_struct(op: str, seq, cols: list[str], **override):
    return F.struct(
        F.lit(op).alias("op"),
        seq.alias("seq"),
        *[override.get(c, F.col(c)).alias(c) for c in cols],
    )


def _explode_events(df: DataFrame, events) -> DataFrame:
    """Single-pass event generation: per input row build the array of
    change events and explode it.  One scan / one upstream plan instead
    of a union of per-op branches (which re-executes the source plan —
    including any dedupe window — once per branch)."""
    return df.select(F.explode(F.concat(*events)).alias("_e")).select("_e.*")


def orders_change_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed change rows (op, seq, <orders columns>) in envelope-ready form."""
    o = load_table(spark, sf_dir, "orders")
    cols = o.columns
    k = F.col("o_orderkey") % 10
    base_seq = F.col("o_orderkey") * 4

    insert_ev = _event_struct("insert", base_seq, cols)
    # No round() on the mutated price: a bare IEEE multiply produces the
    # bit-identical double in Spark and DuckDB, while round(x*1.1, 2)
    # does NOT — Spark rounds the exact decimal expansion via BigDecimal
    # HALF_UP, DuckDB computes round(x*100)/100 in floats; at sf0.1 a
    # handful of rows land on opposite sides of a .005 boundary and the
    # value-hash diverges (found by the sf0.1 spot-check, round 2).
    upd1_ev = _event_struct(
        "update",
        base_seq + 1,
        cols,
        o_totalprice=F.col("o_totalprice") * 1.1,
        o_orderstatus=F.lit("U"),
    )
    upd2_ev = _event_struct(
        "update",
        base_seq + 2,
        cols,
        o_totalprice=F.col("o_totalprice") * 1.2,
        o_orderstatus=F.lit("V"),
    )
    del_ev = _event_struct("delete", base_seq + 3, cols)
    empty = F.slice(F.array(insert_ev), 1, 0)
    return _explode_events(
        o,
        [
            F.array(insert_ev),
            F.when(k.isin(1, 3, 5), F.array(upd1_ev)).otherwise(empty),
            F.when(k == 5, F.array(upd2_ev)).otherwise(empty),
            F.when(k.isin(7, 9), F.array(del_ev)).otherwise(empty),
        ],
    )


# DuckDB mirror of orders_change_stream, used as a CTE in the oracles.
ORDERS_STREAM_SQL = """
ev AS (
  SELECT 'insert' AS op, o_orderkey*4 AS seq, o_orderkey, o_custkey, o_orderstatus,
         o_totalprice, o_orderdate, o_orderpriority
  FROM orders
  UNION ALL
  SELECT 'update', o_orderkey*4+1, o_orderkey, o_custkey, 'U',
         o_totalprice * CAST(1.1 AS DOUBLE), o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 10 IN (1,3,5)
  UNION ALL
  SELECT 'update', o_orderkey*4+2, o_orderkey, o_custkey, 'V',
         o_totalprice * CAST(1.2 AS DOUBLE), o_orderdate, o_orderpriority
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
    li = load_table(spark, sf_dir, "lineitem")
    tie_cols = [c for c in li.columns if c not in ("l_orderkey", "l_linenumber")]
    # First-row-per-key as min(struct(tie_cols)) — lexicographic struct
    # ordering equals the oracle's row_number ORDER BY over the same
    # column sequence (fixture columns are non-null).  Unlike a window
    # (full shuffle + per-partition sort of every event), min() partial-
    # aggregates map-side, so the shuffle carries |keys| not |rows|.
    li = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.min(F.struct(*[F.col(c) for c in tie_cols])).alias("_first"))
        .select("l_orderkey", "l_linenumber", "_first.*")
        .select(*li.columns)
    )
    cols = li.columns
    k = F.col("l_orderkey") % 7
    base_seq = (F.col("l_orderkey") * 100 + F.col("l_linenumber")) * 2

    insert_ev = _event_struct("insert", base_seq, cols)
    upd_ev = _event_struct(
        "update", base_seq + 1, cols, l_quantity=F.col("l_quantity") + 5
    )
    del_ev = _event_struct("delete", base_seq + 1, cols)
    empty = F.slice(F.array(insert_ev), 1, 0)
    # Single pass: the PK-dedupe window above runs once, not once per
    # op branch (a 3-branch union re-executes it three times).
    return _explode_events(
        li,
        [
            F.array(insert_ev),
            F.when(k == 0, F.array(upd_ev)).otherwise(empty),
            F.when(k == 3, F.array(del_ev)).otherwise(empty),
        ],
    )


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


def customer_change_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic customer (dimension) change stream, projected to
    the join-MV columns (key c_custkey, k = c_custkey % 8):

    - every row:   insert  seq = key*4
    - k in (2,6):  update  seq = key*4 + 1  (mktsegment -> 'UPDATED')
    - k = 4:       delete  seq = key*4 + 2

    String-only mutations: no float arithmetic anywhere, so the DuckDB
    mirror (CUSTOMER_STREAM_SQL) is trivially bit-identical."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    cols = c.columns
    k = F.col("c_custkey") % 8
    base_seq = F.col("c_custkey") * 4

    insert_ev = _event_struct("insert", base_seq, cols)
    upd_ev = _event_struct(
        "update", base_seq + 1, cols, c_mktsegment=F.lit("UPDATED")
    )
    del_ev = _event_struct("delete", base_seq + 2, cols)
    empty = F.slice(F.array(insert_ev), 1, 0)
    return _explode_events(
        c,
        [
            F.array(insert_ev),
            F.when(k.isin(2, 6), F.array(upd_ev)).otherwise(empty),
            F.when(k == 4, F.array(del_ev)).otherwise(empty),
        ],
    )


CUSTOMER_STREAM_SQL = """
cev AS (
  SELECT 'insert' AS op, c_custkey*4 AS seq, c_custkey, c_name, c_mktsegment
  FROM customer
  UNION ALL
  SELECT 'update', c_custkey*4+1, c_custkey, c_name, 'UPDATED'
  FROM customer WHERE c_custkey % 8 IN (2,6)
  UNION ALL
  SELECT 'delete', c_custkey*4+2, c_custkey, c_name, c_mktsegment
  FROM customer WHERE c_custkey % 8 = 4
)
"""


def documents_change_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic DOCUMENT corpus change stream (key doc_id,
    k = doc_id % 10) — drives the incremental text-index consumers:

    - every row:    insert  seq = doc_id*4          (original text)
    - k in (1,5):   update  seq = doc_id*4 + 1      (text || fixed suffix
      containing the BM25 gate's query terms — postings AND doc length
      both change, so index maintenance must retract the old rows)
    - k = 7:        delete  seq = doc_id*4 + 2

    String concatenation only: no float arithmetic anywhere, so the
    DuckDB mirror (DOCUMENTS_STREAM_SQL) is bit-identical."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    cols = d.columns
    k = F.col("doc_id") % 10
    base_seq = F.col("doc_id") * 4

    insert_ev = _event_struct("insert", base_seq, cols)
    upd_ev = _event_struct(
        "update",
        base_seq + 1,
        cols,
        text=F.concat(F.col("text"), F.lit(" spark window merge spark")),
    )
    del_ev = _event_struct("delete", base_seq + 2, cols)
    empty = F.slice(F.array(insert_ev), 1, 0)
    return _explode_events(
        d,
        [
            F.array(insert_ev),
            F.when(k.isin(1, 5), F.array(upd_ev)).otherwise(empty),
            F.when(k == 7, F.array(del_ev)).otherwise(empty),
        ],
    )


DOCUMENTS_STREAM_SQL = """
dev AS (
  SELECT 'insert' AS op, doc_id*4 AS seq, doc_id, text
  FROM documents
  UNION ALL
  SELECT 'update', doc_id*4+1, doc_id, text || ' spark window merge spark'
  FROM documents WHERE doc_id % 10 IN (1,5)
  UNION ALL
  SELECT 'delete', doc_id*4+2, doc_id, text
  FROM documents WHERE doc_id % 10 = 7
)
"""
