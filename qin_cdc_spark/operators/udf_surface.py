"""Declared UDF surface (SURVEY §2.B last row): scalar pandas UDF,
grouped-agg pandas UDF, applyInPandas (UDTF-style per-group transform),
and a row-at-a-time Python UDF — each as an oracle-checked gate query.

These exist to prove the Python boundary works end-to-end (Arrow batch
transfer, schema mapping, grouped state); the engine's hot paths stay
JVM-side (see functions/*).  Every kernel here is deliberately
SQL-expressible so DuckDB can verify the exact values; outputs are
rounded to 6 dp to absorb libm-vs-numpy ULP skew.

Scale notes: pandas UDFs are Arrow-vectorized (no per-row pickling);
applyInPandas shuffles once on the group key and requires groups to fit
in executor memory — fine for per-status/per-priority groups, NOT for
unbounded keys (that path would use window functions instead).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import DoubleType, LongType

from qin_cdc_spark.sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}


@F.pandas_udf(DoubleType())
def _sigmoid_100k(price: pd.Series) -> pd.Series:
    import numpy as np

    return 1.0 / (1.0 + np.exp(-price / 100_000.0))


def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF: price sigmoid (a feature-scaling
    kernel), one Arrow batch per partition chunk."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey", F.round(_sigmoid_100k("o_totalprice"), 6).alias("price_sig")
    )


UDF_PANDAS_SCALAR_ORACLE = """
SELECT o_orderkey, round(1.0 / (1.0 + exp(-o_totalprice / 100000.0)), 6) AS price_sig
FROM orders
"""


@F.pandas_udf(DoubleType())
def _weighted_avg_price(price: pd.Series, qty: pd.Series) -> float:
    return float((price * qty).sum() / qty.sum())


def udf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF: quantity-weighted mean price per return
    flag (full-series reduction per group, Arrow-transferred)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(_weighted_avg_price("l_extendedprice", "l_quantity"), 6).alias(
            "w_avg_price"
        )
    )


UDF_PANDAS_GROUPED_ORACLE = """
SELECT l_returnflag,
       round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 6) AS w_avg_price
FROM lineitem GROUP BY l_returnflag
"""


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    mu = pdf["o_totalprice"].mean()
    sd = pdf["o_totalprice"].std(ddof=1)
    return pd.DataFrame(
        {
            "o_orderkey": pdf["o_orderkey"],
            "o_orderstatus": pdf["o_orderstatus"],
            "price_z": ((pdf["o_totalprice"] - mu) / sd).round(6),
        }
    )


def udf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas: per-group normalization (z-score of price within
    order status) — the UDTF-style 'whole group in, table out' shape."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").applyInPandas(
        _zscore_group, schema="o_orderkey long, o_orderstatus string, price_z double"
    )


UDF_APPLY_IN_PANDAS_ORACLE = """
SELECT o_orderkey, o_orderstatus,
       round((o_totalprice - avg(o_totalprice) OVER (PARTITION BY o_orderstatus))
             / stddev_samp(o_totalprice) OVER (PARTITION BY o_orderstatus), 6)
         AS price_z
FROM orders
"""


@F.udf(LongType())
def _vowel_count(text: str) -> int:
    return sum(1 for ch in text.lower() if ch in "aeiou")


def udf_python_rowwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF — declared for surface completeness; the
    docstring IS the warning: this pickles every row through Python and
    belongs nowhere near a 100 TB hot path (use pandas UDFs or JVM
    expressions)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", _vowel_count("text").alias("n_vowels"))


UDF_PYTHON_ROWWISE_ORACLE = """
SELECT doc_id,
       length(lower(text)) - length(regexp_replace(lower(text), '[aeiou]', '', 'g'))
         AS n_vowels
FROM documents
"""


QUERIES.update(
    {
        "udf_pandas_scalar": udf_pandas_scalar,
        "udf_pandas_grouped_agg": udf_pandas_grouped_agg,
        "udf_apply_in_pandas": udf_apply_in_pandas,
        "udf_python_rowwise": udf_python_rowwise,
    }
)
ORACLES.update(
    {
        "udf_pandas_scalar": UDF_PANDAS_SCALAR_ORACLE,
        "udf_pandas_grouped_agg": UDF_PANDAS_GROUPED_ORACLE,
        "udf_apply_in_pandas": UDF_APPLY_IN_PANDAS_ORACLE,
        "udf_python_rowwise": UDF_PYTHON_ROWWISE_ORACLE,
    }
)


# --------------------------------------------------------------------------
# mapInArrow: the Arrow-native sibling of mapInPandas — batches arrive as
# pyarrow RecordBatches with NO pandas conversion, the lowest-overhead
# Python entry point for columnar kernels (pandas adds a copy + dtype
# coercion per batch; Arrow compute works on the wire format directly).
# Kernel here: utf8 byte length + whitespace-token count via pyarrow
# compute — oracle-exact against SQL equivalents.
# --------------------------------------------------------------------------


def _arrow_text_stats(batches):
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        text = batch.column(batch.schema.get_field_index("text"))
        out = pa.RecordBatch.from_arrays(
            [
                batch.column(batch.schema.get_field_index("doc_id")),
                pc.binary_length(pc.cast(text, pa.binary())).cast(pa.int32()),
                pc.list_value_length(
                    pc.split_pattern_regex(pc.utf8_trim_whitespace(text), r"\s+")
                ).cast(pa.int32()),
            ],
            names=["doc_id", "n_bytes", "n_tokens"],
        )
        yield out


def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    return docs.select("doc_id", "text").mapInArrow(
        _arrow_text_stats, schema="doc_id long, n_bytes int, n_tokens int"
    )


UDF_MAP_IN_ARROW_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       CAST(len(string_split_regex(trim(text), '\\s+')) AS INTEGER) AS n_tokens
FROM documents
"""

QUERIES["udf_map_in_arrow"] = udf_map_in_arrow
ORACLES["udf_map_in_arrow"] = UDF_MAP_IN_ARROW_ORACLE
