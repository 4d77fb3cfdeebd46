"""Training-shard emission: deterministic, balanced, reproducible
output sharding — the final step of a corpus pipeline.

Data loaders want N similar-sized shards whose contents and internal
order are REPRODUCIBLE (so a training run can be resumed/re-created
bit-for-bit from the same corpus snapshot).  The engine's layout:

* shard id = md5-derived ``hash60(doc_id) % n_shards`` — deterministic,
  uniform, engine-portable (NOT round-robin, which depends on input
  split order; NOT repartitionByRange on a sampled range, which is
  nondeterministic across runs).
* intra-shard order = the same hash — a fixed pseudo-random shuffle,
  which is exactly what sequential training consumption wants.
* physical layout = one directory per shard (``shard=i/``) with one
  file, written in a single job: ``repartition(n, shard)`` then
  ``sortWithinPartitions`` then ``partitionBy`` — no global sort, no
  driver-side loop; at 100 TB raise files-per-shard by keeping more
  output partitions per shard value.

The manifest (per-shard doc/char totals) is computed from the same
relation, and `shards_plan_stats` exposes the assignment as an
oracle-checked gate query.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from qin_cdc_spark.functions.text import hash60
from qin_cdc_spark.operators.llm_text import HASH60_SQL
from qin_cdc_spark.sources.tables import load_table

N_SHARDS = 8


def with_shard(df: DataFrame, id_col: str = "doc_id", n_shards: int = N_SHARDS) -> DataFrame:
    """Append deterministic ``shard`` and ``shuffle_key`` columns."""
    h = hash60(F.col(id_col).cast("string"))
    return df.withColumn("shuffle_key", h).withColumn(
        "shard", F.pmod(h, F.lit(n_shards)).cast("int")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    n_shards: int = N_SHARDS,
) -> DataFrame:
    """Write ``df`` as ``path/shard=i/`` dirs; returns the manifest
    (shard, n_docs, n_chars) computed in the same pass shape."""
    sharded = with_shard(df, id_col, n_shards)
    (
        sharded.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "shuffle_key")
        .write.partitionBy("shard")
        .parquet(path)
    )
    manifest = (
        sharded.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("n_chars"),
        )
        .orderBy("shard")
    )
    return manifest


def read_shard(spark: SparkSession, path: str, shard: int) -> DataFrame:
    """One shard, in its stored (shuffle_key) order."""
    return spark.read.parquet(os.path.join(path, f"shard={shard}"))


def shards_plan_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard assignment stats for the documents corpus — the
    manifest the writer would emit, hash-checked against DuckDB."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        with_shard(docs)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).cast("long").alias("n_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


_SHARDS_ORACLE = f"""
SELECT CAST({HASH60_SQL.format(x="CAST(doc_id AS VARCHAR)")} % {N_SHARDS} AS INT)
         AS shard,
       count(*) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS n_chars,
       min(doc_id) AS min_doc_id,
       max(doc_id) AS max_doc_id
FROM documents GROUP BY 1
"""

QUERIES = {"shards_plan_stats": shards_plan_stats}
ORACLES = {"shards_plan_stats": _SHARDS_ORACLE}
