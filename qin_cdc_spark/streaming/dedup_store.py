"""Streaming incremental dedup against a persisted fingerprint store —
the cross-batch exact-dedup pattern a continuously-ingesting training
corpus needs (new crawl batches must not re-admit already-seen
content, across restarts).

Shape per micro-batch (foreachBatch):
1. fingerprint incoming rows (md5 of normalized text — row-local);
2. dedup *within* the batch (min doc_id per fingerprint, map-side
   combinable `max_by`-style agg);
3. anti-join against the persisted store on fingerprint (broadcast-able
   while the store index is small; at 100 TB the store is a bucketed
   table and this becomes a co-located join — same code, different
   layout);
4. append only the genuinely-new rows to the store (append-only write,
   no rewrite of existing data).

Idempotence: re-applying a batch finds every fingerprint already in the
store → appends nothing; Structured Streaming's checkpoint makes the
whole pipeline restart-safe.  Reference parity: qin-cdc has no dedup at
all (SURVEY §2 scope note); this is a BASELINE.json north-star op
composed with its A20/A31 micro-batch + checkpoint semantics.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from qin_cdc_spark.functions.text import md5_fingerprint, normalize_text


class FingerprintStore:
    """Append-only parquet store of (fp, doc_id, first_seen_batch)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            f.endswith(".parquet") for f in os.listdir(self.path)
        )

    def read(self) -> DataFrame:
        if not self.exists():
            return self.spark.createDataFrame(
                [], "fp string, doc_id long, first_seen_batch long"
            )
        return self.spark.read.parquet(self.path)

    def admit_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Admit the not-yet-seen slice of a batch into the store."""
        fresh = (
            batch_df.withColumn("fp", md5_fingerprint(normalize_text(F.col("text"))))
            # within-batch dedup first: one winner per fingerprint
            .groupBy("fp")
            .agg(F.min("doc_id").alias("doc_id"))
            # cross-batch dedup: drop fingerprints the store has seen
            .join(self.read().select("fp"), "fp", "left_anti")
            .withColumn("first_seen_batch", F.lit(batch_id))
        )
        fresh.write.mode("append").parquet(self.path)


def start_streaming_dedup(
    spark: SparkSession,
    stream: DataFrame,
    store: FingerprintStore,
    checkpoint_dir: str,
):
    """Wire a documents stream into the store via foreachBatch."""
    return (
        stream.writeStream.foreachBatch(
            lambda batch_df, batch_id: store.admit_batch(batch_df, batch_id)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
