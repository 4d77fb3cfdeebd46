"""Incremental materialized rollup (continuous aggregate).

The hypertable-rollup pattern: a persistent parquet table keyed by
(window_start, group keys) holding ADDITIVE partial aggregates
(count, sum), maintained per micro-batch from a stream.  Readers get
the finished rollup (including derived avg) without touching the raw
event stream — the materialized-view analog of the reference's synced
target tables (qin-cdc's sinks materialize row state; this materializes
aggregate state — same foreachBatch + idempotent-apply skeleton as
`streaming/cdc_stream.py`, see outputs/starrocks/starrocks.go:64-129
for the reference's buffer/flush shape).

Scale design:
- Each micro-batch is pre-aggregated FIRST (partial agg, map-side
  combine) — the merge input is |windows × keys| rows, never |events|.
- The store itself stays |windows × keys| — bounded by time range and
  key cardinality, not event volume, so the full-rewrite merge is a
  small job even when the stream is 100 TB/day.  (A long-retention
  store would partition by window month and rewrite only touched
  partitions — same move as BucketedUpsertTable.)
- Exactly-once: foreachBatch can re-deliver a batch after a crash
  mid-write; additive merges are NOT naturally idempotent, so the store
  records the last applied batch_id in `_rollup_meta.json` INSIDE the
  table directory (underscore-prefixed ⇒ invisible to parquet readers)
  and the swap publishes data + meta atomically.  A replayed batch_id
  is skipped.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

META_NAME = "_rollup_meta.json"


class RollupStore:
    """Additive (window_start, *keys) → (cnt, sum_value) rollup table."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        *,
        keys: list[str],
        ts_col: str = "ts",
        value_col: str = "value",
        window_duration: str = "1 hour",
    ):
        self.spark = spark
        self.path = path
        self.keys = list(keys)
        self.ts_col = ts_col
        self.value_col = value_col
        self.window_duration = window_duration

    # -- storage ----------------------------------------------------------

    def exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            f.endswith(".parquet") for f in os.listdir(self.path)
        )

    def last_batch_id(self) -> int:
        meta = os.path.join(self.path, META_NAME)
        if os.path.exists(meta):
            with open(meta) as f:
                return json.load(f)["last_batch_id"]
        return -1

    def read_partials(self) -> DataFrame:
        if not self.exists():
            fields = ", ".join(f"{k} string" for k in self.keys)
            return self.spark.createDataFrame(
                [], f"window_start timestamp, {fields}, cnt long, sum_value double"
            )
        return self.spark.read.parquet(self.path)

    def read(self) -> DataFrame:
        """The finished rollup: partial sums plus derived averages."""
        p = self.read_partials()
        return p.withColumn("avg_value", F.col("sum_value") / F.col("cnt"))

    # -- merge ------------------------------------------------------------

    def aggregate_batch(self, batch_df: DataFrame) -> DataFrame:
        return (
            batch_df.groupBy(
                F.window(self.ts_col, self.window_duration).alias("_w"), *self.keys
            )
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum(self.value_col).cast("double").alias("sum_value"),
            )
            .select(F.col("_w.start").alias("window_start"), *self.keys, "cnt", "sum_value")
        )

    def merge_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Idempotent additive merge: pre-agg the batch, add into the
        store, publish data+meta atomically; replayed batch_ids no-op."""
        if batch_id <= self.last_batch_id():
            return
        inc = self.aggregate_batch(batch_df)
        merged = (
            self.read_partials()
            .unionByName(inc)
            .groupBy("window_start", *self.keys)
            .agg(F.sum("cnt").alias("cnt"), F.sum("sum_value").alias("sum_value"))
        )
        self._swap_write(merged, batch_id)

    def _swap_write(self, df: DataFrame, batch_id: int) -> None:
        stage = f"{self.path}.stage-{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(stage)
        with open(os.path.join(stage, META_NAME), "w") as f:
            json.dump({"last_batch_id": batch_id}, f)
        old = f"{self.path}.old-{uuid.uuid4().hex[:8]}"
        if os.path.isdir(self.path):
            os.rename(self.path, old)
        os.rename(stage, self.path)
        if os.path.exists(old):
            shutil.rmtree(old)


def start_incremental_rollup(
    spark: SparkSession,
    stream: DataFrame,
    store: RollupStore,
    *,
    checkpoint_dir: str | None = None,
):
    """Maintain the rollup from a streaming DataFrame of raw events."""
    writer = stream.writeStream.foreachBatch(store.merge_batch).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
