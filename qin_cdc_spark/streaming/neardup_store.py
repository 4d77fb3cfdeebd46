"""Streaming incremental NEAR-dup admission against a persisted
signature store — the cross-batch fuzzy sibling of
``streaming/dedup_store.py``'s exact-fingerprint store.

A continuously-ingesting training corpus must reject documents that are
*near*-duplicates of anything already admitted (boilerplate re-crawls,
lightly-edited mirrors), across micro-batches and restarts.  Storing
raw shingle sets for exact-Jaccard verification is O(corpus text); the
streaming-scale design stores only the 64-int MinHash signature per
admitted doc (constant bytes/doc) and verifies candidates by signature
agreement — an unbiased estimator of Jaccard (component match
probability equals the true Jaccard), which is the standard sketch
trade-off for an unbounded stream.

Shape per micro-batch (foreachBatch):
1. signature each incoming row (row-local MinHash, zero shuffle);
2. within-batch candidates: LSH band self-join (16×4 banding; shuffles
   only short band keys), verify agreement ≥ threshold, reject the
   higher doc_id of each verified pair (deterministic min-id-wins);
3. cross-batch candidates: batch band keys joined against band keys
   derived row-locally from the stored signatures, same verify — a doc
   matching any admitted historical doc is rejected;
4. append only admitted (doc_id, sig, first_seen_batch) to the store.

Idempotence mirrors FingerprintStore: a replayed batch finds each of
its docs in the store as an exact self-match (agreement = 1.0) and
admits nothing, so at-least-once redelivery cannot grow the store.

Scale notes: the store scan per batch is O(|admitted|), like the
exact store's anti-join; at 100 TB the store is compacted into a
band-bucketed layout so the candidate join is co-located and touches
only the buckets the batch's band keys hash to — same code path,
different table layout.  Reference parity: qin-cdc has no dedup
operators (SURVEY §2 scope note); this composes the north-star MinHash
family with the reference's A20/A31 micro-batch + checkpoint semantics.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from qin_cdc_spark.functions.text import (
    MERSENNE31,
    lsh_band_keys,
    minhash_signature,
    perm_params_sql,
    word_shingles,
)
from qin_cdc_spark.sources.tables import load_table

N_MINHASH = 64
N_BANDS = 16
ROWS_PER_BAND = 4
DEFAULT_THRESHOLD = 0.5  # estimated Jaccard (signature agreement fraction)


def _signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, sig) — row-local MinHash over 3-word shingles."""
    return docs.select(
        "doc_id",
        minhash_signature(word_shingles(F.col("text")), N_MINHASH).alias("sig"),
    )


def _agreement(sig_a, sig_b):
    """Fraction of matching signature components — E[agreement] = Jaccard."""
    matches = F.aggregate(
        F.zip_with(sig_a, sig_b, lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return matches.cast("double") / F.lit(N_MINHASH).cast("double")


def _banded(sigs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    return sigs.select(
        id_col,
        F.explode(lsh_band_keys(F.col("sig"), N_BANDS, ROWS_PER_BAND)).alias("band"),
    )


def _reject_within(sigs: DataFrame, threshold: float) -> DataFrame:
    """Doc ids rejected by the within-batch min-id-wins policy: any doc
    whose signature agrees ≥ threshold with a lower-id doc in the same
    set.  Non-iterative by design (a doc is rejected even if its lower
    partner is itself rejected — both trace to the same admitted root,
    so admitted docs are still pairwise non-near-dup)."""
    banded = _banded(sigs)
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), "band")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(_agreement(F.col("sig_a"), F.col("sig_b")) >= threshold)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )


def _reject_against(sigs: DataFrame, store_sigs: DataFrame, threshold: float) -> DataFrame:
    """Doc ids from ``sigs`` that near-match any doc in ``store_sigs``."""
    store = store_sigs.select(F.col("doc_id").alias("store_doc_id"), "sig")
    cand = (
        _banded(sigs)
        .join(_banded(store, "store_doc_id"), "band")
        .select("doc_id", "store_doc_id")
        .distinct()
    )
    sa = sigs.select("doc_id", F.col("sig").alias("sig_a"))
    sb = store.select("store_doc_id", F.col("sig").alias("sig_b"))
    return (
        cand.join(sa, "doc_id")
        .join(sb, "store_doc_id")
        .filter(_agreement(F.col("sig_a"), F.col("sig_b")) >= threshold)
        .select("doc_id")
        .distinct()
    )


class NearDupStore:
    """Append-only parquet store of (doc_id, sig, first_seen_batch)."""

    def __init__(self, spark: SparkSession, path: str, threshold: float = DEFAULT_THRESHOLD):
        self.spark = spark
        self.path = path
        self.threshold = threshold

    def exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            f.endswith(".parquet") for f in os.listdir(self.path)
        )

    def read(self) -> DataFrame:
        if not self.exists():
            return self.spark.createDataFrame(
                [], "doc_id long, sig array<long>, first_seen_batch long"
            )
        return self.spark.read.parquet(self.path)

    def admit_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Admit the slice of a batch that near-matches nothing admitted
        before it (in the store or earlier — lower doc_id — in the batch)."""
        # persist: the signature feeds banding twice (within/cross) plus
        # two verify joins; without a barrier CollapseProject inlines the
        # 64-hash expression into every consumer (the similarity.py hazard)
        sigs = _signatures(batch_df).persist()
        try:
            rejected = _reject_within(sigs, self.threshold).union(
                _reject_against(sigs, self.read().select("doc_id", "sig"), self.threshold)
            )
            admitted = (
                sigs.join(rejected, "doc_id", "left_anti")
                .withColumn("first_seen_batch", F.lit(batch_id))
            )
            admitted.write.mode("append").parquet(self.path)
        finally:
            sigs.unpersist()


def start_streaming_neardup(
    spark: SparkSession,
    stream: DataFrame,
    store: NearDupStore,
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


# --------------------------------------------------------------------------
# Batch-checkable gate form: two deterministic micro-batches (even doc_ids
# then odd doc_ids) pushed through the identical admit logic as pure
# DataFrame ops (no filesystem), so the store's admission semantics are
# fully hash-checked against a DuckDB oracle.
# --------------------------------------------------------------------------


def neardup_store_two_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    t = DEFAULT_THRESHOLD
    b1 = _signatures(docs.filter(F.col("doc_id") % 2 == 0)).persist()
    b2 = _signatures(docs.filter(F.col("doc_id") % 2 == 1)).persist()
    admitted1 = b1.join(_reject_within(b1, t), "doc_id", "left_anti").persist()
    rejected2 = _reject_within(b2, t).union(
        _reject_against(b2, admitted1.select("doc_id", "sig"), t)
    )
    admitted2 = b2.join(rejected2, "doc_id", "left_anti")
    out = (
        admitted1.select("doc_id", F.lit(1).cast("long").alias("first_seen_batch"))
        .unionAll(admitted2.select("doc_id", F.lit(2).cast("long").alias("first_seen_batch")))
    ).persist()
    try:
        out.count()
    finally:
        b1.unpersist()
        b2.unpersist()
        admitted1.unpersist()
    return out


def _neardup_oracle() -> str:
    from qin_cdc_spark.operators.llm_text import HASH60_SQL, SHINGLES_SQL, WORDS_SQL

    params = "[" + ", ".join(f"[{a}, {b}]" for a, b in perm_params_sql(N_MINHASH)) + "]"
    band_expr = ", ".join(
        "array_to_string([CAST(b AS VARCHAR)"
        + "".join(
            f", CAST(sig[b*{ROWS_PER_BAND}+{r+1}] AS VARCHAR)" for r in range(ROWS_PER_BAND)
        )
        + "], ',')"
        for _ in range(1)
    )
    agree = (
        f"CAST(len(list_filter(range(1, {N_MINHASH} + 1), i -> sa.sig[i] = sb.sig[i])) AS DOUBLE)"
        f" / {N_MINHASH}"
    )
    return f"""
WITH sh AS (
  SELECT doc_id, {SHINGLES_SQL.format(w=WORDS_SQL)} AS shingles FROM documents
),
sig AS (
  SELECT doc_id, doc_id % 2 AS par,
         list_transform({params}, p ->
           list_min(list_transform(shingles, s ->
             (p[1] * ({HASH60_SQL.format(x='s')} % {MERSENNE31}) + p[2]) % {MERSENNE31}))
         ) AS sig
  FROM sh
),
banded AS (
  SELECT doc_id, par,
         unnest(list_transform(range(0, {N_BANDS}), b -> {band_expr})) AS band
  FROM sig
),
rej_within AS (  -- per parity batch: higher id of any verified pair
  SELECT DISTINCT y.doc_id
  FROM banded x JOIN banded y ON x.band = y.band AND x.par = y.par
                             AND x.doc_id < y.doc_id
  JOIN sig sa ON sa.doc_id = x.doc_id
  JOIN sig sb ON sb.doc_id = y.doc_id
  WHERE {agree} >= {DEFAULT_THRESHOLD}
),
admitted1 AS (
  SELECT doc_id FROM sig WHERE par = 0
    AND doc_id NOT IN (SELECT doc_id FROM rej_within)
),
rej_cross AS (  -- batch-2 docs matching any admitted batch-1 doc
  SELECT DISTINCT x.doc_id
  FROM banded x JOIN banded y ON x.band = y.band
  JOIN admitted1 a ON y.doc_id = a.doc_id
  JOIN sig sa ON sa.doc_id = x.doc_id
  JOIN sig sb ON sb.doc_id = y.doc_id
  WHERE x.par = 1 AND {agree} >= {DEFAULT_THRESHOLD}
),
admitted2 AS (
  SELECT doc_id FROM sig WHERE par = 1
    AND doc_id NOT IN (SELECT doc_id FROM rej_within)
    AND doc_id NOT IN (SELECT doc_id FROM rej_cross)
)
SELECT doc_id, CAST(1 AS BIGINT) AS first_seen_batch FROM admitted1
UNION ALL
SELECT doc_id, CAST(2 AS BIGINT) AS first_seen_batch FROM admitted2
"""


QUERIES = {"neardup_store_two_batch": neardup_store_two_batch}
ORACLES = {"neardup_store_two_batch": _neardup_oracle()}
