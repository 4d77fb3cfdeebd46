"""LshBandIndex (operators/lsh_index.py): persisted MinHash band index
maintained from a change feed."""

from __future__ import annotations

import pyspark.sql.functions as F

from qin_cdc_spark.operators.lsh_index import LshBandIndex
from qin_cdc_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _index_rows(idx):
    return sorted((r.doc_id, r.band) for r in idx.read().collect())


def test_apply_cdf_matches_fresh_build(spark, tmp_path):
    """Insert+update+delete maintenance must leave the index EXACTLY
    equal to a fresh build of the post-change snapshot — driven end to
    end from a VersionedBucketedTable change feed with preimages."""
    from qin_cdc_spark.streaming.versioned import VersionedBucketedTable

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")

    tbl = VersionedBucketedTable(spark, str(tmp_path / "vt"), ["doc_id"], n_buckets=8)
    v1 = tbl.merge(
        docs.select(
            F.lit("insert").alias("op"), F.col("doc_id").alias("seq"),
            "doc_id", "text",
        )
    )
    upd = docs.filter(F.col("doc_id") % 5 == 1).select(
        F.lit("update").alias("op"), (F.col("doc_id") + 10_000).alias("seq"),
        "doc_id", F.concat(F.col("text"), F.lit(" extra tail words here")).alias("text"),
    )
    dele = docs.filter(F.col("doc_id") % 7 == 0).select(
        F.lit("delete").alias("op"), (F.col("doc_id") + 20_000).alias("seq"),
        "doc_id", "text",
    )
    ins = docs.filter(F.col("doc_id") < 3).select(
        F.lit("insert").alias("op"), (F.col("doc_id") + 30_000).alias("seq"),
        (F.col("doc_id") + 100_000).alias("doc_id"),
        F.reverse(F.col("text")).alias("text"),
    )
    v2 = tbl.merge(upd.unionByName(dele).unionByName(ins))

    idx = LshBandIndex(spark, str(tmp_path / "idx"), n_buckets=8)
    idx.build(tbl.read_at(v1))
    assert idx.exists()
    idx.apply_cdf(tbl.changes_between(v1, v2, include_preimage=True))

    fresh = LshBandIndex(spark, str(tmp_path / "fresh"), n_buckets=8)
    fresh.build(tbl.read_at(v2))
    assert _index_rows(idx) == _index_rows(fresh)

    # candidate pairs therefore agree too (the consumer-facing surface)
    got = {(r.doc_a, r.doc_b) for r in idx.candidate_pairs().collect()}
    want = {(r.doc_a, r.doc_b) for r in fresh.candidate_pairs().collect()}
    assert got == want


def test_candidates_match_inline_lsh_banding(spark, tmp_path):
    """The persisted index must generate the SAME candidate set as the
    inline dedup_minhash_lsh banding (same signature family, same
    16×4 bands) — the index is a materialization, not a new algorithm."""
    from qin_cdc_spark.functions.text import (
        lsh_band_keys,
        minhash_from_hashes,
        shingle_hashes,
        word_shingles,
    )

    # pre-split the one-file fixture so the index build's md5/minhash
    # stage runs on every core instead of one task (test-side: at real
    # scale the corpus arrives in many splits already)
    docs = (
        load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    idx = LshBandIndex(spark, str(tmp_path / "idx"))
    idx.build(docs)
    got = {(r.doc_a, r.doc_b) for r in idx.candidate_pairs().collect()}

    # materialization barriers + parallelism, the PLANS.md hazard pair:
    # without persist, CollapseProject inlines the 64-hash signature
    # into both sides of the self-join (each exploded band row
    # re-evaluates the interpreted ArrayTransform chain), and the
    # one-file fixture scans as a single partition.  The barrier between
    # shingle_hashes and the permutation family matters just as much —
    # the inline form re-ran every md5 64× and made this REFERENCE side
    # a ~100 s stage (OPTIMIZATION_r11; same math either way, so the
    # reference is unweakened).
    hashed = docs.repartition(spark.sparkContext.defaultParallelism).select(
        "doc_id", shingle_hashes(word_shingles(F.col("text"))).alias("h")
    ).persist()
    sig = hashed.select(
        "doc_id", minhash_from_hashes(F.col("h"), 64).alias("sig")
    ).persist()
    banded = sig.select(
        "doc_id",
        F.explode(lsh_band_keys(F.col("sig"), 16, 4)).alias("band"),
    ).persist()
    try:
        banded.count()  # materialize through the barriers
        want = {
            (r.doc_a, r.doc_b)
            for r in banded.alias("x")
            .join(banded.alias("y"), "band")
            .filter(F.col("x.doc_id") < F.col("y.doc_id"))
            .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
            .distinct()
            .collect()
        }
    finally:
        banded.unpersist()
        sig.unpersist()
        hashed.unpersist()
    assert got == want
