"""IncrementalBm25Index (streaming/text_index.py): posting lists
maintained from the versioned corpus's preimage CDF — replace-by-doc
delta, term-bucket pruned search, exact integer corpus stats."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from qin_cdc_spark.functions.text import words
from qin_cdc_spark.streaming.text_index import (
    IncrementalBm25Index,
    term_bucket,
)
from qin_cdc_spark.streaming.versioned import VersionedBucketedTable


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "op string, seq long, doc_id long, text string"
    )


def _mk(spark, tmp_path, n_buckets=8):
    tbl = VersionedBucketedTable(spark, str(tmp_path / "t"), ["doc_id"], n_buckets=4)
    idx = IncrementalBm25Index(
        spark, str(tmp_path / "idx"), n_buckets=n_buckets
    )
    return tbl, idx


def _postings_recompute(tbl):
    """From-scratch (doc_id, term, tf, dl) of the live corpus."""
    toks = tbl.read().select(
        "doc_id", words(F.lower(F.col("text"))).alias("w")
    ).select("doc_id", F.size("w").alias("dl"), F.explode("w").alias("term"))
    return {
        (r.doc_id, r.term): (r.tf, r.dl)
        for r in toks.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
        .collect()
    }


def _postings_view(idx):
    st = idx.read_state()
    if st is None:
        return {}
    return {(r.doc_id, r.term): (r.tf, r.dl) for r in st.collect()}


def test_index_tracks_corpus_through_mutations(spark, tmp_path):
    tbl, idx = _mk(spark, tmp_path)
    tbl.merge(
        _changes(
            spark,
            [
                ("insert", 1, 1, "spark merge window"),
                ("insert", 2, 2, "spark spark join"),
                ("insert", 3, 3, "window shuffle"),
            ],
        )
    )
    assert idx.refresh(tbl) == 1
    assert _postings_view(idx) == _postings_recompute(tbl)
    assert idx.stats() == (3, 8)

    # update changes BOTH postings and dl; delete removes a doc; insert
    # adds one — single refresh across two source versions
    tbl.merge(
        _changes(
            spark,
            [
                ("update", 10, 1, "spark window window plan"),
                ("delete", 11, 3, "window shuffle"),
            ],
        )
    )
    tbl.merge(_changes(spark, [("insert", 20, 4, "merge merge")]))
    assert idx.refresh(tbl) == 3
    assert _postings_view(idx) == _postings_recompute(tbl)
    assert idx.stats() == (3, 9)  # 4+3+2 words live

    before = _postings_view(idx)
    assert idx.refresh(tbl) == 3  # idempotent no-op
    assert _postings_view(idx) == before


def test_update_with_unchanged_tf_still_fixes_dl(spark, tmp_path):
    """The replace-by-doc rationale: an update that keeps a term's tf
    identical but changes the doc length must refresh the denormalized
    dl on that posting row (additive tf-merging would keep it stale)."""
    tbl, idx = _mk(spark, tmp_path)
    tbl.merge(_changes(spark, [("insert", 1, 1, "spark plan")]))
    idx.refresh(tbl)
    assert _postings_view(idx)[(1, "spark")] == (1, 2)
    tbl.merge(
        _changes(spark, [("update", 10, 1, "spark plan shuffle shuffle")])
    )
    idx.refresh(tbl)
    assert _postings_view(idx)[(1, "spark")] == (1, 4)  # tf same, dl fixed
    assert _postings_view(idx) == _postings_recompute(tbl)


def test_search_reads_only_query_term_buckets(spark, tmp_path):
    tbl, idx = _mk(spark, tmp_path, n_buckets=16)
    tbl.merge(
        _changes(
            spark,
            [("insert", i, i, f"spark term{i} filler word number {i}")
             for i in range(1, 20)],
        )
    )
    idx.refresh(tbl)
    seen = []
    orig = idx.read_state

    def spy(buckets=None):
        seen.append(sorted(buckets) if buckets is not None else None)
        return orig(buckets)

    idx.read_state = spy
    out = idx.search(["spark"], top_k=5).collect()
    assert len(out) == 5
    assert seen == [[str(term_bucket("spark", 16))]]  # one pruned read


def test_search_matches_scan_time_bm25(spark, tmp_path):
    """Indexed search == the scan-time formulation over the same live
    corpus (same constants, same rounding, same tie-break)."""
    from qin_cdc_spark.operators.retrieval import BM25_QUERY

    tbl, idx = _mk(spark, tmp_path)
    docs = [
        (i, " ".join(
            ["spark"] * (i % 3) + ["window"] * (i % 2) + ["merge", "filler"]
            + [f"w{i}"]
        ))
        for i in range(1, 30)
    ]
    tbl.merge(_changes(spark, [("insert", i, i, t) for i, t in docs]))
    idx.refresh(tbl)
    got = [(r.doc_id, r.bm25_r, r.rk) for r in idx.search(list(BM25_QUERY), 10).collect()]

    # scan-time recompute over the same corpus (mirrors text_bm25_topk)
    from qin_cdc_spark.streaming.text_index import BM25_B, BM25_K1
    from pyspark.sql import Window

    corpus = tbl.read()
    dl_col = F.size(words(F.lower(F.col("text"))))
    stats = corpus.select(dl_col.alias("dl")).agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    ).collect()[0]
    tok = corpus.select(
        "doc_id", dl_col.alias("dl"),
        F.explode(words(F.lower(F.col("text")))).alias("term"),
    ).filter(F.col("term").isin(*BM25_QUERY))
    tf = tok.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl")
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    avgdl = F.lit(int(stats.sum_dl)) / F.lit(int(stats.n_docs))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(int(stats.n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(BM25_K1) * (
        F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl").cast("double") / avgdl
    )
    ts = F.round(idf * F.col("tf") * F.lit(BM25_K1 + 1.0) / denom, 6)
    per_doc = (
        tf.join(F.broadcast(df), "term")
        .withColumn("ts", ts)
        .groupBy("doc_id")
        .agg(F.round(F.sum("ts"), 6).alias("bm25_r"))
        .orderBy(F.col("bm25_r").desc(), F.col("doc_id").asc())
        .limit(10)
    )
    w = Window.orderBy(F.col("bm25_r").desc(), F.col("doc_id").asc())
    want = [
        (r.doc_id, r.bm25_r, r.rk)
        for r in per_doc.withColumn("rk", F.row_number().over(w)).collect()
    ]
    assert got == want


def test_index_publish_is_crash_safe_and_purge_composes(spark, tmp_path):
    from qin_cdc_spark.streaming.forget import purge_keys

    tbl, idx = _mk(spark, tmp_path)
    tbl.merge(
        _changes(
            spark,
            [("insert", 1, 1, "secret token spark"),
             ("insert", 2, 2, "public doc window")],
        )
    )
    idx.refresh(tbl)
    orphan = os.path.join(idx.path, "tx-deadbeef0000")
    os.makedirs(orphan)
    # RTBF: purge doc 1 — the index must drop its postings via the
    # normal CDF refresh (preimage text locates them row-locally)
    purge_keys(tbl, spark.createDataFrame([(1,)], "doc_id long"), seq=100)
    idx.refresh(tbl)
    assert not os.path.exists(orphan)  # publish GC
    view = _postings_view(idx)
    assert view == _postings_recompute(tbl)
    assert not any(doc == 1 for doc, _ in view)
    assert "secret" not in {t for _, t in view}
    assert idx.stats() == (1, 3)
    assert [r.doc_id for r in idx.search(["spark"], 5).collect()] == []


def test_index_refreshes_inside_the_stream(spark, tmp_path):
    """post_batch parity with the derived MVs: the index follows a
    running CDC stream micro-batch by micro-batch and ends equal to a
    from-scratch posting recompute of the final corpus."""
    from qin_cdc_spark.cdc.envelope import envelope_from_typed
    from qin_cdc_spark.streaming.cdc_stream import (
        CdcStreamRoute,
        file_envelope_stream,
        start_cdc_stream,
    )
    from pyspark.sql.types import _parse_datatype_string

    env_dir = str(tmp_path / "env")
    typed1 = _changes(
        spark,
        [("insert", 1, 1, "spark merge window"),
         ("insert", 2, 2, "window shuffle plan")],
    )
    typed2 = _changes(
        spark,
        [("update", 10, 1, "spark spark rewritten"),
         ("delete", 11, 2, "window shuffle plan")],
    )
    for t in (typed1, typed2):
        envelope_from_typed(
            t.select("doc_id", "text", "op", "seq"), db="src", table="docs"
        ).coalesce(1).write.mode("append").parquet(env_dir)

    route = CdcStreamRoute(
        spark,
        db="src",
        table="docs",
        schema=_parse_datatype_string("doc_id long, text string"),
        keys=["doc_id"],
        target_path=str(tmp_path / "tbl"),
        versioned=True,
    )
    idx = IncrementalBm25Index(spark, str(tmp_path / "idx"), n_buckets=8)

    def post_batch(batch_id):
        if route.target is not None and route.target.exists():
            idx.refresh(route.target)

    q = start_cdc_stream(
        spark,
        file_envelope_stream(spark, env_dir, max_files_per_trigger=1),
        [route],
        checkpoint_dir=str(tmp_path / "ckpt"),
        post_batch=post_batch,
    )
    q.awaitTermination(300)
    assert idx.applied_version() == route.target.current_version()
    assert _postings_view(idx) == _postings_recompute(route.target)
    assert idx.stats() == (1, 3)
