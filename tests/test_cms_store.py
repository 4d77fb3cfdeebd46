"""CmsStore: persisted mergeable count-min sketch (streaming heavy
hitters).  The stream-merge gate query is oracle-checked; these tests
cover the filesystem store, replay idempotence, and the foreachBatch
wiring."""

from __future__ import annotations

import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="cms_store_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _terms(spark):
    from qin_cdc_spark.functions.text import words
    from qin_cdc_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    return docs.select(
        "doc_id", F.explode(words(F.lower(F.col("text")))).alias("term")
    )


def test_store_merge_equals_single_pass(spark, tmpdir):
    from qin_cdc_spark.streaming.cms_store import CmsStore, sketch_of

    tok = _terms(spark)
    store = CmsStore(spark, f"{tmpdir}/cms")
    store.merge_batch(tok.filter(F.col("doc_id") % 3 == 0), 0)
    store.merge_batch(tok.filter(F.col("doc_id") % 3 == 1), 1)
    store.merge_batch(tok.filter(F.col("doc_id") % 3 == 2), 2)

    merged = {(r.d, r.pos): r.counter for r in store.read().collect()}
    single = {(r.d, r.pos): r.counter for r in sketch_of(tok).collect()}
    assert merged == single


def test_store_replay_is_idempotent(spark, tmpdir):
    from qin_cdc_spark.streaming.cms_store import CmsStore

    tok = _terms(spark)
    store = CmsStore(spark, f"{tmpdir}/cms")
    store.merge_batch(tok, 0)
    before = {(r.d, r.pos): r.counter for r in store.read().collect()}
    store.merge_batch(tok, 0)  # redelivery of the same batch id
    after = {(r.d, r.pos): r.counter for r in store.read().collect()}
    assert before == after


def test_estimate_never_underestimates(spark, tmpdir):
    from qin_cdc_spark.streaming.cms_store import CmsStore

    tok = _terms(spark)
    store = CmsStore(spark, f"{tmpdir}/cms")
    store.merge_batch(tok.filter(F.col("doc_id") % 2 == 0), 0)
    store.merge_batch(tok.filter(F.col("doc_id") % 2 == 1), 1)

    exact = tok.groupBy("term").agg(F.count(F.lit(1)).alias("true_count"))
    est = store.estimate(exact.select("term"))
    joined = est.join(exact, "term").collect()
    assert joined
    assert all(r.est_count >= r.true_count for r in joined)


def test_foreachbatch_wiring(spark, tmpdir):
    from qin_cdc_spark.streaming.cms_store import CmsStore, sketch_of, start_streaming_cms

    tok = _terms(spark).select("term")
    src = f"{tmpdir}/src"
    tok.repartition(3).write.parquet(src)
    stream = spark.readStream.schema("term string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    store = CmsStore(spark, f"{tmpdir}/cms")
    q = start_streaming_cms(spark, stream, store, f"{tmpdir}/ckpt")
    q.awaitTermination(120)

    merged = {(r.d, r.pos): r.counter for r in store.read().collect()}
    single = {(r.d, r.pos): r.counter for r in sketch_of(tok).collect()}
    assert merged == single
