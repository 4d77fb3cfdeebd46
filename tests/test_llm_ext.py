"""Tests for operators/llm_ext.py: connected components invariants,
deterministic sampling, TF-IDF ranking sanity, PII redaction behavior."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_SMOKE


def test_connected_components_hand_graph(spark):
    from qin_cdc_spark.operators.llm_ext import connected_components

    # components: {1,2,3,4} (chain), {10,11}, {20,21,22} (triangle)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        ["doc_a", "doc_b"],
    )
    got = {
        r["doc_id"]: r["component"] for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_connected_components_empty(spark):
    from qin_cdc_spark.operators.llm_ext import connected_components

    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(pairs).count() == 0


def test_cluster_cc_covers_all_pair_members(spark):
    """Every doc in a verified near-dup pair lands in a component whose
    id is itself a member doc and the component minimum."""
    from qin_cdc_spark.operators.llm_ext import dedup_cluster_cc
    from qin_cdc_spark.operators.similarity import dedup_minhash_lsh

    pairs = dedup_minhash_lsh(spark, SF_SMOKE).select("doc_a", "doc_b").collect()
    members = {r["doc_a"] for r in pairs} | {r["doc_b"] for r in pairs}
    comp = {r["doc_id"]: r["component"] for r in dedup_cluster_cc(spark, SF_SMOKE).collect()}
    assert set(comp) == members
    assert all(c <= d and c in members for d, c in comp.items())


def test_stratified_sample_deterministic_and_bounded(spark):
    from qin_cdc_spark.operators.llm_ext import sample_stratified_topn

    a = sample_stratified_topn(spark, SF_SMOKE).collect()
    b = sample_stratified_topn(spark, SF_SMOKE).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per_lang: dict[str, int] = {}
    for r in a:
        per_lang[r["lang"]] = per_lang.get(r["lang"], 0) + 1
    assert all(n <= 10 for n in per_lang.values())


def test_tfidf_rare_term_beats_common(spark):
    from qin_cdc_spark.operators.llm_ext import QUERIES
    import tempfile

    docs = spark.createDataFrame(
        [
            (1, "shared shared shared unicorn", "en", "s", 1),
            (2, "shared shared shared words", "en", "s", 1),
            (3, "shared words words words", "en", "s", 1),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    tmp = tempfile.mkdtemp(prefix="tfidf_")
    for t in ("documents",):
        docs.write.mode("overwrite").parquet(f"{tmp}/{t}.parquet")
    top = (
        QUERIES["text_tfidf_topk"](spark, tmp)
        .filter(F.col("doc_id") == 1)
        .orderBy(F.col("tfidf_r").desc())
        .collect()
    )
    # 'unicorn' (df=1) outranks 'shared' (df=3, idf=0) for doc 1
    assert top[0]["term"] == "unicorn"


def test_pii_redact_no_residual_patterns(spark):
    from qin_cdc_spark.operators.llm_ext import EMAIL_RE, PHONE_RE, text_pii_redact

    out = text_pii_redact(spark, SF_SMOKE)
    residual = out.filter(
        F.col("redacted").rlike(EMAIL_RE) | F.col("redacted").rlike(PHONE_RE)
    ).count()
    assert residual == 0
    marked = out.filter(
        F.col("redacted").contains("<EMAIL>") & F.col("redacted").contains("<PHONE>")
    ).count()
    assert marked == out.count()
