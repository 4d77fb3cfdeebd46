"""BM25 + Bloom-sketch retrieval operators: ranking sanity and the
sketch's defining guarantees (no false negatives; confirmation never
exceeds candidates).  Hash-equality vs DuckDB is covered by the
registry-wide sweep in test_queries_oracle.py."""

from __future__ import annotations

import pyspark.sql.functions as F

from qin_cdc_spark.operators.retrieval import (
    BM25_TOPK,
    decontaminate_bloom,
    text_bm25_topk,
)
from tests.conftest import SF_SMOKE


def test_bm25_rank_is_dense_and_ordered(spark):
    rows = text_bm25_topk(spark, SF_SMOKE).orderBy("rk").collect()
    assert 0 < len(rows) <= BM25_TOPK
    assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
    scores = [r.bm25_r for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_bloom_no_false_negatives_and_confirm_bound(spark):
    """Every doc with a TRUE benchmark shingle overlap must surface with
    n_confirmed >= its exact overlap (Bloom never drops a real member),
    and confirmations can never exceed bloom candidates."""
    from qin_cdc_spark.functions.text import word_shingles
    from qin_cdc_spark.operators.retrieval import (
        BLOOM_BENCH_MOD,
        BLOOM_SHINGLE_K,
    )
    from qin_cdc_spark.sources.tables import load_table

    got = {
        r.doc_id: (r.n_candidates, r.n_confirmed)
        for r in decontaminate_bloom(spark, SF_SMOKE).collect()
    }
    assert all(c >= f for c, f in got.values())

    docs = load_table(spark, SF_SMOKE, "documents")
    sh = docs.select(
        "doc_id",
        F.explode(word_shingles(F.col("text"), k=BLOOM_SHINGLE_K)).alias("s"),
    )
    bench = sh.filter(F.col("doc_id") % BLOOM_BENCH_MOD == 0).select("s").distinct()
    exact = {
        r.doc_id: r.n
        for r in sh.filter(F.col("doc_id") % BLOOM_BENCH_MOD != 0)
        .distinct()
        .join(bench, "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for doc_id, n_exact in exact.items():
        assert doc_id in got, f"bloom dropped truly-contaminated doc {doc_id}"
        n_cand, n_conf = got[doc_id]
        assert n_conf == n_exact
        assert n_cand >= n_exact


def test_cms_never_underestimates(spark):
    from qin_cdc_spark.operators.retrieval import sketch_countmin_topk

    rows = sketch_countmin_topk(spark, SF_SMOKE).collect()
    assert rows, "CMS returned nothing"
    assert all(r.est_count >= r.true_count for r in rows)


def test_leakage_safe_split_keeps_clusters_together(spark):
    from qin_cdc_spark.operators.curation import sample_split_leakage_safe

    rows = sample_split_leakage_safe(spark, SF_SMOKE).collect()
    by_comp: dict[int, set] = {}
    for r in rows:
        by_comp.setdefault(r.component, set()).add(r.split)
    assert all(len(s) == 1 for s in by_comp.values()), (
        "a near-dup cluster straddles splits"
    )
    splits = {r.split for r in rows}
    assert splits <= {"train", "val", "test"}
    # the 18/1/1 bucket rule must actually produce a dominant train share
    n = len(rows)
    n_train = sum(1 for r in rows if r.split == "train")
    assert n_train / n > 0.6
