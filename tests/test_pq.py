"""Product quantization: recall vs exact brute force (the rows-only
gate contract's compensating check), code-domain validity, and the
large-K DataFrame training path's plumbing."""

from __future__ import annotations

import pyspark.sql.functions as F

from qin_cdc_spark.operators.pq import (
    PQ_K,
    PQ_M,
    PQ_TOPK,
    _l2sq,
    encode_pq,
    encode_pq_df,
    ivf_pq_search,
    pq_adc_neighbors,
    sim_ivf_pq_topk,
    sim_pq_adc_topk,
    train_pq_codebooks,
    train_pq_codebooks_df,
)
from qin_cdc_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _exact_topk(spark, k=PQ_TOPK):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    pairs = emb.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("cand_id"),
        _l2sq(F.col("q_emb"), F.col("embedding")).alias("d"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("d").asc(), F.col("cand_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "cand_id")
    )


def _recall(result_df, truth_df) -> float:
    got: dict[int, set] = {}
    for r in result_df.collect():
        got.setdefault(r.query_id, set()).add(r.cand_id)
    truth: dict[int, set] = {}
    for r in truth_df.collect():
        truth.setdefault(r.query_id, set()).add(r.cand_id)
    hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
    total = sum(len(t) for t in truth.values())
    return hits / total


def test_pq_adc_recall_vs_exact(spark):
    truth = _exact_topk(spark)
    rec = _recall(pq_adc_neighbors(spark, SF_SMOKE), truth)
    assert rec >= 0.6, f"PQ+re-rank recall@{PQ_TOPK} = {rec:.2f}"


def test_ivf_pq_recall_vs_exact(spark):
    truth = _exact_topk(spark)
    rec = _recall(ivf_pq_search(spark, SF_SMOKE), truth)
    # IVF pruning on top of PQ loses a bit more — still must beat chance
    assert rec >= 0.4, f"IVF-PQ recall@{PQ_TOPK} = {rec:.2f}"


def test_codes_in_domain(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    cb = train_pq_codebooks(emb, dim, n_iters=1)
    assert len(cb) == PQ_M and all(len(cm) == PQ_K for cm in cb)
    codes = encode_pq(emb, cb, dim)
    bad = codes.filter(
        (F.size("codes") != PQ_M)
        | F.exists("codes", lambda c: (c < 0) | (c >= PQ_K))
    ).count()
    assert bad == 0


def test_df_training_path_matches_literal(spark):
    """Large-K path: same seed, same assignment math — encoded codes
    must agree with the literal path (means differ only by float
    summation order, which one Lloyd step at m=4, k=4 tolerates)."""
    emb = load_table(spark, SF_SMOKE, "embeddings").limit(100)
    dim = len(emb.select("embedding").first()[0])
    lit_cb = train_pq_codebooks(emb, dim, m=4, k=4, n_iters=1)
    df_cb = train_pq_codebooks_df(emb, dim, m=4, k=4, n_iters=1)
    lit_codes = {
        r.vec_id: list(r.codes) for r in encode_pq(emb, lit_cb, dim, m=4).collect()
    }
    df_codes = {
        r.vec_id: list(r.codes)
        for r in encode_pq_df(emb, df_cb, dim, m=4).collect()
    }
    agree = sum(1 for v, c in lit_codes.items() if df_codes[v] == c)
    assert agree / len(lit_codes) >= 0.95
