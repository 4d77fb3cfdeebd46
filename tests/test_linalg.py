"""Embedding whitening (operators/linalg.py).

The distributed second-moments pass is checked against plain numpy on
the collected fixture; the whitening transform is checked for the two
properties that define it — whitened covariance == identity and exact
invertibility back to the input.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from qin_cdc_spark.operators.linalg import (
    EPS,
    _second_moments,
    emb_whitening,
    train_whitening,
    whiten_embeddings,
)
from qin_cdc_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _np_embeddings(spark):
    rows = (
        load_table(spark, SF_SMOKE, "embeddings")
        .orderBy("vec_id")
        .collect()
    )
    return np.array([r.embedding for r in rows], dtype="float64"), [
        r.vec_id for r in rows
    ]


def test_second_moments_match_numpy(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings").repartition(8)
    x, _ = _np_embeddings(spark)
    n, mean, cov = _second_moments(emb, "embedding", x.shape[1])
    assert n == x.shape[0]
    assert np.allclose(mean, x.mean(0), atol=1e-9)
    assert np.allclose(cov, np.cov(x.T, bias=True), atol=1e-9)


def test_whitened_corpus_is_isotropic_and_invertible(spark):
    x, ids = _np_embeddings(spark)
    dim = x.shape[1]
    emb = load_table(spark, SF_SMOKE, "embeddings").repartition(8)
    n, mean, w = train_whitening(emb, "embedding", dim)
    assert n == x.shape[0]
    out = whiten_embeddings(spark, SF_SMOKE).orderBy("vec_id").collect()
    y = np.array([r.embedding for r in out], dtype="float64")
    assert [r.vec_id for r in out] == ids
    # property 1: covariance of the whitened corpus == identity
    cov_y = np.cov(y.T, bias=True)
    assert np.abs(cov_y - np.eye(dim)).max() < 1e-3
    assert np.abs(y.mean(0)).max() < 1e-9
    # property 2: exactly invertible — W is full-rank by construction
    x_rec = y @ np.linalg.inv(w).T + mean
    assert np.allclose(x_rec, x, atol=1e-6)
    # the JVM higher-order transform agrees with numpy's matmul
    y_np = (x - mean) @ w.T
    assert np.allclose(y, y_np, atol=1e-9)


def test_gate_contract_row(spark):
    row = emb_whitening(spark, SF_SMOKE).first()
    assert row.n_vectors == 500
    assert row.mean_near_zero and row.cov_near_identity


def test_second_moments_fused_pre_matches_explicit(spark):
    """The pre=(mean, w) kernel fusion (OPTIMIZATION_r10: the whitened
    verification moments measured by one numpy pass over the raw
    column) must equal the moments of the explicitly whitened corpus
    to float precision."""
    x, _ = _np_embeddings(spark)
    dim = x.shape[1]
    emb = load_table(spark, SF_SMOKE, "embeddings").repartition(4)
    n, mean, w = train_whitening(emb, "embedding", dim)
    n2, mean2, cov2 = _second_moments(emb, "embedding", dim, pre=(mean, w))
    assert n2 == n == x.shape[0]
    y = (x - mean) @ w.T
    assert np.abs(mean2 - y.mean(0)).max() < 1e-12
    assert np.abs(cov2 - np.cov(y.T, bias=True)).max() < 1e-9


def test_eps_floors_degenerate_dims(spark):
    """A constant dimension (zero variance) must not blow up the
    solve: its whitened variance lands at ~0 (λ/(λ+EPS)), every other
    dim still whitens to 1."""
    base = spark.createDataFrame(
        [(i, [float(i % 7), 3.0, float((i * 13) % 11)]) for i in range(60)],
        "vec_id long, embedding array<double>",
    ).repartition(4)
    from qin_cdc_spark.operators.linalg import whiten_expr

    n, mean, w = train_whitening(base, "embedding", 3)
    out = base.select(
        whiten_expr(F.col("embedding"), mean, w).alias("e")
    ).collect()
    y = np.array([r.e for r in out])
    v = np.cov(y.T, bias=True)
    assert v[1, 1] < 1e-3            # degenerate dim: no explosion
    assert abs(v[0, 0] - 1) < 1e-3 and abs(v[2, 2] - 1) < 1e-3
    assert EPS > 0
