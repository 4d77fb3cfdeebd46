"""Distributed linear algebra over embedding columns — whitening.

Embedding WHITENING (ZCA: y = Σ^{-1/2}(x − μ)) is the standard
post-processing step for retrieval embeddings (publicly described in
Su et al. 2021, "Whitening Sentence Representations"; also the "W2"
trick in similarity-search literature): it decorrelates dimensions and
equalizes their variance, which measurably improves cosine retrieval
on anisotropic embedding spaces.  The reference has no vector surface
at all (it is a CDC relay); this belongs to the engine's
similarity-search family (ivf.py / pq.py) as the preprocessing stage.

Scale shape (the part that matters at 100 TB):

* **Second moments are one distributed pass**: each partition computes
  its partial (n, Σx, XᵀX) with one Arrow-batched numpy kernel
  (`mapInPandas` — d×d per partition, never per row), partials combine
  DISTRIBUTED via posexplode→sum-by-position (the shuffle carries
  |partitions|·(1+d+d²) scalars, never rows), and the driver collects
  exactly 1+d+d² aggregated values — constant for any corpus size.
* **The solve is O(d³) on the driver** for a d×d matrix (d=64 here,
  4096 doubles) — the classic "small dense algebra on the driver,
  big data on the cluster" split, same as PQ codebooks.
* **The transform is row-local JVM code**: W and μ broadcast as
  literal arrays, y = W(x−μ) evaluated with zip_with/aggregate
  higher-order expressions — zero shuffle, no Python in the row path.

The whitening matrix is an eigendecomposition (iterative, like
k-means) so the gate is an oracle-checked CONTRACT (the
sim_ivf_pq_topk pattern): DuckDB recomputes the vector census and
asserts the contract booleans — the whitened corpus' own mean is ~0
and its covariance is the identity within tolerance, both MEASURED by
a second distributed stats pass, not assumed.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from qin_cdc_spark.sources.tables import load_table

EPS = 1e-9  # eigenvalue floor: guards near-singular dims


def _second_moments(df: DataFrame, col: str, dim: int, *, pre=None):
    """One distributed pass → (n, mean[d], cov[d,d]) as numpy.

    Per-partition numpy partials (Arrow batches), distributed combine
    by position, constant-size driver collect.

    ``pre`` (OPTIMIZATION_r10): optional ``(mean, w)`` applied INSIDE
    the numpy kernel as ``y = (x − mean) @ wᵀ`` before accumulation —
    the moments of the whitened corpus measured in one vectorized pass
    over the RAW column (guide §4.2: hand whole batches to native
    code), instead of feeding the kernel a 4096-literal interpreted
    JVM projection of every row.  Same measurement, same data pass;
    only where the multiply runs changes (numpy dgemm, ~1e-16 from the
    expression form — far inside the contract tolerances)."""
    import numpy as np
    import pandas as pd

    pre_mean = pre[0].tolist() if pre is not None else None
    pre_w = pre[1].tolist() if pre is not None else None

    def part(batches):
        m = np.asarray(pre_mean) if pre_mean is not None else None
        W = np.asarray(pre_w) if pre_w is not None else None
        n, s, ss = 0, None, None
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[col].to_numpy()).astype("float64")
            if m is not None:
                x = (x - m) @ W.T
            n += x.shape[0]
            s = x.sum(0) if s is None else s + x.sum(0)
            g = x.T @ x
            ss = g if ss is None else ss + g
        if n:
            yield pd.DataFrame(
                {"n": [float(n)], "s": [s.tolist()], "ss": [ss.reshape(-1).tolist()]}
            )

    parts = df.select(col).mapInPandas(
        part, f"n double, s array<double>, ss array<double>"
    )
    flat = parts.select(
        F.posexplode(
            F.concat(F.array(F.col("n")), F.col("s"), F.col("ss"))
        ).alias("pos", "val")
    )
    rows = flat.groupBy("pos").agg(F.sum("val").alias("v")).collect()
    acc = np.zeros(1 + dim + dim * dim)
    for r in rows:
        acc[r["pos"]] = r["v"]
    n = int(round(acc[0]))
    if n == 0:
        raise ValueError("second moments of an empty relation")
    mean = acc[1 : 1 + dim] / n
    cov = acc[1 + dim :].reshape(dim, dim) / n - np.outer(mean, mean)
    cov = (cov + cov.T) / 2.0  # enforce symmetry against float drift
    return n, mean, cov


def train_whitening(df: DataFrame, col: str, dim: int):
    """(n, mean, W) with W = V diag(1/sqrt(λ+EPS)) Vᵀ — the ZCA
    whitening matrix of the column's covariance."""
    import numpy as np

    n, mean, cov = _second_moments(df, col, dim)
    lam, vec = np.linalg.eigh(cov)
    w = vec @ np.diag(1.0 / np.sqrt(np.maximum(lam, 0.0) + EPS)) @ vec.T
    return n, mean, w


def whiten_expr(col: Column, mean, w) -> Column:
    """Row-local y = W(x − μ) as JVM higher-order expressions: W rows
    and μ ride the plan as literal arrays (d=64 → 4096 literals, the
    _topm_clusters precedent), each output dim is one
    zip_with-multiply + aggregate-sum — zero shuffle, no Python."""
    mu = F.array(*[F.lit(float(m)) for m in mean])
    rows = F.array(
        *[F.array(*[F.lit(float(x)) for x in r]) for r in w]
    )
    centered = F.zip_with(
        F.transform(col, lambda x: x.cast("double")), mu, lambda x, m: x - m
    )
    return F.transform(
        rows,
        lambda r: F.aggregate(
            F.zip_with(centered, r, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )


def whiten_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production operator: embeddings → whitened embeddings
    (vec_id, embedding array<double>)."""
    # scan-split parallelism; the transform is row-local, so a forced
    # repartition only added a shuffle of the corpus (OPTIMIZATION_r10)
    emb = load_table(spark, sf_dir, "embeddings")
    dim = emb.select(F.size("embedding")).first()[0]
    _, mean, w = train_whitening(emb, "embedding", dim)
    return emb.select(
        "vec_id", whiten_expr(F.col("embedding"), mean, w).alias("embedding")
    )


def emb_whitening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked whitening CONTRACT: one row asserting

    * ``n_vectors`` — exact corpus census (DuckDB recomputes);
    * ``mean_near_zero`` — max |dim mean| of the WHITENED corpus
      < 1e-6 (measured by a second distributed stats pass);
    * ``cov_near_identity`` — max |cov − I| entry < 0.05 (same pass;
      mathematically exact up to float error and the EPS eigenvalue
      floor, so the tolerance carries wide margin).

    The eigendecomposition can't be SQL-recomputed, so the CONTRACT is
    the oracle — exactly the pattern that converted the IVF/PQ/SemDeDup
    gates.  Reconstruction invertibility is asserted in
    tests/test_linalg.py."""
    import numpy as np

    # No repartition (OPTIMIZATION_r10): the moments kernel needs no
    # particular partitioning — scan-split parallelism is the
    # scale-adaptive answer (1 task for the sf0.1 single-file fixture,
    # thousands of natural splits at 100 TB), and the forced
    # defaultParallelism exchange cost a full shuffle of the corpus
    # plus 32 near-empty tasks per pass here.
    emb = load_table(spark, sf_dir, "embeddings")
    dim = emb.select(F.size("embedding")).first()[0]
    n, mean, w = train_whitening(emb, "embedding", dim)
    # verification pass: same one-pass distributed measurement, with
    # the whitening multiply fused into the numpy kernel (guide §4.2)
    # instead of a 64×64-literal interpreted expression per row
    n2, mean2, cov2 = _second_moments(emb, "embedding", dim, pre=(mean, w))
    assert n2 == n
    mean_ok = bool(np.abs(mean2).max() < 1e-6)
    cov_ok = bool(np.abs(cov2 - np.eye(dim)).max() < 0.05)
    return spark.createDataFrame(
        [(n, mean_ok, cov_ok)],
        "n_vectors long, mean_near_zero boolean, cov_near_identity boolean",
    )


EMB_WHITENING_ORACLE = """
SELECT CAST(count(*) AS BIGINT) AS n_vectors,
       true AS mean_near_zero, true AS cov_near_identity
FROM embeddings
"""

QUERIES = {"emb_whitening": emb_whitening}
ORACLES = {"emb_whitening": EMB_WHITENING_ORACLE}
