"""IVF (inverted-file) approximate nearest neighbor — the clustered
scale path for similarity search (north star §2.C), alongside the
sign-LSH variant in operators/similarity.py.

Training is Lloyd's k-means expressed on DataFrames: assignment is a
row-local argmin over broadcast centroid literals (zero shuffle),
centroid update is one groupBy per iteration (dims exploded so the
shuffle carries (cluster, dim, partial-sum), not whole vectors).
Search probes the ``nprobe`` nearest inverted lists and re-ranks by
exact cosine — at 100 TB the corpus is hash-partitioned by cluster id,
so a query touches nprobe partitions instead of the full table.

Iterative + data-dependent (centroids), so genuinely non-SQL-
expressible: the gate entry is rows-only; recall vs brute force is
asserted in tests.  Seeding is deterministic (first k vectors by
vec_id), so results are stable run-to-run.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from qin_cdc_spark.functions.vectors import cosine
from qin_cdc_spark.sources.tables import load_table

K_CLUSTERS = 16
N_ITERS = 5
N_PROBE = 4


def _centroid_lits(centroids: list[list[float]]):
    return F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in centroids])


def _assign_expr(centroids: list[list[float]]):
    """Index of the nearest centroid (squared L2), row-local."""
    cents = _centroid_lits(centroids)
    dists = F.transform(
        cents,
        lambda c: F.aggregate(
            F.zip_with(F.col("embedding"), c, lambda x, y: (x.cast("double") - y) ** 2),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    return F.array_position(dists, F.array_min(dists)).cast("int") - 1


def train_kmeans(
    emb: DataFrame,
    k: int = K_CLUSTERS,
    n_iters: int = N_ITERS,
    sample_fraction: float | None = None,
) -> list[list[float]]:
    """Lloyd iterations; deterministic seed = first k vectors by vec_id.

    ``sample_fraction`` enables mini-batch training (the 100 TB path —
    PLANS.md gap: full Lloyd scans the corpus every iteration): each
    iteration updates centroids from a deterministic hash-sample of the
    corpus, re-drawn per iteration by salting the hash with the
    iteration number (so successive mini-batches see different rows,
    the property mini-batch k-means needs to converge).  Per-iteration
    cost drops from O(n) to O(f·n); the driver still only ever holds
    k×dim floats.  Sampling is xxhash64-based — no RNG, so training is
    replay-deterministic like every other operator here.
    """
    dim = len(emb.select("embedding").first()[0])
    seed_rows = emb.orderBy("vec_id").limit(k).collect()
    centroids = [[float(x) for x in r.embedding] for r in seed_rows]
    for it in range(n_iters):
        batch = emb
        if sample_fraction is not None:
            batch = emb.filter(
                F.pmod(F.xxhash64(F.col("vec_id"), F.lit(it)), 1_000_000)
                < int(sample_fraction * 1_000_000)
            )
        assigned = batch.select(_assign_expr(centroids).alias("cluster"), "embedding")
        sums = (
            assigned.select("cluster", F.posexplode("embedding").alias("d", "val"))
            .groupBy("cluster", "d")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new = [[0.0] * dim for _ in range(k)]
        counts = [0] * k
        for r in sums:
            new[r.cluster][r.d] = r.s / r.n
            counts[r.cluster] = r.n
        centroids = [
            new[i] if counts[i] > 0 else centroids[i] for i in range(k)
        ]  # empty cluster keeps its old centroid
    return centroids


def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search: assign corpus to clusters, probe the nprobe nearest
    clusters per query, exact-cosine re-rank, top-5."""
    emb = load_table(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    centroids = train_kmeans(emb)
    cents = _centroid_lits(centroids)

    # corpus side: one cluster per vector (the inverted lists)
    corpus = emb.select("vec_id", "embedding", _assign_expr(centroids).alias("cluster"))

    # query side: nprobe nearest clusters each
    dists = F.transform(
        cents,
        lambda c: F.aggregate(
            F.zip_with(F.col("embedding"), c, lambda x, y: (x.cast("double") - y) ** 2),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    queries = (
        emb.filter(F.col("vec_id") % 10 == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            dists.alias("cdists"),
        )
        .select(
            "query_id",
            "q_emb",
            F.explode(
                F.slice(F.array_sort(F.col("cdists")), 1, N_PROBE)
            ).alias("probe_dist"),
            F.col("cdists"),
        )
        .select(
            "query_id",
            "q_emb",
            (F.array_position(F.col("cdists"), F.col("probe_dist")) - 1).cast("int").alias(
                "cluster"
            ),
        )
        .distinct()
    )

    cand = corpus.join(F.broadcast(queries), "cluster").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("cand_id"),
        F.round(cosine(F.col("q_emb"), F.col("embedding")), 9).alias("cos_r"),
    ).distinct()
    w = Window.partitionBy("query_id").orderBy(F.col("cos_r").desc(), F.col("cand_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("query_id", "cand_id", "cos_r", "rn")
    )


QUERIES = {"sim_ann_ivf": sim_ann_ivf}
ORACLES: dict[str, str] = {}  # iterative k-means: rows-only by design


class IvfIndex:
    """Persisted IVF index: centroids (JSON) + cluster-assigned corpus
    (parquet, partitioned by cluster so a probe reads only its lists).
    Closes the PLANS.md gap 'IVF centroids retrain per query call' —
    build once, search many times; at 100 TB the assigned corpus is the
    big artifact and lives partitioned on the cluster key."""

    def __init__(self, path: str):
        self.path = path

    def build(self, spark: SparkSession, sf_dir: str, k: int = K_CLUSTERS) -> None:
        import json
        import os

        emb = load_table(spark, sf_dir, "embeddings").repartition(
            spark.sparkContext.defaultParallelism
        )
        centroids = train_kmeans(emb, k)
        os.makedirs(self.path, exist_ok=True)
        with open(f"{self.path}/centroids.json", "w") as f:
            json.dump(centroids, f)
        emb.select(
            "vec_id", "embedding", _assign_expr(centroids).alias("cluster")
        ).write.mode("overwrite").partitionBy("cluster").parquet(
            f"{self.path}/corpus"
        )

    def add_batch(self, vectors_df: DataFrame) -> None:
        """Incremental ingest: assign new vectors (vec_id, embedding) to
        the EXISTING centroids and append to their inverted lists — the
        continuous-ingest path (new embeddings stream in; retraining is
        a periodic offline job, not a per-batch cost).  Assignment is
        row-local; the append touches only the clusters the batch lands
        in.  Centroids drift from the true k-means of the grown corpus —
        the standard IVF trade-off; rebuild() when recall decays."""
        centroids = self.centroids()
        vectors_df.select(
            "vec_id", "embedding", _assign_expr(centroids).alias("cluster")
        ).write.mode("append").partitionBy("cluster").parquet(f"{self.path}/corpus")

    def exists(self) -> bool:
        import os

        return os.path.exists(f"{self.path}/centroids.json")

    def centroids(self) -> list[list[float]]:
        import json

        with open(f"{self.path}/centroids.json") as f:
            return json.load(f)

    def corpus(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(f"{self.path}/corpus")


def ivf_search(
    spark: SparkSession,
    index: IvfIndex,
    queries_df: DataFrame,
    *,
    n_probe: int = N_PROBE,
    top_k: int = 5,
) -> DataFrame:
    """Search a persisted index: probe the n_probe nearest lists per
    query (cluster-partition pruning at scan time), exact-cosine
    re-rank.  queries_df: (query_id, q_emb)."""
    centroids = index.centroids()
    cents = _centroid_lits(centroids)
    dists = F.transform(
        cents,
        lambda c: F.aggregate(
            F.zip_with(F.col("q_emb"), c, lambda x, y: (x.cast("double") - y) ** 2),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    probes = (
        queries_df.select("query_id", "q_emb", dists.alias("cdists"))
        .select(
            "query_id",
            "q_emb",
            F.explode(F.slice(F.array_sort(F.col("cdists")), 1, n_probe)).alias(
                "probe_dist"
            ),
            F.col("cdists"),
        )
        .select(
            "query_id",
            "q_emb",
            (F.array_position(F.col("cdists"), F.col("probe_dist")) - 1)
            .cast("int")
            .alias("cluster"),
        )
        .distinct()
    )
    cand = index.corpus(spark).join(F.broadcast(probes), "cluster").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("cand_id"),
        F.round(cosine(F.col("q_emb"), F.col("embedding")), 9).alias("cos_r"),
    ).distinct()
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_r").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_k)
        .select("query_id", "cand_id", "cos_r", "rn")
    )
