"""Hybrid retrieval fusion + training-mixture apportionment (north
star, SURVEY §2.C continued — the reference, a CDC pipeline, has none
of these; they extend the training-data curation surface).

Three operators:

* ``retrieval_rrf_fusion`` — Reciprocal Rank Fusion of a LEXICAL
  ranked list (3-word-shingle overlap) and a DENSE ranked list (exact
  cosine over the aligned ``embeddings`` table).  The standard hybrid
  search primitive (Cormack et al., SIGIR'09): fused score
  Σ 1/(60 + rank).  Scores are published as exact integers
  (``10^9 div (60+rank)`` summed) so the fusion is hash-checkable —
  no float division anywhere.
* ``retrieval_hard_negatives`` — lexically-close-but-not-near-dup
  mining for contrastive training: top lexical-overlap candidates with
  near-duplicates excluded by the INTEGER cross-multiplied Jaccard
  test ``2·|A∩B| < |A∪B|`` (i.e. J < 0.5) — the classic BM25-negatives
  recipe with the dedup guard that keeps positives out of the
  negative set.
* ``mix_temperature_alloc`` — temperature-flattened (α = 0.5) source
  mixing with EXACT largest-remainder (Hamilton) apportionment of an
  integer token budget: weight w_s = floor(sqrt(tokens_s)), base share
  ``B·w_s div W``, and the leftover units go to the largest integer
  remainders — Σ alloc == B exactly, every share within 1 unit of the
  real-valued quota.

Scale design
------------
* Lexical candidates: the inverted (doc, shingle-hash60) index streams
  once against a BROADCAST query-side shingle set (|Q| queries) — the
  join output is bounded by |Q|·n, never n².  With a query set too big
  to broadcast, swap the candidate stage for the LSH band join
  (``dedup_minhash_lsh``) — the downstream rank/fusion shape is
  unchanged.
* Dense candidates: the declared brute-force baseline with a broadcast
  query block (same contract as ``sim_cosine_topk``); the ANN paths
  (``sim_ann_lsh`` / ``sim_ivf_pq_topk``) are drop-in replacements at
  scale.
* Both ranked lists are top-K per query — the fusion full-outer join
  touches ≤ 2·K·|Q| rows regardless of corpus size.
* Apportionment: everything after the per-source token agg is |S| rows;
  totals come from single-partition windows over the aggregated frame
  (no scalar-subquery BNLJ, no second scan of the corpus).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.functions import broadcast

from qin_cdc_spark.functions.text import hash60, word_shingles
from qin_cdc_spark.functions.vectors import cosine
from qin_cdc_spark.operators.llm_text import HASH60_SQL, SHINGLES_SQL, WORDS_SQL
from qin_cdc_spark.sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}


def _q(name: str, oracle: str | None = None):
    def reg(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return reg


# ---------------------------------------------------------------------------
# Reciprocal Rank Fusion.  Query set: doc_id % QUERY_MOD == 0 (ids are
# aligned across documents/embeddings in the fixtures, the usual layout
# for a corpus with precomputed embeddings).  RRF_K = 60 per the paper;
# integer score 10^9 div (60 + rank) keeps the whole fusion exact.
# ---------------------------------------------------------------------------

QUERY_MOD = 25
LEX_TOPK = 10
DENSE_TOPK = 10
FUSED_TOPK = 5
RRF_K = 60
RRF_SCALE = 1_000_000_000


def _shingle_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (doc_id, shingle-hash60) inverted index.  Callers persist it:
    every consumer below reads it at least twice (query-side filter +
    corpus-side join), and without a materialization barrier the
    explode+md5 recomputes per consumer (the repo-wide CollapseProject
    lesson)."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    return docs.select(
        "doc_id",
        F.explode(word_shingles(F.col("text"))).alias("sh"),
    ).select("doc_id", hash60(F.col("sh")).alias("h"))


def _lexical_ranked_from(idx: DataFrame, topk: int) -> DataFrame:
    """Top-``topk`` docs per query by distinct 3-word-shingle overlap
    over a (persisted) inverted index.  Returns (query_id, cand_id,
    inter, lex_rk).  The query side is filtered + broadcast so candidate
    generation is a streaming hash join on 8-byte keys."""
    q_idx = idx.filter(F.col("doc_id") % QUERY_MOD == 0).select(
        F.col("doc_id").alias("query_id"), "h"
    )
    inter = (
        idx.join(broadcast(q_idx), "h")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", F.col("doc_id").alias("cand_id"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("inter").desc(), F.col("cand_id").asc()
    )
    return (
        inter.withColumn("lex_rk", F.row_number().over(w))
        .filter(F.col("lex_rk") <= topk)
        .select("query_id", "cand_id", "inter", "lex_rk")
    )


def _lexical_ranked(spark: SparkSession, sf_dir: str, topk: int) -> DataFrame:
    """Standalone form (fresh index, no sharing) — test hook."""
    return _lexical_ranked_from(_shingle_index(spark, sf_dir), topk)


def _dense_ranked(spark: SparkSession, sf_dir: str, topk: int) -> DataFrame:
    """Top-``topk`` neighbors per query by exact cosine (broadcast query
    block — brute baseline; ANN variants are drop-in at scale)."""
    emb = load_table(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    q = emb.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        emb.join(broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            F.round(cosine(F.col("q_emb"), F.col("embedding")), 9).alias("cos_r"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_r").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("dense_rk", F.row_number().over(w))
        .filter(F.col("dense_rk") <= topk)
        .select("query_id", "cand_id", "dense_rk")
    )


@_q("retrieval_rrf_fusion")
def retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: RRF-fuse the lexical and dense top-10 lists,
    return the fused top-5 per query with both source ranks.

    rrf_e9 = Σ_list 10^9 div (60 + rank), 0 for a list that didn't
    return the candidate — exact integers, so ties and order are
    engine-independent (cand_id breaks residual ties).
    """
    idx = _shingle_index(spark, sf_dir).persist()
    lex = _lexical_ranked_from(idx, LEX_TOPK)
    dense = _dense_ranked(spark, sf_dir, DENSE_TOPK)
    fused = (
        lex.select("query_id", "cand_id", "lex_rk")
        .join(dense, ["query_id", "cand_id"], "full_outer")
        .select(
            "query_id",
            "cand_id",
            F.coalesce(F.col("lex_rk"), F.lit(0)).cast("int").alias("lex_rk"),
            F.coalesce(F.col("dense_rk"), F.lit(0)).cast("int").alias("dense_rk"),
        )
        .withColumn(
            "rrf_e9",
            (
                F.when(
                    F.col("lex_rk") > 0,
                    F.expr(f"{RRF_SCALE} div ({RRF_K} + lex_rk)"),
                ).otherwise(F.lit(0))
                + F.when(
                    F.col("dense_rk") > 0,
                    F.expr(f"{RRF_SCALE} div ({RRF_K} + dense_rk)"),
                ).otherwise(F.lit(0))
            ).cast("long"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_e9").desc(), F.col("cand_id").asc()
    )
    out = (
        fused.withColumn("fused_rk", F.row_number().over(w))
        .filter(F.col("fused_rk") <= FUSED_TOPK)
        .select("query_id", "cand_id", "lex_rk", "dense_rk", "rrf_e9", "fused_rk")
        .persist()
    )
    out.count()
    idx.unpersist()
    return out


_SH_SQL = SHINGLES_SQL.format(w=WORDS_SQL)
_H_SQL = HASH60_SQL.format(x="s")

_LEX_CTE = f"""
idx AS (
  SELECT doc_id, {_H_SQL} AS h
  FROM (SELECT doc_id, unnest({_SH_SQL}) AS s FROM documents)
),
lex_inter AS (
  SELECT q.doc_id AS query_id, c.doc_id AS cand_id, count(*) AS inter
  FROM idx q JOIN idx c ON q.h = c.h AND c.doc_id <> q.doc_id
  WHERE q.doc_id % {QUERY_MOD} = 0
  GROUP BY 1, 2
),
lex AS (
  SELECT query_id, cand_id, inter,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY inter DESC, cand_id ASC) AS INTEGER) AS lex_rk
  FROM lex_inter
  QUALIFY lex_rk <= {LEX_TOPK}
)
"""

_DOT_SQL = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
)
_COS_SQL = (
    _DOT_SQL.format(a="q.embedding", b="c.embedding")
    + " / (sqrt(" + _DOT_SQL.format(a="q.embedding", b="q.embedding") + ")"
    + " * sqrt(" + _DOT_SQL.format(a="c.embedding", b="c.embedding") + "))"
)

_DENSE_CTE = f"""
dense AS (
  SELECT query_id, cand_id,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos_r DESC, cand_id ASC) AS INTEGER) AS dense_rk
  FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
           round({_COS_SQL}, 9) AS cos_r
    FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
    WHERE q.vec_id % {QUERY_MOD} = 0
  )
  QUALIFY dense_rk <= {DENSE_TOPK}
)
"""

RRF_ORACLE = f"""
WITH {_LEX_CTE},
{_DENSE_CTE.lstrip()},
fused AS (
  SELECT coalesce(lex.query_id, dense.query_id) AS query_id,
         coalesce(lex.cand_id, dense.cand_id) AS cand_id,
         CAST(coalesce(lex.lex_rk, 0) AS INTEGER) AS lex_rk,
         CAST(coalesce(dense.dense_rk, 0) AS INTEGER) AS dense_rk,
         CAST(CASE WHEN lex.lex_rk IS NULL THEN 0
                   ELSE {RRF_SCALE} // ({RRF_K} + lex.lex_rk) END
              + CASE WHEN dense.dense_rk IS NULL THEN 0
                     ELSE {RRF_SCALE} // ({RRF_K} + dense.dense_rk) END
              AS BIGINT) AS rrf_e9
  FROM lex FULL OUTER JOIN dense
    ON lex.query_id = dense.query_id AND lex.cand_id = dense.cand_id
)
SELECT query_id, cand_id, lex_rk, dense_rk, rrf_e9, fused_rk FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                    ORDER BY rrf_e9 DESC, cand_id ASC) AS INTEGER) AS fused_rk
  FROM fused
) WHERE fused_rk <= {FUSED_TOPK}
"""

ORACLES["retrieval_rrf_fusion"] = RRF_ORACLE


# ---------------------------------------------------------------------------
# Hard-negative mining: high lexical overlap, near-dups excluded by the
# integer Jaccard test 2·inter < union (J < 0.5) — no float division.
# ---------------------------------------------------------------------------

HN_POOL = 20  # lexical candidates considered per query
HN_TOPK = 5


@_q("retrieval_hard_negatives")
def retrieval_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per query: top-5 hard negatives = highest shingle-overlap docs
    that are NOT near-duplicates (exact Jaccard < 0.5, decided by the
    integer cross-multiplication ``2·|A∩B| < |A|+|B|-|A∩B|``).

    The near-dup guard is what keeps true positives (near-identical
    revisions of the query doc) out of the negative pool — without it
    contrastive training punishes the model for retrieving duplicates.
    Set sizes join AFTER the pair aggregation (|pairs| ≤ HN_POOL·|Q|
    rows), never against the exploded index.
    """
    idx = _shingle_index(spark, sf_dir).persist()
    sizes = idx.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    pool = _lexical_ranked_from(idx, HN_POOL)
    survivors = (
        pool.join(
            broadcast(sizes.withColumnRenamed("doc_id", "query_id").withColumnRenamed("sz", "q_sz")),
            "query_id",
        )
        .join(
            broadcast(sizes.withColumnRenamed("doc_id", "cand_id").withColumnRenamed("sz", "c_sz")),
            "cand_id",
        )
        .withColumn("union_sz", (F.col("q_sz") + F.col("c_sz") - F.col("inter")).cast("long"))
        .filter(F.lit(2) * F.col("inter") < F.col("union_sz"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("inter").desc(), F.col("cand_id").asc()
    )
    out = (
        survivors.withColumn("hn_rk", F.row_number().over(w))
        .filter(F.col("hn_rk") <= HN_TOPK)
        .select("query_id", "cand_id", F.col("inter").cast("long").alias("inter"), "union_sz", "hn_rk")
        .persist()
    )
    out.count()
    idx.unpersist()
    return out


_LEX_POOL_CTE = _LEX_CTE.replace(f"<= {LEX_TOPK}", f"<= {HN_POOL}")

HN_ORACLE = f"""
WITH {_LEX_POOL_CTE},
sizes AS (SELECT doc_id, count(*) AS sz FROM idx GROUP BY 1),
survivors AS (
  SELECT lex.query_id, lex.cand_id, CAST(lex.inter AS BIGINT) AS inter,
         CAST(qs.sz + cs.sz - lex.inter AS BIGINT) AS union_sz
  FROM lex
  JOIN sizes qs ON qs.doc_id = lex.query_id
  JOIN sizes cs ON cs.doc_id = lex.cand_id
  WHERE 2 * lex.inter < qs.sz + cs.sz - lex.inter
)
SELECT query_id, cand_id, inter, union_sz, hn_rk FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                    ORDER BY inter DESC, cand_id ASC) AS INTEGER) AS hn_rk
  FROM survivors
) WHERE hn_rk <= {HN_TOPK}
"""

ORACLES["retrieval_hard_negatives"] = HN_ORACLE


# ---------------------------------------------------------------------------
# Temperature-flattened mixture apportionment (α = 0.5): weight
# w_s = floor(sqrt(tokens_s)) — sqrt is a single correctly-rounded IEEE
# op, bit-identical across engines, and floor makes it an exact integer.
# Hamilton largest-remainder allocation of MIX_BUDGET tokens.
# ---------------------------------------------------------------------------

MIX_BUDGET = 1_000_000
_CHARS_PER_TOKEN = 4  # matches operators/curation.py::CHARS_PER_TOKEN


def hamilton_alloc(
    df: DataFrame, key_col: str, weight_col: str, budget: int
) -> DataFrame:
    """Exact largest-remainder (Hamilton) apportionment of an integer
    ``budget`` over the rows' integer weights: adds an ``alloc`` column
    with Σ alloc == budget and |alloc − budget·w/W| < 1 for every row.

    All-integer arithmetic (div + exact remainders); ties in the
    remainder rank break by ``key_col`` so the result is deterministic.
    Precondition: at least one positive weight.  Operates on the
    (small, post-aggregation) frame — totals are single-partition
    windows, intended for |rows| = sources/shards/classes, not corpora.
    """
    all_w = Window.partitionBy()
    return (
        df.withColumn("total_w", F.sum(weight_col).over(all_w))
        .withColumn(
            "base", F.expr(f"({budget} * {weight_col}) div total_w").cast("long")
        )
        .withColumn(
            "rem",
            F.lit(budget) * F.col(weight_col) - F.col("base") * F.col("total_w"),
        )
        .withColumn("leftover", F.lit(budget) - F.sum("base").over(all_w))
        .withColumn(
            "rem_rk",
            F.row_number().over(
                Window.partitionBy().orderBy(
                    F.col("rem").desc(), F.col(key_col).asc()
                )
            ),
        )
        .withColumn(
            "alloc",
            (
                F.col("base")
                + F.when(F.col("rem_rk") <= F.col("leftover"), 1).otherwise(0)
            ).cast("long"),
        )
        .drop("total_w", "base", "rem", "leftover", "rem_rk")
    )


@_q("mix_temperature_alloc")
def mix_temperature_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source training-mix allocation under α=0.5 temperature
    flattening, exact to the unit token.

    base_s = B·w_s div W; the L = B − Σ base_s leftover units go to the
    L largest remainders (rem_s = B·w_s − base_s·W, ties by source) —
    Σ alloc == B exactly and every alloc is within 1 of the real-valued
    quota B·w_s/W.  Everything after the per-source token agg operates
    on |S| rows; the totals are single-partition windows over that tiny
    aggregated frame, not scalar subqueries against the corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.sum(F.expr(f"n_chars div {_CHARS_PER_TOKEN}")).cast("long").alias("n_tokens")
    )
    weighted = per_src.withColumn(
        "weight", F.floor(F.sqrt(F.col("n_tokens").cast("double"))).cast("long")
    )
    return hamilton_alloc(weighted, "source", "weight", MIX_BUDGET).select(
        "source", "n_tokens", "weight", "alloc"
    )


MIX_TEMP_ORACLE = f"""
WITH per_src AS (
  SELECT source, CAST(sum(n_chars // {_CHARS_PER_TOKEN}) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
),
weighted AS (
  SELECT source, n_tokens,
         CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS weight
  FROM per_src
),
based AS (
  SELECT source, n_tokens, weight,
         sum(weight) OVER () AS total_w,
         CAST(({MIX_BUDGET} * weight) // sum(weight) OVER () AS BIGINT) AS base,
         {MIX_BUDGET} * weight - (({MIX_BUDGET} * weight) // sum(weight) OVER ()) * sum(weight) OVER () AS rem
  FROM weighted
),
ranked AS (
  SELECT *, {MIX_BUDGET} - sum(base) OVER () AS leftover,
         row_number() OVER (ORDER BY rem DESC, source ASC) AS rem_rk
  FROM based
)
SELECT source, n_tokens, weight,
       CAST(base + CASE WHEN rem_rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc
FROM ranked
"""

ORACLES["mix_temperature_alloc"] = MIX_TEMP_ORACLE
