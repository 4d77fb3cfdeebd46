"""Corpus-curation operators: the training-data pipeline surface beyond
dedup/similarity (SURVEY §2.C) — per-source caps, benchmark
decontamination, cluster-representative selection, corpus statistics,
embedding quantization, kNN label voting.

The reference (qin-cdc) has no analytics surface at all; these are the
north-star extensions mandated by BASELINE.json, designed Spark-first:
every op is a declarative DataFrame plan (shuffle-by-key joins,
window ranking, broadcastable small sides), no driver-side loops.

Same contract as the other operator modules: each query has a DuckDB
oracle with identical column aliases; floats that feed a ranking are
rounded to 9dp first so summation order can never flip results.
"""

from __future__ import annotations

from qin_cdc_spark.testing import gate_tmp

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.functions import broadcast

from qin_cdc_spark.functions.text import word_shingles, words
from qin_cdc_spark.functions.vectors import cosine
from qin_cdc_spark.operators.llm_text import SHINGLES_SQL, WORDS_SQL
from qin_cdc_spark.operators.similarity import _DOT_SQL
from qin_cdc_spark.sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}


# ---------------------------------------------------------------------------
# Corpus statistics: the per-language dashboard every curation run starts
# with.  One hash-agg pass; all signals computed inline (no second scan).

def corpus_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus profile: doc count, word totals, char
    percentiles.  Single groupBy ⇒ one shuffle on a low-cardinality key;
    partial aggregation makes the map side do all the work at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    n_words = F.size(words(F.col("text"))).cast("double")
    return (
        docs.select("lang", "n_chars", n_words.alias("n_words"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("total_words"),
            F.avg("n_chars").alias("avg_chars"),
            F.expr("percentile(n_chars, 0.5)").alias("p50_chars"),
            F.expr("percentile(n_chars, 0.9)").alias("p90_chars"),
        )
    )


CORPUS_STATS_ORACLE = f"""
SELECT lang,
       count(*) AS n_docs,
       sum(CAST(len({WORDS_SQL}) AS DOUBLE)) AS total_words,
       avg(n_chars) AS avg_chars,
       quantile_cont(n_chars, 0.5) AS p50_chars,
       quantile_cont(n_chars, 0.9) AS p90_chars
FROM documents
GROUP BY lang
"""

QUERIES["corpus_stats_by_lang"] = corpus_stats_by_lang
ORACLES["corpus_stats_by_lang"] = CORPUS_STATS_ORACLE


# ---------------------------------------------------------------------------
# Per-source cap: web-scale corpora cap documents per domain so one
# crawl host can't dominate the training mix (the C4/RefinedWeb move).

SOURCE_CAP = 50


def curation_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep at most SOURCE_CAP docs per source, preferring longer docs
    (doc_id tie-break).  Window ranking = one shuffle on `source`; at
    100 TB a skewed source is bounded by the cap itself, and AQE
    handles the pre-rank skew."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return (
        docs.select("source", "doc_id", "n_chars")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= SOURCE_CAP)
    )


SOURCE_CAP_ORACLE = f"""
SELECT source, doc_id, n_chars, rk FROM (
  SELECT source, doc_id, n_chars,
         CAST(row_number() OVER (PARTITION BY source
                                 ORDER BY n_chars DESC, doc_id ASC) AS INTEGER) AS rk
  FROM documents)
WHERE rk <= {SOURCE_CAP}
"""

QUERIES["curation_source_cap"] = curation_source_cap
ORACLES["curation_source_cap"] = SOURCE_CAP_ORACLE


# ---------------------------------------------------------------------------
# Benchmark decontamination: drop training docs sharing any word
# 3-gram with a held-out benchmark set (the GPT-3/Gopher n-gram
# overlap check).  Benchmark set here: doc_id % 97 == 0.

def decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contaminated train docs + how many distinct benchmark shingles
    they share.  The benchmark shingle set is tiny relative to the
    corpus, so it broadcasts: the 100 TB train side streams through a
    broadcast-hash join with zero shuffle, then one groupBy(doc_id)."""
    docs = load_table(spark, sf_dir, "documents")
    ex = docs.select(
        "doc_id", F.explode(word_shingles(F.col("text"))).alias("shingle")
    )
    bench = (
        ex.filter(F.col("doc_id") % 97 == 0)
        .select("shingle")
        .distinct()
    )
    train = ex.filter(F.col("doc_id") % 97 != 0)
    return (
        train.join(broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count_distinct("shingle").alias("n_contaminated"))
    )


DECONTAMINATE_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, {SHINGLES_SQL.format(w=WORDS_SQL)} AS shingles FROM documents
),
ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
bench AS (SELECT DISTINCT shingle FROM ex WHERE doc_id % 97 = 0)
SELECT e.doc_id AS doc_id, count(DISTINCT e.shingle) AS n_contaminated
FROM ex e JOIN bench b ON e.shingle = b.shingle
WHERE e.doc_id % 97 <> 0
GROUP BY e.doc_id
"""

QUERIES["decontaminate_ngram"] = decontaminate_ngram
ORACLES["decontaminate_ngram"] = DECONTAMINATE_ORACLE


# ---------------------------------------------------------------------------
# Embedding-space decontamination: the semantic sibling of the n-gram
# check — flag training vectors too close (cosine) to any held-out
# benchmark vector.  Benchmark set: vec_id % 97 == 0; like the n-gram
# variant the benchmark side is small BY DEFINITION, so the broadcast is
# bounded and the 100 TB train side streams with zero join shuffle.

EMB_DECON_THRESHOLD = 0.35


def decontaminate_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qin_cdc_spark.functions.vectors import cosine

    emb = load_table(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    bench = emb.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("bench_id"), F.col("embedding").alias("bench_emb")
    )
    train = emb.filter(F.col("vec_id") % 97 != 0)
    scored = train.join(broadcast(bench), F.lit(True)).select(
        "vec_id",
        F.round(cosine(F.col("embedding"), F.col("bench_emb")), 9).alias("cos_r"),
    )
    return (
        scored.filter(F.col("cos_r") >= EMB_DECON_THRESHOLD)
        .groupBy("vec_id")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.max("cos_r").alias("max_cos_r"),
        )
    )


EMB_DECON_ORACLE = f"""
WITH bench AS (
  SELECT vec_id AS bench_id, embedding AS bench_emb
  FROM embeddings WHERE vec_id % 97 = 0
),
scored AS (
  SELECT t.vec_id,
         round({_DOT_SQL.format(a="t.embedding", b="b.bench_emb")}
           / (sqrt({_DOT_SQL.format(a="t.embedding", b="t.embedding")})
              * sqrt({_DOT_SQL.format(a="b.bench_emb", b="b.bench_emb")})), 9) AS cos_r
  FROM embeddings t CROSS JOIN bench b
  WHERE t.vec_id % 97 <> 0
)
SELECT vec_id, count(*) AS n_hits, max(cos_r) AS max_cos_r
FROM scored WHERE cos_r >= {EMB_DECON_THRESHOLD}
GROUP BY vec_id
"""

QUERIES["decontaminate_embedding"] = decontaminate_embedding
ORACLES["decontaminate_embedding"] = EMB_DECON_ORACLE


# ---------------------------------------------------------------------------
# Cluster-representative selection: after near-dup clustering, keep the
# best doc per cluster (longest, doc_id tie-break) — composes
# dedup_cluster_cc with a window rank.

def dedup_cluster_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One representative per near-dup cluster.  Membership is tiny
    (only docs with a verified dup), so it broadcasts into the join
    with documents; ranking shuffles only the clustered docs."""
    from qin_cdc_spark.operators.llm_ext import cc_labels_cached

    members = cc_labels_cached(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    joined = docs.join(broadcast(members), "doc_id")
    w = Window.partitionBy("component").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return (
        joined.withColumn("rk", F.row_number().over(w))
        .groupBy("component")
        .agg(
            F.max(F.when(F.col("rk") == 1, F.col("doc_id"))).alias("rep_doc_id"),
            F.count(F.lit(1)).alias("n_members"),
        )
    )


def _keep_best_oracle() -> str:
    from qin_cdc_spark.operators.llm_ext import _cc_oracle

    return f"""
WITH cc AS ({_cc_oracle()}),
ranked AS (
  SELECT cc.component, cc.doc_id, d.n_chars,
         row_number() OVER (PARTITION BY cc.component
                            ORDER BY d.n_chars DESC, cc.doc_id ASC) AS rk
  FROM cc JOIN documents d ON cc.doc_id = d.doc_id)
SELECT component,
       max(CASE WHEN rk = 1 THEN doc_id END) AS rep_doc_id,
       count(*) AS n_members
FROM ranked GROUP BY component
"""


QUERIES["dedup_cluster_keep_best"] = dedup_cluster_keep_best
ORACLES["dedup_cluster_keep_best"] = _keep_best_oracle()


def dedup_decision_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING dedup-decision table end to end: verified MinHash
    near-dup pairs feed the incremental cluster store in two
    deterministic batches (pairs wholly inside the even-id half first,
    then everything else — so batch 2 MERGES components straddling the
    halves), and the decision — one representative per live cluster
    (longest doc, id tie-break) — is served from the maintained labels.
    Because the two batches partition the full pair set, the final
    incremental assignment must equal the from-scratch CC over ALL
    pairs, which is exactly what the ``dedup_cluster_keep_best`` oracle
    recomputes (recursive CTE + window) — the hash check proves the
    incremental path reaches the same DECISIONS as the batch path.
    Scale shape: per batch the store touches only affected components;
    the representative rank shuffles only clustered docs (tiny)."""
    import tempfile

    from qin_cdc_spark.operators.similarity import minhash_pairs_cached
    from qin_cdc_spark.streaming.cc_store import IncrementalClusterStore

    pairs = minhash_pairs_cached(spark, sf_dir).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    both_even = (F.col("a") % 2 == 0) & (F.col("b") % 2 == 0)
    st = IncrementalClusterStore(
        spark, gate_tmp("decision_gate_") + "/cc", n_buckets=8
    )
    st.apply_batch(pairs.filter(both_even), batch_id=0)
    st.apply_batch(pairs.filter(~both_even), batch_id=1)
    members = st.read().select(
        F.col("node").alias("doc_id"), F.col("label").alias("component")
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    joined = docs.join(broadcast(members), "doc_id")
    w = Window.partitionBy("component").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return (
        joined.withColumn("rk", F.row_number().over(w))
        .groupBy("component")
        .agg(
            F.max(F.when(F.col("rk") == 1, F.col("doc_id"))).alias("rep_doc_id"),
            F.count(F.lit(1)).alias("n_members"),
        )
    )


QUERIES["dedup_decision_incremental"] = dedup_decision_incremental
ORACLES["dedup_decision_incremental"] = _keep_best_oracle()


# ---------------------------------------------------------------------------
# Embedding int8 quantization: the storage/serving compression step for
# 100 TB embedding stores (4× smaller than float32, SIMD-friendly).
# floor(x*127/maxabs + 0.5) is used instead of round() so Spark and the
# oracle share one exactly-reproducible double formula.

def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = maxabs/127,
    q_i = floor(x_i/scale + 0.5).  Pure narrow ops (transform/aggregate
    higher-order functions) — zero shuffle, whole-stage codegen.

    The gate output flattens the quantized vector to a CSV string
    (``q_csv``): the driver's canonicalizer sorts a pandas frame, and
    array-typed cells (numpy.ndarray) are unhashable there — scalar
    columns only in gate outputs, by policy (see check_correctness.py).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    xd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    maxabs = F.greatest(
        F.array_max(F.transform(xd, F.abs)), F.lit(1e-30)
    )
    quant = F.transform(
        xd, lambda x: F.floor(x * 127.0 / maxabs + 0.5).cast("int")
    )
    return emb.select(
        "vec_id",
        (maxabs / 127.0).alias("scale"),
        F.array_join(F.transform(quant, lambda q: q.cast("string")), ",").alias(
            "q_csv"
        ),
    )


EMB_QUANTIZE_ORACLE = """
SELECT vec_id,
       greatest(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))), 1e-30)
         / 127.0 AS scale,
       array_to_string(list_transform(embedding,
         x -> CAST(floor(CAST(x AS DOUBLE) * 127.0
                / greatest(list_max(list_transform(embedding, x2 -> abs(CAST(x2 AS DOUBLE)))), 1e-30)
                + 0.5) AS INTEGER)), ',') AS q_csv
FROM embeddings
"""

QUERIES["emb_quantize_int8"] = emb_quantize_int8
ORACLES["emb_quantize_int8"] = EMB_QUANTIZE_ORACLE


# ---------------------------------------------------------------------------
# kNN label vote: majority label of the 5 nearest neighbours — the
# classic embedding-space classifier used for quality/domain tagging of
# web corpora.  Query set: vec_id % 20 == 0.

def sim_knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force 5-NN (broadcast query block, corpus streams once)
    then a two-stage deterministic vote: count per label among the
    top-5, winner by (votes DESC, label ASC).  Cosines are rounded to
    9dp before ranking so float summation order can't flip neighbours;
    both rank and vote carry total tie-breaks."""
    emb = load_table(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    q = emb.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    pairs = emb.join(broadcast(q), F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("cand_id"),
        F.col("label").alias("cand_label"),
        F.round(cosine(F.col("q_emb"), F.col("embedding")), 9).alias("cos_r"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_r").desc(), F.col("cand_id").asc()
    )
    top5 = scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5)
    votes = top5.groupBy("query_id", "cand_label").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    wv = Window.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("cand_label").asc()
    )
    return (
        votes.withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
        .select(
            F.col("query_id").alias("vec_id"),
            F.col("cand_label").alias("pred_label"),
            "n_votes",
        )
    )


_KNN_COS_SQL = (
    _DOT_SQL.format(a="q.embedding", b="c.embedding")
    + " / (sqrt(" + _DOT_SQL.format(a="q.embedding", b="q.embedding") + ")"
    + " * sqrt(" + _DOT_SQL.format(a="c.embedding", b="c.embedding") + "))"
)

KNN_VOTE_ORACLE = f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 20 = 0),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id, c.label AS cand_label,
         round({_KNN_COS_SQL}, 9) AS cos_r
  FROM q JOIN embeddings c ON c.vec_id <> q.vec_id),
top5 AS (
  SELECT query_id, cand_label FROM (
    SELECT query_id, cand_label,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos_r DESC, cand_id ASC) AS rn
    FROM scored)
  WHERE rn <= 5),
votes AS (
  SELECT query_id, cand_label, count(*) AS n_votes
  FROM top5 GROUP BY query_id, cand_label)
SELECT query_id AS vec_id, cand_label AS pred_label, n_votes FROM (
  SELECT query_id, cand_label, n_votes,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY n_votes DESC, cand_label ASC) AS vr
  FROM votes)
WHERE vr = 1
"""

QUERIES["sim_knn_label_vote"] = sim_knn_label_vote
ORACLES["sim_knn_label_vote"] = KNN_VOTE_ORACLE


# ---------------------------------------------------------------------------
# Character-level dup verification: Levenshtein over LSH candidate
# pairs — the strictest (and most expensive) dedup verifier, made
# tractable by running it only on the already-banded candidates.

def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-candidate pairs re-verified by edit distance: keep pairs
    whose levenshtein ≤ 20% of the longer text.  The quadratic-cost
    kernel touches only LSH survivors (tiny), never the corpus — the
    only scalable place for an O(n·m) string metric at 100 TB."""
    from qin_cdc_spark.operators.similarity import minhash_pairs_cached

    pairs = minhash_pairs_cached(spark, sf_dir).select("doc_a", "doc_b")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    a = docs.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("text_a"))
    b = docs.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("text_b"))
    withtext = pairs.join(a, "doc_a").join(b, "doc_b")
    dist = F.levenshtein(F.col("text_a"), F.col("text_b"))
    maxlen = F.greatest(F.length("text_a"), F.length("text_b"))
    return (
        withtext.select(
            "doc_a",
            "doc_b",
            dist.alias("edit_dist"),
            F.round(dist.cast("double") / maxlen.cast("double"), 9).alias("edit_ratio"),
        )
        .filter(F.col("edit_ratio") <= 0.2)
    )


def _edit_distance_oracle() -> str:
    from qin_cdc_spark.operators.similarity import _minhash_oracle

    return f"""
WITH pairs AS (SELECT doc_a, doc_b FROM ({_minhash_oracle()}) mh),
wt AS (
  SELECT p.doc_a, p.doc_b,
         CAST(levenshtein(da.text, db.text) AS INTEGER) AS edit_dist,
         round(CAST(levenshtein(da.text, db.text) AS DOUBLE)
               / greatest(length(da.text), length(db.text)), 9) AS edit_ratio
  FROM pairs p
  JOIN documents da ON p.doc_a = da.doc_id
  JOIN documents db ON p.doc_b = db.doc_id)
SELECT doc_a, doc_b, edit_dist, edit_ratio FROM wt WHERE edit_ratio <= 0.2
"""


QUERIES["dedup_edit_distance"] = dedup_edit_distance
ORACLES["dedup_edit_distance"] = _edit_distance_oracle()


# ---------------------------------------------------------------------------
# Sequence packing: assign docs to fixed-token-budget training bins by
# sequential fill — the deterministic, shuffle-once packing used to
# batch documents for training (true first-fit is inherently serial;
# per-group sequential fill is the scalable standard).

PACK_BUDGET = 2048


def pack_sequences_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language sequential packing: docs in doc_id order fill bins
    of PACK_BUDGET whitespace tokens; bin = floor((cumsum - tok) /
    budget).  One window shuffle on lang; each 100 TB language
    partition packs independently."""
    docs = load_table(spark, sf_dir, "documents")
    tok = F.size(words(F.col("text"))).cast("long")
    w = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = F.sum(tok).over(w)
    return docs.select(
        "lang",
        "doc_id",
        tok.alias("n_tokens"),
        F.floor((cum - tok) / F.lit(PACK_BUDGET)).alias("bin_id"),
    )


PACK_SEQUENCES_ORACLE = f"""
SELECT lang, doc_id,
       CAST(len({WORDS_SQL}) AS BIGINT) AS n_tokens,
       CAST(floor((sum(CAST(len({WORDS_SQL}) AS BIGINT)) OVER (
              PARTITION BY lang ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            - CAST(len({WORDS_SQL}) AS BIGINT)) / {PACK_BUDGET}) AS BIGINT) AS bin_id
FROM documents
"""

QUERIES["pack_sequences_bins"] = pack_sequences_bins
ORACLES["pack_sequences_bins"] = PACK_SEQUENCES_ORACLE


def pack_sequences_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The packed-sequence EMITTER: materialize each bin as one training
    sequence — docs concatenated in doc_id order with a separator token,
    plus the bin's doc/token bookkeeping.  The deterministic ordered
    concat is array_sort over (doc_id, text) structs + array_join (no
    nondeterministic collect_list ordering); one shuffle on (lang, bin).
    Downstream this column is what a tokenizer/packer job writes out."""
    bins = pack_sequences_bins(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        bins.join(docs, "doc_id")
        .groupBy("lang", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("doc_id"), F.col("text")))
                    ),
                    lambda s: s["text"],
                ),
                " <doc> ",
            ).alias("packed_text"),
        )
    )


PACK_CONCAT_ORACLE = f"""
WITH b AS ({PACK_SEQUENCES_ORACLE})
SELECT b.lang, b.bin_id,
       count(*) AS n_docs,
       CAST(sum(b.n_tokens) AS BIGINT) AS n_tokens,
       string_agg(d.text, ' <doc> ' ORDER BY b.doc_id) AS packed_text
FROM b JOIN documents d ON b.doc_id = d.doc_id
GROUP BY b.lang, b.bin_id
"""

QUERIES["pack_sequences_concat"] = pack_sequences_concat
ORACLES["pack_sequences_concat"] = PACK_CONCAT_ORACLE


# ---------------------------------------------------------------------------
# Deterministic 3-way split: hash-assign every doc to train/val/test so
# the split is reproducible across runs, engines, and (at 100 TB)
# executors — no RNG state, no shuffle beyond the final count.

def sample_split_3way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90/5/5 split on a portable md5-derived hash of doc_id; returns
    per-(lang, split) counts.  Assignment is a narrow op; the only
    shuffle is the count agg."""
    from qin_cdc_spark.functions.text import hash60

    docs = load_table(spark, sf_dir, "documents")
    bucket = F.pmod(hash60(F.col("doc_id").cast("string")), F.lit(100))
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    return (
        docs.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def _split_oracle() -> str:
    from qin_cdc_spark.operators.llm_text import HASH60_SQL

    h = HASH60_SQL.format(x="CAST(doc_id AS VARCHAR)")
    return f"""
SELECT lang,
       CASE WHEN ({h}) % 100 < 90 THEN 'train'
            WHEN ({h}) % 100 < 95 THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS n_docs
FROM documents GROUP BY 1, 2
"""


QUERIES["sample_split_3way"] = sample_split_3way
ORACLES["sample_split_3way"] = _split_oracle()


# ---------------------------------------------------------------------------
# Deterministic weighted (probability-proportional-to-size) sampling:
# the data-mixing primitive — sample documents proportional to a weight
# (here n_chars, in practice a quality score) so a fixed token budget
# preferentially keeps heavy/high-quality docs.  Systematic PPS over the
# per-source cumulative weight: doc i is selected with MULTIPLICITY
# (W_i div STEP) - ((W_i - w_i) div STEP) — the number of step
# boundaries its weight interval crosses, so E[multiplicity] = w_i/STEP
# holds for EVERY weight, including w_i > STEP (a boundary-spanning doc
# is picked multiple times, exactly like classic systematic PPS with
# replacement).  All-integer arithmetic (div, not floating division —
# no ln/exp/pow whose last-ulp differences across engines flip rank
# boundaries; the float-determinism lesson from PLANS.md applied to
# sampling design).  The window is partitioned by source, so at 100 TB
# each source's cumsum runs in its own partition — no global-order
# bottleneck.

PPS_STEP = 5_000  # chars of cumulative weight per selected doc


def sample_weighted_pps(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = F.col("n_chars").cast("long")
    cum = F.sum(wt).over(w)
    mult = F.expr(
        f"(cum_w div {PPS_STEP}) - ((cum_w - weight) div {PPS_STEP})"
    ).cast("long")
    return (
        docs.select("source", "doc_id", wt.alias("weight"), cum.alias("cum_w"))
        .withColumn("multiplicity", mult)
        .filter(F.col("multiplicity") > 0)
        .select("source", "doc_id", "weight", "multiplicity")
    )


PPS_ORACLE = f"""
WITH c AS (
  SELECT source, doc_id, CAST(n_chars AS BIGINT) AS weight,
         sum(CAST(n_chars AS BIGINT)) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_w
  FROM documents)
SELECT source, doc_id, weight,
       CAST((cum_w // {PPS_STEP}) - ((cum_w - weight) // {PPS_STEP}) AS BIGINT)
         AS multiplicity
FROM c
WHERE (cum_w // {PPS_STEP}) - ((cum_w - weight) // {PPS_STEP}) > 0
"""

QUERIES["sample_weighted_pps"] = sample_weighted_pps
ORACLES["sample_weighted_pps"] = PPS_ORACLE


# ---------------------------------------------------------------------------
# SemDeDup-style semantic dedup: cluster the embedding space (k-means),
# then find near-identical pairs ONLY within each cluster — the O(n²/k)
# scale path for embedding dedup at 100 TB (global brute force is O(n²)).

SEMDEDUP_THRESHOLD = 0.4


def _topm_clusters(centroids: list, m: int):
    """Array of the m nearest centroid ids (squared L2), row-local."""
    cents = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in centroids])
    dists = F.transform(
        cents,
        lambda c: F.aggregate(
            F.zip_with(F.col("embedding"), c, lambda x, y: (x.cast("double") - y) ** 2),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    ranked = F.array_sort(
        F.transform(
            F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
            lambda i: F.struct(
                F.element_at(dists, i + 1).alias("d"), i.cast("int").alias("c")
            ),
        )
    )
    return F.transform(F.slice(ranked, 1, m), lambda s: s["c"])


def _semantic_assignments(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(embeddings, top-2 soft cluster assignments) — the shared first
    stage of SemDeDup: fixed-seed distributed k-means, then each vector
    assigned to its 2 nearest centroids (multi-probe: a pair straddling
    a cluster boundary still co-occurs in one of the two nearest
    clusters — recall recovered for ~2x join volume, still O(n²/k) per
    cluster)."""
    from qin_cdc_spark.operators.ivf import train_kmeans

    emb = load_table(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    centroids = train_kmeans(emb)
    assigned = emb.select(
        "vec_id", "embedding", F.explode(_topm_clusters(centroids, 2)).alias("cluster")
    )
    return emb, assigned


def semantic_cluster_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-cluster cosine near-dup pairs (threshold matches
    dedup_embedding_cosine so recall vs the global operator is
    measurable).  The pair join is keyed on cluster id — each cluster's
    block never leaves its partition; skewed clusters are AQE-split.
    This is the PRODUCTION operator (O(n²/k)); the gate query below
    wraps it in the SemDeDup recall/precision CONTRACT."""
    _, assigned = _semantic_assignments(spark, sf_dir)
    return _pairs_from_assignments(assigned)


def _pairs_from_assignments(assigned: DataFrame) -> DataFrame:
    a = assigned.select(
        F.col("cluster"),
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
    )
    b = assigned.select(
        F.col("cluster"),
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
    )
    pairs = a.join(b, "cluster").filter(F.col("vec_a") < F.col("vec_b"))
    cos = F.round(cosine(F.col("emb_a"), F.col("emb_b")), 9)
    return (
        pairs.select("vec_a", "vec_b", cos.alias("cos_r"))
        .filter(F.col("cos_r") >= SEMDEDUP_THRESHOLD)
        # a pair can co-occur in both probed clusters
        .dropDuplicates(["vec_a", "vec_b"])
    )


def dedup_semantic_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked SemDeDup contract (the sim_ivf_pq_topk pattern —
    iterative k-means can't be SQL-recomputed, so the CONTRACT is the
    oracle, which DuckDB verifies against its own brute-force pair
    recompute): one row asserting

    * ``n_true_pairs`` — the exact global pair census at the threshold
      (Spark's brute-force count must equal DuckDB's — both engines
      agree at round-9 as proven by dedup_embedding_cosine);
    * ``n_assignments`` — cluster-census: the MEASURED row count of the
      actual assignment DataFrame, which the oracle asserts equals
      2·|embeddings| (top-2 soft assignment places every vector in
      exactly 2 clusters — a k<2 training collapse or a dropped-vector
      bug would break this row);
    * ``all_found_true`` — precision 1.0: every clustered pair is a true
      pair (the within-cluster verify is exact cosine at the same
      rounding);
    * ``recall_ge_50pct`` — the clustered pair set covers ≥ 50% of the
      true pairs (measured 63-80% across fixture scales; the production
      recall curve stays asserted in tests/test_curation.py).

    The brute-force truth side is gate-scale measurement scaffolding
    (bounded broadcast, corpus streams once — the sim_cosine_topk
    contract); the production scale path is ``semantic_cluster_pairs``.
    """
    emb, assigned = _semantic_assignments(spark, sf_dir)
    found = _pairs_from_assignments(assigned)
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"))
    truth = (
        a.join(F.broadcast(b), F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine(F.col("emb_a"), F.col("emb_b")), 9).alias("cos_r"),
        )
        .filter(F.col("cos_r") >= SEMDEDUP_THRESHOLD)
        .select("vec_a", "vec_b")
    )
    n_true = truth.count()
    n_found = found.count()
    n_hits = found.join(truth, ["vec_a", "vec_b"], "left_semi").count()
    # the MEASURED assignment census (not recomputed from |emb|): the
    # oracle's 2·count(embeddings) only verifies something because this
    # side counts the real top-2 explode output
    n_assignments = assigned.count()
    return spark.createDataFrame(
        [
            (
                n_true,
                n_assignments,
                n_hits == n_found,
                n_hits * 100 >= n_true * 50,
            )
        ],
        "n_true_pairs long, n_assignments long, all_found_true boolean, "
        "recall_ge_50pct boolean",
    )


_SEMDEDUP_COS = (
    _DOT_SQL.format(a="a.embedding", b="b.embedding")
    + " / (sqrt(" + _DOT_SQL.format(a="a.embedding", b="a.embedding") + ")"
    + " * sqrt(" + _DOT_SQL.format(a="b.embedding", b="b.embedding") + "))"
)

SEMDEDUP_ORACLE = f"""
WITH p AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE round({_SEMDEDUP_COS}, 9) >= {SEMDEDUP_THRESHOLD}
)
SELECT CAST((SELECT count(*) FROM p) AS BIGINT) AS n_true_pairs,
       CAST(2 * (SELECT count(*) FROM embeddings) AS BIGINT) AS n_assignments,
       true AS all_found_true,
       true AS recall_ge_50pct
"""

QUERIES["dedup_semantic_clustered"] = dedup_semantic_clustered
ORACLES["dedup_semantic_clustered"] = SEMDEDUP_ORACLE


# ---------------------------------------------------------------------------
# Inter-source corpus-overlap matrix: exact shingle-set Jaccard between
# every pair of sources — the data-mixing diagnostic that catches one
# source wholesale-containing another (mirror sites, re-crawls, dataset
# re-releases) before both are weighted into a training mix.
#
# Scale shape: the distinct (source, shingle-hash) set is the working
# relation — 8-byte md5-derived keys (same construction as the dedup
# family, so both engines agree exactly), map-side partial distinct.
# The self-join on shingle hash produces at most S² pair rows per
# shingle, and S (number of SOURCES, not docs) is small by nature, so
# unlike doc-level co-occurrence there is no hot-key blowup: the
# aggregate output is bounded by S(S-1)/2 rows.  Per-source sizes are
# an S-row table — broadcast into the final ratio join.

def corpus_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qin_cdc_spark.functions.text import hash60

    docs = load_table(spark, sf_dir, "documents")
    src_sh = (
        docs.select(
            "source",
            F.explode(word_shingles(F.col("text"))).alias("shingle"),
        )
        .select("source", hash60(F.col("shingle")).alias("h"))
        .distinct()
    )
    sizes = src_sh.groupBy("source").agg(F.count(F.lit(1)).alias("n_sh"))
    a = src_sh.alias("a")
    b = src_sh.alias("b")
    inter = (
        a.join(b, "h")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(
        F.col("source").alias("src_a"), F.col("n_sh").alias("n_sh_a")
    )
    sb = sizes.select(
        F.col("source").alias("src_b"), F.col("n_sh").alias("n_sh_b")
    )
    jac = F.round(
        F.col("n_inter")
        / (F.col("n_sh_a") + F.col("n_sh_b") - F.col("n_inter")),
        6,
    )
    return (
        inter.join(broadcast(sa), "src_a")
        .join(broadcast(sb), "src_b")
        .select("src_a", "src_b", "n_inter", jac.alias("jaccard"))
    )


_H60_SH = "CAST(concat('0x', substr(md5(shingle), 1, 15)) AS BIGINT)"

OVERLAP_ORACLE = f"""
WITH sh AS (
  SELECT source, unnest({SHINGLES_SQL.format(w=WORDS_SQL)}) AS shingle
  FROM documents
),
ss AS (SELECT DISTINCT source, {_H60_SH} AS h FROM sh),
sizes AS (SELECT source, count(*) AS n_sh FROM ss GROUP BY 1),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_inter
  FROM ss a JOIN ss b USING (h)
  WHERE a.source < b.source
  GROUP BY 1, 2
)
SELECT src_a, src_b, n_inter,
       round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6)
         AS jaccard
FROM inter
JOIN sizes sa ON sa.source = inter.src_a
JOIN sizes sb ON sb.source = inter.src_b
"""

QUERIES["corpus_overlap_matrix"] = corpus_overlap_matrix
ORACLES["corpus_overlap_matrix"] = OVERLAP_ORACLE


# ---------------------------------------------------------------------------
# Token-budget data mixing: the step that turns a curated corpus into a
# TRAINING MIX — each source gets a share of a fixed token budget
# proportional to its declared mixture weight, and docs fill that share
# in a deterministic portable-hash order (reproducible across engines,
# retries, and cluster sizes; no RNG).  A doc is admitted iff the tokens
# BEFORE it in its source's hash order are under the source's share, so
# each source overshoots by at most one doc — the classic budgeted-
# prefix rule.  All-integer arithmetic end to end.
#
# Scale shape: one window cumsum per source partition (no global order),
# then a broadcast join of the S-row share table.  At 100 TB the cumsum
# is the only shuffle and it is keyed by source.

MIX_TOTAL_TOKENS = 8_000  # total budget (tokens) — ~20% of the
# sf0.01 fixture's token mass, so the budget genuinely constrains the
# hash-checked run (every source's prefix cut is exercised)
CHARS_PER_TOKEN = 4  # fixture-friendly deterministic proxy tokenizer


def _mix_weight_expr(source_col):
    """Declared mixture weight per source: a deterministic function of
    the source name (stand-in for the config table a real run ships) —
    1 + (last digit of the source id) % 4 ∈ {1,2,3,4}."""
    return (
        F.pmod(
            F.regexp_extract(source_col, r"(\d+)$", 1).cast("long"), F.lit(4)
        )
        + 1
    ).cast("long")


def mix_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qin_cdc_spark.functions.text import hash60

    docs = load_table(spark, sf_dir, "documents")
    toks = F.expr(f"n_chars div {CHARS_PER_TOKEN}").cast("long")
    d = docs.select(
        "source",
        "doc_id",
        toks.alias("n_tokens"),
        hash60(F.col("doc_id").cast("string")).alias("h"),
        _mix_weight_expr(F.col("source")).alias("w"),
    )
    # source shares: weight-proportional integer split of the budget
    shares = (
        d.groupBy("source")
        .agg(F.first("w").alias("w"))
        .withColumn("total_w", F.sum("w").over(Window.partitionBy()))
        .select(
            "source",
            F.expr(f"(w * {MIX_TOTAL_TOKENS}) div total_w").alias("share_tokens"),
        )
    )
    win = (
        Window.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(win)
    return (
        d.withColumn("cum_tokens", cum)
        .join(broadcast(shares), "source")
        .filter(F.col("cum_tokens") - F.col("n_tokens") < F.col("share_tokens"))
        .select("source", "doc_id", "n_tokens")
    )


def _mix_oracle() -> str:
    from qin_cdc_spark.operators.llm_text import HASH60_SQL

    h = HASH60_SQL.format(x="CAST(doc_id AS VARCHAR)")
    return f"""
WITH d AS (
  SELECT source, doc_id,
         n_chars // {CHARS_PER_TOKEN} AS n_tokens,
         {h} AS h,
         (CAST(regexp_extract(source, '(\\d+)$', 1) AS BIGINT) % 4) + 1 AS w
  FROM documents),
shares AS (
  SELECT source,
         (any_value(w) * {MIX_TOTAL_TOKENS})
           // (SELECT sum(w) FROM (SELECT source, any_value(w) AS w
                                   FROM d GROUP BY source))
           AS share_tokens
  FROM d GROUP BY source),
c AS (
  SELECT source, doc_id, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_tokens
  FROM d)
SELECT c.source, c.doc_id, c.n_tokens
FROM c JOIN shares ON c.source = shares.source
WHERE c.cum_tokens - c.n_tokens < shares.share_tokens
"""


QUERIES["mix_token_budget"] = mix_token_budget
ORACLES["mix_token_budget"] = _mix_oracle()


# ---------------------------------------------------------------------------
# Cross-document SEGMENT dedup — the C4 "dedup at sub-document level"
# rule adapted to the fixtures: split each doc into non-overlapping
# SEG_WORDS-word segments, keep only the globally FIRST occurrence of
# every distinct segment (order = (doc_id, seg_id)), and rebuild each
# doc from its surviving segments.  Removes boilerplate shared across
# re-crawls/mirrors that document-level dedup can't touch.
#
# Scale shape: segmenting is row-local (narrow higher-order fns); the
# first-occurrence pass is a min(struct) hash agg on segment text —
# map-side partial agg absorbs hot boilerplate segments (the skew case:
# one segment in 10M docs), unlike a window over the hot key.  The
# rebuild is one groupBy(doc_id).  Output is per-doc stats + md5 of the
# rebuilt text (hash-checkable without shipping the corpus through the
# gate).

SEG_WORDS = 10


def dedup_segments_crossdoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = words(F.col("text"))
    n_segs = F.ceil(F.size(w) / F.lit(SEG_WORDS)).cast("int")
    seg_arr = F.transform(
        F.sequence(F.lit(0), n_segs - 1),
        lambda i: F.array_join(
            F.slice(w, i * SEG_WORDS + 1, F.lit(SEG_WORDS)), " "
        ),
    )
    segs = docs.select(
        "doc_id", F.posexplode(seg_arr).alias("seg_id", "seg_text")
    )
    first = segs.groupBy("seg_text").agg(
        F.min(F.struct("doc_id", "seg_id")).alias("f")
    ).select("seg_text", F.col("f.doc_id").alias("doc_id"), F.col("f.seg_id").alias("seg_id"))
    kept = segs.join(first, ["seg_text", "doc_id", "seg_id"], "left_semi")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seg_id", "seg_text"))),
                    lambda s: s["seg_text"],
                ),
                " ",
            )
        ).alias("clean_md5"),
    )
    totals = docs.select("doc_id", n_segs.alias("n_segs"))
    return (
        totals.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_segs",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce(F.col("clean_md5"), F.md5(F.lit(""))).alias("clean_md5"),
        )
    )


def _seg_dedup_oracle() -> str:
    return f"""
WITH d AS (
  SELECT doc_id, {WORDS_SQL} AS w FROM documents),
segged AS (
  SELECT doc_id,
         list_transform(range(0, CAST(ceil(len(w) / {SEG_WORDS}.0) AS INT)),
           i -> array_to_string(w[i*{SEG_WORDS}+1 : (i+1)*{SEG_WORDS}], ' ')) AS segs
  FROM d),
segs AS (
  SELECT doc_id, u.i AS seg_id, segged.segs[u.i + 1] AS seg_text
  FROM segged, unnest(range(0, len(segs))) AS u(i)),
first_occ AS (
  SELECT seg_text, min(struct_pack(doc_id := doc_id, seg_id := seg_id)) AS f
  FROM segs GROUP BY seg_text),
kept AS (
  SELECT s.doc_id, s.seg_id, s.seg_text
  FROM segs s JOIN first_occ f
    ON s.seg_text = f.seg_text AND s.doc_id = (f.f).doc_id
   AND s.seg_id = (f.f).seg_id),
rebuilt AS (
  SELECT doc_id, count(*) AS n_kept,
         md5(string_agg(seg_text, ' ' ORDER BY seg_id)) AS clean_md5
  FROM kept GROUP BY doc_id)
SELECT d.doc_id,
       CAST(ceil(len(d.w) / {SEG_WORDS}.0) AS INT) AS n_segs,
       CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
       coalesce(r.clean_md5, md5('')) AS clean_md5
FROM d LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
"""


QUERIES["dedup_segments_crossdoc"] = dedup_segments_crossdoc
ORACLES["dedup_segments_crossdoc"] = _seg_dedup_oracle()


# ---------------------------------------------------------------------------
# Gopher-style quality rules (Rae et al. 2021 §A1.1, adapted to the
# fixture corpus): the standard pre-training document filter battery —
# word-count bounds, mean-word-length band, alphabetic-word fraction,
# stopword evidence.  Every signal is an integer count with one final
# rounded division, so the rule outcomes are bit-identical across
# engines.  One narrow projection, zero shuffles — at 100 TB this runs
# at scan speed and typically drops 20-40% of a raw web crawl.

GOPHER_MIN_WORDS = 15
GOPHER_MAX_WORDS = 100_000
GOPHER_MEAN_LEN_LO = 3.0
GOPHER_MEAN_LEN_HI = 10.0
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_STOP_HITS = 2
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "a", "in", "that"]


def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = words(F.col("text"))
    n = F.size(w).cast("long")
    sum_len = F.aggregate(
        F.transform(w, F.length), F.lit(0).cast("long"), lambda a, v: a + v
    )
    n_alpha = F.size(F.filter(w, lambda x: x.rlike("[a-z]"))).cast("long")
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(w), F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
        )
    ).cast("long")
    mean_len = F.round(sum_len.cast("double") / n, 6)
    frac_alpha = F.round(n_alpha.cast("double") / n, 6)
    keep = (
        n.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & mean_len.between(GOPHER_MEAN_LEN_LO, GOPHER_MEAN_LEN_HI)
        & (frac_alpha >= GOPHER_MIN_ALPHA_FRAC)
        & (n_stop >= GOPHER_MIN_STOP_HITS)
    )
    return docs.select(
        "doc_id",
        n.alias("n_words"),
        mean_len.alias("mean_word_len"),
        frac_alpha.alias("frac_alpha"),
        n_stop.alias("n_stop_hits"),
        keep.alias("keep"),
    )


GOPHER_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {WORDS_SQL} AS w FROM documents),
m AS (
  SELECT doc_id,
         CAST(len(w) AS BIGINT) AS n_words,
         round(CAST(list_sum(list_transform(w, x -> len(x))) AS DOUBLE)
               / len(w), 6) AS mean_word_len,
         round(CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
                    AS DOUBLE) / len(w), 6) AS frac_alpha,
         CAST(len(list_intersect(list_distinct(w),
              {GOPHER_STOPWORDS!r})) AS BIGINT) AS n_stop_hits
  FROM d)
SELECT doc_id, n_words, mean_word_len, frac_alpha, n_stop_hits,
       (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
        AND mean_word_len BETWEEN {GOPHER_MEAN_LEN_LO} AND {GOPHER_MEAN_LEN_HI}
        AND frac_alpha >= {GOPHER_MIN_ALPHA_FRAC}
        AND n_stop_hits >= {GOPHER_MIN_STOP_HITS}) AS keep
FROM m
"""

QUERIES["text_gopher_rules"] = text_gopher_rules
ORACLES["text_gopher_rules"] = GOPHER_ORACLE


# ---------------------------------------------------------------------------
# Curriculum quality binning: per-source quality DECILES with token-mass
# bookkeeping — the schedule-building step of curriculum training and
# quality-weighted mixing (which decile of each source do I feed when,
# and how many tokens does it hold).  The quality score (the same
# formula as text_quality_score) is rounded to 6 dp BEFORE ranking and
# tie-broken by doc_id, so decile boundaries cannot flip on libm ULP
# differences across engines.  One window per source partition + one
# hash agg — both keyed by source, no global order at 100 TB.

N_QUALITY_BINS = 10


def curriculum_quality_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qin_cdc_spark.functions.text import marker_hits
    from qin_cdc_spark.operators.llm_text import LANG_MARKERS

    docs = load_table(spark, sf_dir, "documents")
    # The score as ONE exact integer ratio: q = num/den where
    #   num = 4·min(100,W)·W·L + 300·S·L + 300·A·W,  den = 1000·W·L
    # (W words, S stopword hits, A alnum chars, L text length) — the
    # same 0.4·len_sat + 0.3·stop + 0.3·alnum formula, but a SINGLE
    # IEEE division of two exact integers is bit-identical across
    # engines, where a 3-term double sum + round(…,6) can flip a ULP
    # (observed as a 4-dp avg tie flip at sf0.01).  Integer-scaled q6
    # then makes per-bin averages exact-sum arithmetic.
    w = words(F.col("text"))
    W = F.size(w).cast("long")
    S = marker_hits(F.lower(F.col("text")), LANG_MARKERS["en"]).cast("long")
    A = F.length(F.regexp_replace(F.col("text"), r"[^A-Za-z0-9 ]", "")).cast("long")
    L = F.length(F.col("text")).cast("long")
    num = (
        F.lit(4) * F.least(F.lit(100).cast("long"), W) * W * L
        + F.lit(300) * S * L
        + F.lit(300) * A * W
    )
    den = F.lit(1000) * W * L
    q = num.cast("double") / den.cast("double")
    scored = docs.select(
        "source",
        "doc_id",
        F.expr(f"n_chars div {CHARS_PER_TOKEN}").cast("long").alias("n_tokens"),
        q.alias("q"),
        F.round(q * 1_000_000).cast("long").alias("q6"),
    )
    win = Window.partitionBy("source").orderBy("q", "doc_id")
    return (
        scored.withColumn("bin", F.ntile(N_QUALITY_BINS).over(win))
        .groupBy("source", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
            # exact integer mean (micro-quality units): Spark's round()
            # HALF_UPs the decimal repr of a double while DuckDB rounds
            # the binary value, so a X.XXX5 average tie flips between
            # engines — integer div of exact sums cannot
            F.expr("sum(q6) div count(*)").cast("long").alias("avg_quality_e6"),
        )
    )


def _curriculum_oracle() -> str:
    from qin_cdc_spark.operators.llm_text import _EN_RE

    return f"""
WITH raw AS (
  SELECT source, doc_id, n_chars // {CHARS_PER_TOKEN} AS n_tokens,
         CAST(len({WORDS_SQL}) AS BIGINT) AS W,
         CAST(len(regexp_extract_all(lower(text), '{_EN_RE}')) AS BIGINT) AS S,
         CAST(length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS BIGINT) AS A,
         CAST(length(text) AS BIGINT) AS L
  FROM documents),
t AS (
  SELECT source, doc_id, n_tokens,
         CAST(4 * least(100, W) * W * L + 300 * S * L + 300 * A * W AS DOUBLE)
           / CAST(1000 * W * L AS DOUBLE) AS q
  FROM raw),
b AS (
  SELECT source, doc_id, n_tokens, q,
         CAST(round(q * 1000000) AS BIGINT) AS q6,
         ntile({N_QUALITY_BINS}) OVER (PARTITION BY source ORDER BY q, doc_id) AS bin
  FROM t)
SELECT source, CAST(bin AS INTEGER) AS bin, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
       CAST(sum(q6) // count(*) AS BIGINT) AS avg_quality_e6
FROM b GROUP BY source, bin
"""


QUERIES["curriculum_quality_bins"] = curriculum_quality_bins
ORACLES["curriculum_quality_bins"] = _curriculum_oracle()


# ---------------------------------------------------------------------------
# Leakage-safe train/val/test split: the split UNIT is the near-dup
# CLUSTER, not the document — a near-duplicate of a training doc landing
# in the eval split is contamination the plain hash split can't prevent.
# Composes the converged CC labels (session-cached, like keep-best) with
# the deterministic hash-split rule: every doc inherits its component's
# split, singletons split on their own id.  At 100 TB the cost over the
# plain split is one broadcast-ish join against the (small) clustered-doc
# label table; the hash-split itself stays row-local and engine-portable.
# The DuckDB oracle recomputes the components with a recursive CTE, so
# the whole composition is hash-checked.
# ---------------------------------------------------------------------------

LEAKAGE_SPLIT_BUCKETS = 20  # 18 train / 1 val / 1 test


def sample_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qin_cdc_spark.functions.text import hash60
    from qin_cdc_spark.operators.llm_ext import cc_labels_cached

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    labels = cc_labels_cached(spark, sf_dir)
    comp = F.coalesce(F.col("component"), F.col("doc_id"))
    bucket = F.pmod(
        hash60(F.concat(F.lit("lsplit:"), comp.cast("string"))),
        F.lit(LEAKAGE_SPLIT_BUCKETS),
    )
    return (
        docs.join(broadcast(labels), "doc_id", "left")
        .select(
            "doc_id",
            comp.alias("component"),
            F.when(bucket <= 17, "train")
            .when(bucket == 18, "val")
            .otherwise("test")
            .alias("split"),
        )
    )


def _leakage_split_oracle() -> str:
    from qin_cdc_spark.operators.llm_text import HASH60_SQL
    from qin_cdc_spark.operators.similarity import _minhash_oracle

    h = HASH60_SQL.format(x="concat('lsplit:', CAST(component AS VARCHAR))")
    return f"""
WITH RECURSIVE
pairs AS (SELECT doc_a, doc_b FROM ({_minhash_oracle()}) mh),
edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
reach(a, b) AS (SELECT a, b FROM edges
                UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
cc AS (SELECT a AS doc_id, least(a, min(b)) AS component FROM reach GROUP BY a),
lab AS (
  SELECT d.doc_id, coalesce(cc.component, d.doc_id) AS component
  FROM documents d LEFT JOIN cc ON d.doc_id = cc.doc_id
)
SELECT doc_id, component,
       CASE WHEN {h} % {LEAKAGE_SPLIT_BUCKETS} <= 17 THEN 'train'
            WHEN {h} % {LEAKAGE_SPLIT_BUCKETS} = 18 THEN 'val'
            ELSE 'test' END AS split
FROM lab
"""


QUERIES["sample_split_leakage_safe"] = sample_split_leakage_safe
ORACLES["sample_split_leakage_safe"] = _leakage_split_oracle()


# -- DSIR-style importance ranking -------------------------------------------

DSIR_BUCKETS = 512
DSIR_TOPK = 40
DSIR_TARGET_SOURCES = ("src0", "src1", "src2", "src3")


def curation_dsir_topk(
    spark: SparkSession, sf_dir: str, _lazy: bool = False
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023),
    integer-exact: rank raw-corpus documents by how much their hashed
    unigram distribution resembles a TARGET (curated) corpus slice.

    DSIR proper scores log(p_target(b)/p_raw(b)) per hashed n-gram
    bucket; logs are transcendental and not bit-portable across
    engines, so the score here is the cross-multiplied linear analog
    (the repo's no-float-division lesson applied to importance
    weighting, same form as corpus_term_drift):

        w[b]    = c_t[b]·R − c_r[b]·T      (over-represented in target ⇒ +)
        score_d = Σ_b n_d[b] · w[b]        (per raw doc, exact int64)

    Shape at 100 TB: bucket counts are a B=512-row relation built by
    one hash-groupBy (map-side combine; 2-byte bucket keys), weights
    broadcast into the one token-scan scoring pass, per-doc sums
    partial-aggregate, top-K is TakeOrderedAndProject — no global
    sort, no float anywhere.  Magnitude bound: |score| ≤ tokens_doc ·
    max(c_t)·R; beyond ~10^12 corpus tokens right-shift the weights
    (w >> k) or lift to decimal(38,0) — documented, not needed at
    fixture scale.  Selection composes with sample_weighted_pps for
    the resampling step (clamp negative scores to 0 as weights)."""
    docs = load_table(spark, sf_dir, "documents")
    from qin_cdc_spark.functions.text import hash60

    is_tgt = F.col("source").isin(*DSIR_TARGET_SOURCES)
    tok = (
        docs.select(
            "doc_id",
            is_tgt.alias("is_tgt"),
            F.explode(words(F.lower(F.col("text")))).alias("w"),
        )
        .select(
            "doc_id",
            "is_tgt",
            F.pmod(hash60(F.col("w")), F.lit(DSIR_BUCKETS)).alias("b"),
        )
    )
    if not _lazy:
        # shared by the count pass and the scoring pass; released after
        # the file-backed materialization below.  The lazy (plan-
        # inspection) path never caches — nothing to leak.
        tok = tok.persist()
    counts = tok.groupBy("b").agg(
        F.sum(F.when(F.col("is_tgt"), 1).otherwise(0)).cast("long").alias("ct"),
        F.sum(F.when(F.col("is_tgt"), 0).otherwise(1)).cast("long").alias("cr"),
    )
    totals = counts.agg(
        F.sum("ct").cast("long").alias("t_tot"),
        F.sum("cr").cast("long").alias("r_tot"),
    )
    weights = counts.crossJoin(broadcast(totals)).select(
        "b",
        (F.col("ct") * F.col("r_tot") - F.col("cr") * F.col("t_tot")).alias("wt"),
    )
    scored = (
        tok.filter(~F.col("is_tgt"))
        .join(broadcast(weights), "b")
        .groupBy("doc_id")
        .agg(F.sum("wt").alias("score"))
    )
    out = scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(
        DSIR_TOPK
    )
    if _lazy:
        return out  # plan-inspection path: fully lazy, nothing cached
    # materialize the tiny top-K to a file-backed frame, then release
    # the token cache — returning a persisted frame would leak its
    # cached blocks for the session lifetime (a persist the caller
    # can't see and so can never release)
    import tempfile

    dest = gate_tmp("dsir_gate_") + "/out"
    try:
        out.write.parquet(dest)
    finally:
        tok.unpersist()
    return docs.sparkSession.read.parquet(dest)


_DSIR_WORDS_SQL = WORDS_SQL.replace("trim(text)", "trim(lower(text))")
_DSIR_TGT_SQL = "source IN ('src0','src1','src2','src3')"

DSIR_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, is_tgt,
         CAST(concat('0x', substr(md5(w), 1, 15)) AS BIGINT) % {DSIR_BUCKETS} AS b
  FROM (
    SELECT doc_id, {_DSIR_TGT_SQL} AS is_tgt, unnest({_DSIR_WORDS_SQL}) AS w
    FROM documents
  )
),
cnt AS (
  SELECT b,
         CAST(sum(CASE WHEN is_tgt THEN 1 ELSE 0 END) AS BIGINT) AS ct,
         CAST(sum(CASE WHEN is_tgt THEN 0 ELSE 1 END) AS BIGINT) AS cr
  FROM tok GROUP BY 1
),
tot AS (
  SELECT CAST(sum(ct) AS BIGINT) AS t_tot, CAST(sum(cr) AS BIGINT) AS r_tot
  FROM cnt
),
wts AS (SELECT b, ct * r_tot - cr * t_tot AS wt FROM cnt, tot),
sc AS (
  SELECT t.doc_id, CAST(sum(w.wt) AS BIGINT) AS score
  FROM tok t JOIN wts w USING (b)
  WHERE NOT t.is_tgt GROUP BY 1
)
SELECT doc_id, score FROM sc
ORDER BY score DESC, doc_id ASC LIMIT {DSIR_TOPK}
"""

QUERIES["curation_dsir_topk"] = curation_dsir_topk
ORACLES["curation_dsir_topk"] = DSIR_ORACLE
