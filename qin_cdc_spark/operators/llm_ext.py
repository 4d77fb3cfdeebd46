"""LLM-pipeline extensions (north star, SURVEY §2.C continued): PII
redaction, canonical text cleaning, TF-IDF term scoring, deterministic
corpus sampling (Bernoulli + stratified), and duplicate-CLUSTER
resolution (connected components over verified near-dup pairs).

Everything row-local is a JVM expression; the only shuffles are the
token df aggregation (TF-IDF), the per-stratum window (stratified
sample), and the label-propagation joins (connected components).
Oracles mirror the arithmetic in DuckDB (shared md5-based hashing);
the connected-components oracle is a recursive CTE, so even the
iterative operator is fully hash-checked.

Reference parity: qin-cdc has none of these (SURVEY §2 scope note —
it is a CDC pipeline); they are the BASELINE.json-mandated
training-data operators.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from qin_cdc_spark.functions.text import hash60, window_joins, words
from qin_cdc_spark.operators.llm_text import HASH60_SQL
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


# --------------------------------------------------------------------------
# PII redaction: regex scrub of emails / phone numbers.  The fixture corpus
# contains no PII, so the query injects a deterministic synthetic email +
# phone per document and then redacts — the redaction regexes are generic,
# the oracle mirrors both steps.
# --------------------------------------------------------------------------

EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
PHONE_RE = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3,6}"

PII_REDACT_ORACLE = f"""
WITH dirty AS (
  SELECT doc_id,
         concat(text, ' contact user', CAST(doc_id AS VARCHAR),
                '@mail.example.com or +1-555-',
                lpad(CAST(doc_id AS VARCHAR), 4, '0')) AS t
  FROM documents
)
SELECT doc_id,
       regexp_replace(regexp_replace(t, '{EMAIL_RE}', '<EMAIL>', 'g'),
                      '{PHONE_RE}', '<PHONE>', 'g') AS redacted
FROM dirty
"""


@_q("text_pii_redact", PII_REDACT_ORACLE)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    dirty = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or +1-555-"),
        F.lpad(F.col("doc_id").cast("string"), 4, "0"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(dirty, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return docs.select("doc_id", redacted.alias("redacted"))


# --------------------------------------------------------------------------
# Canonical cleaning: lowercase, strip non-alphanumerics (keep spaces),
# collapse whitespace — the standard pre-tokenization normalization pass.
# --------------------------------------------------------------------------

CLEAN_ORACLE = """
SELECT doc_id,
       trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                           '\\s+', ' ', 'g')) AS clean,
       CAST(len(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                    '\\s+', ' ', 'g'))) AS INTEGER) AS n_chars_clean
FROM documents
"""


@_q("text_clean_canonical", CLEAN_ORACLE)
def text_clean_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "), r"\s+", " "
        )
    )
    return docs.select(
        "doc_id", clean.alias("clean"), F.length(clean).alias("n_chars_clean")
    )


# --------------------------------------------------------------------------
# TF-IDF: top-3 terms per document.  tf = in-doc term count, idf =
# ln(N/df) over the corpus; ranking on the 6-dp-rounded score (kills
# libm ULP skew between JVM and DuckDB) with term as tiebreak.
# Scale shape: one explode + two hash aggs + one per-doc window; df is
# a broadcast-sized table (|vocabulary|), joined to tf without shuffle.
# --------------------------------------------------------------------------

TFIDF_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, term,
         round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf_r
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, tfidf_r
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf_r DESC, term) AS rn
      FROM scored)
WHERE rn <= 3
"""


@_q("text_tfidf_topk", TFIDF_ORACLE)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(words(F.lower(F.col("text")))).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # df derived from tf (one row per (doc,term) already) — avoids a
    # second scan+explode of the corpus; countDistinct collapses to a
    # plain count because tf rows are unique per (doc,term).
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(F.broadcast(n))
        .withColumn(
            "tfidf_r",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf_r").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tfidf_r")
    )


# --------------------------------------------------------------------------
# Deterministic Bernoulli sample: keep ~5% of the corpus by content-free
# key hash.  Unlike rand()-based sampling this is reproducible across
# engines, retries, and cluster sizes — the property a training-data
# pipeline actually needs.
# --------------------------------------------------------------------------

SAMPLE_HASH_ORACLE = f"""
SELECT doc_id, lang, source
FROM documents
WHERE {HASH60_SQL.format(x="concat('sample:', CAST(doc_id AS VARCHAR))")} % 20 = 0
"""


@_q("sample_hash_bernoulli", SAMPLE_HASH_ORACLE)
def sample_hash_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    key = hash60(F.concat(F.lit("sample:"), F.col("doc_id").cast("string")))
    return docs.filter(key % 20 == 0).select("doc_id", "lang", "source")


# --------------------------------------------------------------------------
# Stratified sample: fixed N per stratum (lang), selected by hash order —
# deterministic, single window per stratum, no driver-side loops.
# --------------------------------------------------------------------------

SAMPLE_STRAT_ORACLE = f"""
SELECT lang, doc_id, source
FROM (SELECT lang, doc_id, source,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY {HASH60_SQL.format(x="concat('strat:', CAST(doc_id AS VARCHAR))")},
                        doc_id) AS rn
      FROM documents)
WHERE rn <= 10
"""


@_q("sample_stratified_topn", SAMPLE_STRAT_ORACLE)
def sample_stratified_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    key = hash60(F.concat(F.lit("strat:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(key, F.col("doc_id"))
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("lang", "doc_id", "source")
    )


# --------------------------------------------------------------------------
# Duplicate-cluster resolution: connected components over the verified
# MinHash-LSH near-dup pairs.  Spark side is DataFrame label propagation
# (min-label to fixpoint — O(log diameter) rounds, each one join + one
# agg); the oracle walks the same edges with a recursive CTE, so this
# iterative operator is still fully hash-checked.
# --------------------------------------------------------------------------


def connected_components(pairs: DataFrame, max_iters: int = 20) -> DataFrame:
    """Min-label propagation over an undirected edge list (cols doc_a,
    doc_b) → (doc_id, component) with component = min doc_id reachable.

    Each round: label[v] = min(label[v], min over neighbors' labels).
    Convergence is checked with one scalar agg per round (sum of labels
    strictly decreases until fixpoint).  At 100 TB scale the same loop
    holds: every round is a shuffle on doc_id, and near-dup components
    are shallow (pairs, triangles), so rounds ≈ 2-4.

    Lineage is truncated per round with ``localCheckpoint`` — NOT
    ``persist()``: a cached frame still carries the full logical plan,
    which doubles every iteration (new_labels embeds labels twice), so
    a high-diameter component makes plan ANALYSIS itself the bottleneck
    — the heap dies rendering the exponential plan string long before
    any data moves (found by the union-find property test on a planted
    chain graph).  The checkpoint pins each round's result as a plan
    LEAF, so round N's plan is constant-size no matter N.
    """
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("component", F.col("doc_id"))
        .localCheckpoint()
    )
    prev_sum = labels.agg(F.sum("component")).collect()[0][0]
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy(F.col("src").alias("doc_id"))
            .agg(F.min("component").alias("nbr_min"))
        )
        labels = (
            labels.join(neighbor_min, "doc_id", "left_outer")
            .select(
                "doc_id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint()
        )
        new_sum = labels.agg(F.sum("component")).collect()[0][0]
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels


def _cc_oracle() -> str:
    from qin_cdc_spark.operators.similarity import _minhash_oracle

    return f"""
WITH RECURSIVE
pairs AS (SELECT doc_a, doc_b FROM ({_minhash_oracle()}) mh),
edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
reach(a, b) AS (SELECT a, b FROM edges
                UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
SELECT a AS doc_id, least(a, min(b)) AS component
FROM reach GROUP BY a
"""


def dedup_cluster_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qin_cdc_spark.operators.similarity import minhash_pairs_cached

    pairs = minhash_pairs_cached(spark, sf_dir).select("doc_a", "doc_b")
    return connected_components(pairs)


_CC_CACHE: dict[tuple[str, str], DataFrame] = {}


def cc_labels_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-scoped converged component labels, mirroring
    ``minhash_pairs_cached``: the label-propagation loop (a driver-side
    iteration with per-round scalar aggs) runs once per corpus, and
    downstream consumers (cluster-representative pick) reuse the
    persisted fixpoint instead of re-iterating.  The ``dedup_cluster_cc``
    gate query itself never reads this cache — its bench timing must
    measure the real loop."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _CC_CACHE:
        _CC_CACHE[key] = dedup_cluster_cc(spark, sf_dir)
    return _CC_CACHE[key]


QUERIES["dedup_cluster_cc"] = dedup_cluster_cc
ORACLES["dedup_cluster_cc"] = _cc_oracle()


# --------------------------------------------------------------------------
# Bigram language-model scoring: per-document mean conditional log-prob
# ln P(w_i | w_{i-1}) under the corpus's own bigram counts — the classic
# cheap fluency/perplexity proxy for corpus filtering.  Counts are two
# hash aggs; the per-doc score is one join + one avg; ranking on the
# 6-dp-rounded score for cross-engine determinism.
# --------------------------------------------------------------------------

BIGRAM_ORACLE = """
WITH tok AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
  FROM documents
),
big AS (
  SELECT doc_id, unnest(list_transform(range(1, len(w)), i -> [w[i], w[i+1]])) AS bg
  FROM tok WHERE len(w) >= 2
),
pairs AS (SELECT doc_id, bg[1] AS w1, bg[2] AS w2 FROM big),
bigram_counts AS (SELECT w1, w2, count(*) AS c2 FROM pairs GROUP BY 1, 2),
unigram_counts AS (SELECT w1, count(*) AS c1 FROM pairs GROUP BY 1)
SELECT doc_id,
       round(avg(ln(CAST(c2 AS DOUBLE) / c1)), 6) AS mean_logprob,
       count(*) AS n_bigrams
FROM pairs JOIN bigram_counts USING (w1, w2) JOIN unigram_counts USING (w1)
GROUP BY doc_id
"""


@_q("text_bigram_logprob", BIGRAM_ORACLE)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = words(F.lower(F.col("text")))
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(w) - 1),
        lambda i: F.struct(
            F.element_at(w, i).alias("w1"), F.element_at(w, i + 1).alias("w2")
        ),
    )
    pairs = (
        docs.filter(F.size(w) >= 2)
        .select("doc_id", F.explode(bigrams).alias("bg"))
        .select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    bigram_counts = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    unigram_counts = pairs.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    return (
        pairs.join(F.broadcast(bigram_counts), ["w1", "w2"])
        .join(F.broadcast(unigram_counts), ["w1"])
        .groupBy("doc_id")
        .agg(
            F.round(F.avg(F.log(F.col("c2").cast("double") / F.col("c1"))), 6).alias(
                "mean_logprob"
            ),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
    )


# --------------------------------------------------------------------------
# Corpus curation: the composed keep/drop decision a training-data
# pipeline actually ships — language gate ∧ quality gate ∧ length gate
# in ONE pass (all row-local expressions, so Catalyst fuses the whole
# filter stack into the scan).
# --------------------------------------------------------------------------


def _curation_oracle() -> str:
    from qin_cdc_spark.operators.llm_text import (
        TEXT_LANGUAGE_ID_ORACLE,
        TEXT_QUALITY_ORACLE,
    )

    return f"""
WITH lang_pred AS ({TEXT_LANGUAGE_ID_ORACLE}),
q AS ({TEXT_QUALITY_ORACLE})
SELECT q.doc_id, q.n_words, q.quality_score, lang_pred.pred_lang
FROM q JOIN lang_pred ON q.doc_id = lang_pred.doc_id
WHERE lang_pred.pred_lang = 'en'
  AND q.quality_score >= 0.5
  AND q.n_words BETWEEN 20 AND 1000
"""


def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qin_cdc_spark.operators.llm_text import predict_language, text_quality_score

    quality = text_quality_score(spark, sf_dir)
    lang = predict_language(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "pred_lang"
    )
    return (
        quality.join(lang, "doc_id")
        .filter(
            (F.col("pred_lang") == "en")
            & (F.col("quality_score") >= 0.5)
            & (F.col("n_words").between(20, 1000))
        )
        .select("doc_id", "n_words", "quality_score", "pred_lang")
    )


QUERIES["pipeline_corpus_curation"] = pipeline_corpus_curation
ORACLES["pipeline_corpus_curation"] = _curation_oracle()


# --------------------------------------------------------------------------
# Repetition ratio (Gopher-style quality signal): fraction of 3-gram
# occurrences that are repeats — high values flag boilerplate/spam.
# Row-local (no shuffle at all): total vs distinct shingle counts.
# --------------------------------------------------------------------------

REPETITION_ORACLE = """
WITH s AS (
  SELECT doc_id,
         list_transform(range(1, greatest(1, len(w) - 2) + 1),
                        i -> array_to_string(w[i:i+2], ' ')) AS grams
  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
        FROM documents)
)
SELECT doc_id, CAST(len(grams) AS INTEGER) AS n_grams,
       round(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams), 6)
         AS repetition_ratio
FROM s WHERE len(grams) > 0
"""


@_q("text_repetition_ratio", REPETITION_ORACLE)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = words(F.lower(F.col("text")))
    grams = window_joins(w, 3, F.greatest(F.lit(1), F.size(w) - 2))
    out = docs.select("doc_id", grams.alias("grams")).filter(F.size("grams") > 0)
    return out.select(
        "doc_id",
        F.size("grams").alias("n_grams"),
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct("grams")).cast("double") / F.size("grams"),
            6,
        ).alias("repetition_ratio"),
    )


# --------------------------------------------------------------------------
# Word entropy (vocabulary-diversity quality signal): Shannon entropy of
# the in-doc word distribution.  One explode + per-doc agg.
# --------------------------------------------------------------------------

WORD_ENTROPY_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS c FROM tok GROUP BY 1, 2),
n AS (SELECT doc_id, sum(c) AS n FROM tf GROUP BY 1)
SELECT doc_id,
       round(-sum((CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)), 6)
         AS word_entropy
FROM tf JOIN n USING (doc_id)
GROUP BY doc_id
"""


@_q("text_word_entropy", WORD_ENTROPY_ORACLE)
def text_word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(words(F.lower(F.col("text")))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("c"))
    n = tf.groupBy("doc_id").agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    return (
        tf.join(n, "doc_id")
        .groupBy("doc_id")
        .agg(F.round(-F.sum(p * F.log(p)), 6).alias("word_entropy"))
    )


# --------------------------------------------------------------------------
# Chunk-level dedup (the CCNet/RefinedWeb line-dedup move on fixture text
# with no newlines): consecutive 10-word chunks hashed, chunks appearing
# in ≥2 documents reported with document/occurrence counts.  At 100 TB
# this is a single explode + hash-agg on a 32-hex key — the map-side
# combine carries |distinct chunks|, not |chunks|.
# --------------------------------------------------------------------------

CHUNK_WORDS = 10

CHUNK_DEDUP_ORACLE = f"""
WITH w AS (SELECT doc_id, {{words}} AS ws FROM documents),
ch AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ws) // {CHUNK_WORDS} + 1),
           i -> md5(array_to_string(
                  ws[(i-1)*{CHUNK_WORDS}+1:(i-1)*{CHUNK_WORDS}+{CHUNK_WORDS}], ' '))))
           AS chunk_hash
  FROM w WHERE len(ws) >= {CHUNK_WORDS}
)
SELECT chunk_hash, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ
FROM ch GROUP BY 1
HAVING count(DISTINCT doc_id) >= 2
"""


@_q("text_chunk_dedup", CHUNK_DEDUP_ORACLE.format(words="string_split_regex(trim(text), '\\s+')"))
def text_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = words(F.col("text"))
    chunks = F.transform(
        F.sequence(F.lit(1), (F.size(w) / CHUNK_WORDS).cast("int")),
        lambda i: F.md5(
            F.concat_ws(" ", F.slice(w, (i - 1) * CHUNK_WORDS + 1, CHUNK_WORDS))
        ),
    )
    ch = (
        docs.filter(F.size(words(F.col("text"))) >= CHUNK_WORDS)
        .select("doc_id", F.explode(chunks).alias("chunk_hash"))
    )
    return (
        ch.groupBy("chunk_hash")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occ"),
        )
        .filter(F.col("n_docs") >= 2)
    )


# --------------------------------------------------------------------------
# Corpus-wide top 3-grams by document frequency — the boilerplate /
# template detector that feeds line-dedup blocklists.  Distinct shingles
# per doc (df, not tf), global hash-agg, deterministic top-20.
# --------------------------------------------------------------------------

TOP_NGRAMS_ORACLE = """
WITH sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, greatest(1, len(string_split_regex(trim(text), '\\s+')) - 2) + 1),
           i -> array_to_string((string_split_regex(trim(text), '\\s+'))[i:i+2], ' '))))
           AS shingle
  FROM documents
)
SELECT shingle, count(*) AS df FROM sh GROUP BY shingle
ORDER BY df DESC, shingle ASC LIMIT 20
"""


@_q("corpus_top_ngrams", TOP_NGRAMS_ORACLE)
def corpus_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qin_cdc_spark.functions.text import word_shingles

    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(F.explode(word_shingles(F.col("text"))).alias("shingle"))
    return (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.col("df").desc(), F.col("shingle").asc())
        .limit(20)
    )
