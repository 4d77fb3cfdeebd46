"""LLM-data-pipeline text operators (north star, SURVEY §2.C): exact
dedup, n-gram Jaccard near-dup, token counting, quality scoring,
language ID, fingerprinting — over the ``documents`` fixture.

All per-document features are row-local JVM expressions (no UDFs, no
shuffles); only candidate-pair joins shuffle — see functions/text.py
for the scale rationale.  Every oracle below mirrors the exact same
arithmetic in DuckDB (md5-based hashing keeps the two engines
bit-identical).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from qin_cdc_spark.functions.text import (
    LANG_MARKERS,
    cjk_char_count,
    hash60,
    marker_hits,
    md5_fingerprint,
    normalize_text,
    word_shingles,
    words,
)
from qin_cdc_spark.sources.tables import load_table

# Shared SQL fragments (DuckDB dialect) — keep in lockstep with the
# Column functions in functions/text.py.
NORM_SQL = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
WORDS_SQL = "string_split_regex(trim(text), '\\s+')"
HASH60_SQL = "CAST(concat('0x', substr(md5({x}), 1, 15)) AS BIGINT)"
SHINGLES_SQL = (
    "list_distinct(list_transform("
    "range(1, greatest(1, len({w}) - 2) + 1), "
    "i -> array_to_string(({w})[i:i+2], ' ')))"
)


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by normalized-text hash: one hash-groupBy.  At 100 TB
    this is the cheapest dedup: map-side partial agg on a 32-hex key."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("fp", md5_fingerprint(normalize_text(F.col("text"))))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


DEDUP_EXACT_ORACLE = f"""
SELECT md5({NORM_SQL}) AS fp,
       min(doc_id) AS keep_doc_id, count(*) AS n_copies
FROM documents GROUP BY 1
"""


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprints: md5 hex + 60-bit integer form."""
    docs = load_table(spark, sf_dir, "documents")
    norm = normalize_text(F.col("text"))
    return docs.select(
        "doc_id",
        md5_fingerprint(norm).alias("fp_md5"),
        hash60(norm).alias("fp60"),
    )


TEXT_FINGERPRINT_ORACLE = f"""
SELECT doc_id, md5({NORM_SQL}) AS fp_md5,
       {HASH60_SQL.format(x=NORM_SQL)} AS fp60
FROM documents
"""


_BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens (letters / digits /
    punctuation split) — the standard pre-tokenizer shape."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(words(F.col("text"))).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_ISH), F.lit(0))).alias(
            "bpe_ish_tokens"
        ),
        F.length(F.col("text")).alias("n_chars_actual"),
    )


TEXT_TOKEN_COUNT_ORACLE = f"""
SELECT doc_id,
       CAST(len({WORDS_SQL}) AS INTEGER) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
            AS INTEGER) AS bpe_ish_tokens,
       CAST(length(text) AS INTEGER) AS n_chars_actual
FROM documents
"""


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score: length saturation + EN-stopword ratio +
    alnum purity — the classic cheap pre-filter for training corpora."""
    docs = load_table(spark, sf_dir, "documents")
    w = words(F.col("text"))
    n_words = F.size(w).cast("double")
    stop_ratio = marker_hits(F.lower(F.col("text")), LANG_MARKERS["en"]).cast("double") / n_words
    alnum = F.regexp_replace(F.col("text"), r"[^A-Za-z0-9 ]", "")
    alnum_ratio = F.length(alnum).cast("double") / F.length(F.col("text")).cast("double")
    len_sat = F.least(F.lit(1.0), n_words / F.lit(100.0))
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        stop_ratio.alias("stop_ratio"),
        alnum_ratio.alias("alnum_ratio"),
        (F.lit(0.4) * len_sat + F.lit(0.3) * stop_ratio + F.lit(0.3) * alnum_ratio).alias(
            "quality_score"
        ),
    )


_EN_RE = r"\b(" + "|".join(LANG_MARKERS["en"]) + r")\b"

TEXT_QUALITY_ORACLE = f"""
WITH t AS (
  SELECT doc_id, text,
         CAST(len({WORDS_SQL}) AS DOUBLE) AS n_words,
         CAST(len(regexp_extract_all(lower(text), '{_EN_RE}')) AS DOUBLE) AS n_stop,
         CAST(length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
           / CAST(length(text) AS DOUBLE) AS alnum_ratio
  FROM documents
)
SELECT doc_id, n_words,
       n_stop / n_words AS stop_ratio,
       alnum_ratio,
       0.4 * least(1.0, n_words / 100.0) + 0.3 * (n_stop / n_words)
         + 0.3 * alnum_ratio AS quality_score
FROM t
"""


def predict_language(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``pred_lang``: marker-word / CJK-charset heuristic with a
    fixed tie-break order — deterministic, shared with the oracle.

    Note the fixture's ``lang`` label is decorative (every doc is the
    same English-ish word soup), so accuracy is asserted in tests
    against constructed genuine-language sentences instead.
    """
    low = F.lower(F.col(text_col))
    s_en = marker_hits(low, LANG_MARKERS["en"])
    s_es = marker_hits(low, LANG_MARKERS["es"])
    s_de = marker_hits(low, LANG_MARKERS["de"])
    s_fr = marker_hits(low, LANG_MARKERS["fr"])
    s_zh = cjk_char_count(F.col(text_col))
    pred = (
        F.when(s_zh > 0, "zh")
        .when((s_en >= s_es) & (s_en >= s_de) & (s_en >= s_fr), "en")
        .when((s_es >= s_de) & (s_es >= s_fr), "es")
        .when(s_de >= s_fr, "de")
        .otherwise("fr")
    )
    return df.withColumn("pred_lang", pred)


def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return predict_language(docs).select(
        "doc_id",
        "lang",
        "pred_lang",
        (F.col("pred_lang") == F.col("lang")).alias("is_correct"),
    )


def _marker_re(lang: str) -> str:
    return r"\b(" + "|".join(LANG_MARKERS[lang]) + r")\b"


TEXT_LANGUAGE_ID_ORACLE = f"""
WITH s AS (
  SELECT doc_id, lang,
         len(regexp_extract_all(lower(text), '{_marker_re("en")}')) AS s_en,
         len(regexp_extract_all(lower(text), '{_marker_re("es")}')) AS s_es,
         len(regexp_extract_all(lower(text), '{_marker_re("de")}')) AS s_de,
         len(regexp_extract_all(lower(text), '{_marker_re("fr")}')) AS s_fr,
         len(regexp_extract_all(text, '[\\x{{4e00}}-\\x{{9fff}}]')) AS s_zh
  FROM documents
)
SELECT doc_id, lang,
       CASE WHEN s_zh > 0 THEN 'zh'
            WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
            WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
            WHEN s_de >= s_fr THEN 'de'
            ELSE 'fr' END AS pred_lang,
       (CASE WHEN s_zh > 0 THEN 'zh'
             WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
             WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
             WHEN s_de >= s_fr THEN 'de'
             ELSE 'fr' END) = lang AS is_correct
FROM s
"""


MAX_DF_FRAC = 0.2  # shingles in > this fraction of docs are dropped


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact 3-gram Jaccard ≥ 0.5 over df-filtered
    shingle sets.

    Scale path: explode distinct shingles → drop HOT shingles (document
    frequency > 20% of the corpus — they contribute candidate noise
    quadratic in their df, the classic stop-shingle blowup at 100 TB) →
    self-join on shingle → count co-occurrences = |A∩B| (one shuffle on
    the shingle key), then |A∪B| = |A|+|B|−|A∩B| over the FILTERED
    sets.  All-pairs comparison never materializes.  The oracle applies
    the identical cut.
    """
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    n_docs = docs.count()
    sh = docs.select("doc_id", word_shingles(F.col("text")).alias("shingles"))
    # Join/agg on a 64-bit shingle hash, not the shingle string: the
    # self-join shuffle carries 8-byte keys instead of ~30-byte text.
    # persist() is a materialization barrier — without it the shingle
    # generation re-executes for the df-count AND each join side.
    exploded_all = (
        sh.select("doc_id", F.explode("shingles").alias("s"))
        .select("doc_id", F.xxhash64("s").alias("h"))
        .persist()
    )
    rare = (
        exploded_all.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= MAX_DF_FRAC * n_docs)
        .select("h")
    )
    # filtered feeds three consumers (sizes + both self-join sides);
    # persist so the ex⋈rare join runs once, not three times.
    filtered = exploded_all.join(rare, "h").persist()
    sizes = filtered.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = filtered.select(F.col("doc_id").alias("doc_a"), "h")
    b = filtered.select(F.col("doc_id").alias("doc_b"), "h")
    inter = (
        a.join(b, "h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    # Set sizes attach AFTER pair aggregation, via plain equi-joins on the
    # pair set.  No broadcast hint: `sizes` is O(|docs|) — per-doc, not
    # bounded — so forcing it into every executor's memory is exactly the
    # wrong call at 100 TB; AQE broadcasts dynamically iff the measured
    # side is actually small.
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    out = (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard_r"))
        .persist()
    )
    # Materialize the (tiny) pair result while the heavy intermediates are
    # cached, then release them — round 1 leaked both caches across the
    # whole 149-query gate sweep.
    try:
        out.count()
    finally:
        filtered.unpersist()
        exploded_all.unpersist()
    return out


DEDUP_NGRAM_JACCARD_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, {SHINGLES_SQL.format(w=WORDS_SQL)} AS shingles
  FROM documents
),
ex_all AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM sh
),
rare AS (
  SELECT shingle FROM ex_all GROUP BY shingle
  HAVING count(*) <= {MAX_DF_FRAC} * (SELECT count(*) FROM documents)
),
filtered AS (
  SELECT e.doc_id, e.shingle FROM ex_all e JOIN rare r ON e.shingle = r.shingle
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM filtered GROUP BY doc_id),
ex AS (
  SELECT f.doc_id, s.n_sh, f.shingle FROM filtered f JOIN sizes s ON f.doc_id = s.doc_id
),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS na, b.n_sh AS nb,
         count(*) AS n_inter
  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT doc_a, doc_b,
       round(CAST(n_inter AS DOUBLE) / CAST(na + nb - n_inter AS DOUBLE), 6) AS jaccard_r
FROM inter
WHERE CAST(n_inter AS DOUBLE) / CAST(na + nb - n_inter AS DOUBLE) >= 0.5
"""


QUERIES = {
    "dedup_exact": dedup_exact,
    "text_fingerprint": text_fingerprint,
    "text_token_count": text_token_count,
    "text_quality_score": text_quality_score,
    "text_language_id": text_language_id,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
}

ORACLES = {
    "dedup_exact": DEDUP_EXACT_ORACLE,
    "text_fingerprint": TEXT_FINGERPRINT_ORACLE,
    "text_token_count": TEXT_TOKEN_COUNT_ORACLE,
    "text_quality_score": TEXT_QUALITY_ORACLE,
    "text_language_id": TEXT_LANGUAGE_ID_ORACLE,
    "dedup_ngram_jaccard": DEDUP_NGRAM_JACCARD_ORACLE,
}


def text_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling-hash document fingerprint over word hashes:
    fold h = (h*31 + hash60(w) % M) % M, M = 2^31-1 — order-sensitive
    (unlike a bag-of-words md5), so token transpositions change it.
    Both engines fold left-to-right from the first element."""
    docs = load_table(spark, sf_dir, "documents")
    hs = F.transform(words(F.col("text")), lambda w: hash60(w) % F.lit(2147483647))
    rolled = F.aggregate(
        F.slice(hs, 2, F.greatest(F.lit(0), F.size(hs) - 1)),
        F.element_at(hs, 1),
        lambda acc, h: (acc * 31 + h) % F.lit(2147483647),
    )
    return docs.select("doc_id", rolled.alias("rolling_fp"))


TEXT_ROLLING_HASH_ORACLE = f"""
SELECT doc_id,
       list_reduce(
         list_transform({WORDS_SQL}, w -> {HASH60_SQL.format(x='w')} % 2147483647),
         (a, b) -> (a * 31 + b) % 2147483647) AS rolling_fp
FROM documents
"""

QUERIES["text_rolling_hash"] = text_rolling_hash
ORACLES["text_rolling_hash"] = TEXT_ROLLING_HASH_ORACLE
