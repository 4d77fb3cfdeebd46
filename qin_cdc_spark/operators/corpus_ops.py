"""Corpus-maintenance operators (north-star §2.C extensions): sliding-
window duplicated-substring spans (the suffix-array dedup approximation
of Lee et al. 2022 re-expressed as relational ops), hashed-linear
quality-model inference (fastText-style hashing trick with zero Python),
snapshot diffing between corpus versions, and a mergeable binned
quantile sketch.

The reference (qin-cdc) has no text surface — these extend the LLM-data
north star.  Every output column is scalar integer/string (canon-proof
per the round-2 lesson), and every oracle mirrors the exact integer
arithmetic in DuckDB.

Scale notes per operator live on the functions.
"""

from __future__ import annotations

from qin_cdc_spark.testing import gate_tmp

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from qin_cdc_spark.functions.text import hash60, window_joins, word_shingles, words
from qin_cdc_spark.operators.llm_text import HASH60_SQL, SHINGLES_SQL, WORDS_SQL
from qin_cdc_spark.sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}


# ---------------------------------------------------------------------------
# Duplicated-substring spans (Lee et al. 2022 "Deduplicating Training
# Data Makes Language Models Better" — the ExactSubstr criterion).  The
# paper builds a suffix array; a suffix array is a single-machine
# artifact, so at 100 TB the standard distributed re-expression is
# sliding fixed-width windows at EVERY word position (stride 1): any
# duplicated substring of >= W words contains at least one duplicated
# W-window, so window-level duplication detection + interval merge
# recovers the duplicated spans (with at most W-1 words of boundary
# slop on each side).
#
# Plan shape: posexplode to ~n_words rows/doc carrying an 8-byte hash60
# key; one map-side-combinable groupBy for global occurrence counts +
# first occurrence (min struct); island merge is a per-doc window (one
# hashpartition(doc_id) exchange).  Nothing is quadratic; the shuffle
# volume is O(total words), the same as any tokenization pass.

SUBSTR_W = 8  # window width in words


def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-substring statistics.

    A W-word window (stride 1) is *duplicated* iff its text occurs more
    than once in the corpus AND this occurrence is not the global first
    (min (doc_id, pos) keeps one canonical copy, the keep-first rule
    the paper's dedup applies).  Overlapping duplicated windows in a
    document merge into spans (gaps-and-islands on the covered word
    intervals [pos, pos+W-1]).

    Output (all scalar ints): doc_id, n_windows, n_dup_windows,
    n_spans, dup_cover_words (word positions covered by merged spans).
    """
    docs = load_table(spark, sf_dir, "documents")
    w = words(F.col("text"))
    n_win = F.greatest(F.lit(0), F.size(w) - F.lit(SUBSTR_W - 1))
    # filter BEFORE the sequence: sequence(1, 0) would descend, not empty
    # W-word window strings via the shared zip_with kernel (window_joins
    # — OPTIMIZATION_r10: per-position slice+array_join ran interpreted
    # at O(W) per window), then hash60 each; docs are pre-filtered to
    # n >= W so every kept window is full-width.
    wins = docs.filter(F.size(w) >= SUBSTR_W).select(
        "doc_id",
        F.posexplode(
            F.transform(
                window_joins(w, SUBSTR_W, F.size(w) - F.lit(SUBSTR_W - 1)),
                lambda s: hash60(s),
            )
        ).alias("pos", "h"),
    )
    # materialization barrier: wins feeds BOTH the occurrence agg and the
    # join back — without it the per-window md5 hashing runs twice (the
    # repo-wide CollapseProject lesson); repartition first because the
    # one-file fixture otherwise hashes on a single partition.
    # Measured at sf0.1: 7.5 s → 4.4 s.
    wins = wins.repartition(spark.sparkContext.defaultParallelism).persist()
    occ = wins.groupBy("h").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min(F.struct("doc_id", "pos")).alias("first"),
    )
    dups = (
        wins.join(occ, "h")
        .filter(
            (F.col("cnt") > 1)
            & ~(
                (F.col("first.doc_id") == F.col("doc_id"))
                & (F.col("first.pos") == F.col("pos"))
            )
        )
        .select("doc_id", "pos")
    )
    bypos = Window.partitionBy("doc_id").orderBy("pos")
    islands = (
        dups.withColumn("prev", F.lag("pos").over(bypos))
        .withColumn(
            "new_island",
            F.when(
                F.col("prev").isNull()
                | (F.col("pos") > F.col("prev") + F.lit(SUBSTR_W - 1)),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("island", F.sum("new_island").over(bypos))
    )
    per_island = islands.groupBy("doc_id", "island").agg(
        (F.max("pos") - F.min("pos") + F.lit(SUBSTR_W)).alias("cover")
    )
    per_doc = per_island.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("cover").alias("dup_cover_words"),
    )
    dup_counts = dups.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_dup_windows"))
    base = docs.select("doc_id", n_win.cast("long").alias("n_windows"))
    out = (
        base.join(dup_counts, "doc_id", "left")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_windows",
            F.coalesce("n_dup_windows", F.lit(0)).cast("long").alias("n_dup_windows"),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("dup_cover_words", F.lit(0))
            .cast("long")
            .alias("dup_cover_words"),
        )
        .persist()
    )
    out.count()
    wins.unpersist()
    return out


W = SUBSTR_W  # short alias for the oracle f-string below
_WIN_HASH_SQL = HASH60_SQL.format(
    x=f"array_to_string(w[u.i : u.i + {W} - 1], ' ')"
)

_SUBSTR_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {WORDS_SQL} AS w FROM documents),
wins AS (
  SELECT doc_id, u.i AS pos, {_WIN_HASH_SQL} AS h
  FROM d, unnest(range(1, greatest(0, len(w) - {W} + 1) + 1)) AS u(i)),
occ AS (
  SELECT h, count(*) AS cnt,
         min(struct_pack(doc_id := doc_id, pos := pos)) AS first
  FROM wins GROUP BY h),
dups AS (
  SELECT w.doc_id, w.pos
  FROM wins w JOIN occ o ON w.h = o.h
  WHERE o.cnt > 1
    AND NOT ((o.first).doc_id = w.doc_id AND (o.first).pos = w.pos)),
islands AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + {W} - 1
              THEN 1 ELSE 0 END AS new_island
  FROM dups),
numbered AS (
  SELECT doc_id, pos,
         sum(new_island) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM islands),
per_island AS (
  SELECT doc_id, island, max(pos) - min(pos) + {W} AS cover
  FROM numbered GROUP BY doc_id, island),
per_doc AS (
  SELECT doc_id, count(*) AS n_spans, sum(cover) AS dup_cover_words
  FROM per_island GROUP BY doc_id),
dup_counts AS (
  SELECT doc_id, count(*) AS n_dup_windows FROM dups GROUP BY doc_id)
SELECT d.doc_id,
       CAST(greatest(0, len(d.w) - {W} + 1) AS BIGINT) AS n_windows,
       CAST(coalesce(c.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
       CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(p.dup_cover_words, 0) AS BIGINT) AS dup_cover_words
FROM d LEFT JOIN dup_counts c ON d.doc_id = c.doc_id
       LEFT JOIN per_doc p ON d.doc_id = p.doc_id
"""

QUERIES["dedup_substring_spans"] = dedup_substring_spans
ORACLES["dedup_substring_spans"] = _SUBSTR_ORACLE


# ---------------------------------------------------------------------------
# Hashed-linear quality model inference (fastText-style).  Real curation
# pipelines score every document with a linear classifier over hashed
# unigram+bigram features (the hashing trick bounds the weight table).
# The inference pattern at 100 TB: weights live in a broadcast array /
# map, features hash row-locally, the dot product is a row-local
# aggregate — ZERO shuffles, zero Python, whole-stage codegen end to
# end.  `score_hashed_linear` takes an arbitrary weights DataFrame
# (the trained-model path, exercised in tests); the gate query derives
# the weight of each bucket from md5 so DuckDB reproduces the exact
# integer score without shipping a weights artifact.

HASH_BUCKETS = 1 << 18  # 262144 — fastText default-ish table size


def _feature_weight(bucket: F.Column) -> F.Column:
    """Deterministic pseudo-weight in [-1000, 1000] (integer milli-units)."""
    return hash60(F.concat(F.lit("w#"), bucket.cast("string"))) % 2001 - 1000


def score_hashed_linear(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append hashed-linear score columns to ``df`` (row-local)."""
    w = words(F.col(text_col))
    unigrams = F.array_distinct(w)
    bigrams = F.array_distinct(
        window_joins(w, 2, F.greatest(F.lit(1), F.size(w) - 1))
    )
    feats = F.array_union(unigrams, bigrams)
    buckets = F.transform(feats, lambda t: hash60(t) % HASH_BUCKETS)
    score = F.aggregate(
        buckets,
        F.lit(0).cast("long"),
        lambda acc, b: acc + _feature_weight(b),
    )
    return df.withColumn("n_feats", F.size(buckets).cast("long")).withColumn(
        "score_milli", score
    )


def text_hashed_linear_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = score_hashed_linear(docs)
    return scored.select(
        "doc_id",
        "n_feats",
        "score_milli",
        (F.col("score_milli") > 0).cast("int").alias("keep"),
    )


_HLS_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {WORDS_SQL} AS w FROM documents),
f AS (
  SELECT doc_id,
         list_distinct(
           list_concat(
             list_distinct(w),
             list_distinct(list_transform(
               range(1, greatest(1, len(w) - 1) + 1),
               i -> array_to_string(w[i:i+1], ' ')))))
         AS feats
  FROM d),
b AS (
  SELECT doc_id,
         list_transform(feats,
           t -> {HASH60_SQL.format(x="t")} % {HASH_BUCKETS}) AS buckets
  FROM f)
SELECT doc_id,
       CAST(len(buckets) AS BIGINT) AS n_feats,
       CAST(coalesce(list_sum(list_transform(buckets,
              bk -> {HASH60_SQL.format(x="concat('w#', CAST(bk AS VARCHAR))")}
                    % 2001 - 1000)), 0) AS BIGINT) AS score_milli,
       CAST(coalesce(list_sum(list_transform(buckets,
              bk -> {HASH60_SQL.format(x="concat('w#', CAST(bk AS VARCHAR))")}
                    % 2001 - 1000)), 0) > 0 AS INT) AS keep
FROM b
"""

QUERIES["text_hashed_linear_score"] = text_hashed_linear_score
ORACLES["text_hashed_linear_score"] = _HLS_ORACLE


# ---------------------------------------------------------------------------
# Corpus snapshot diff.  Dataset releases are versioned; the diff
# between version N and N+1 (added / removed / changed / unchanged by
# content hash) is the basic audit artifact.  Plan shape: both sides
# prune to (doc_id, md5(text)) at the scan, one full-outer sort-merge
# join on doc_id — shuffle carries 40-byte rows regardless of document
# size, which is the point: never diff text bodies, diff fingerprints.
# The two "versions" here are deterministic derivations of the fixture
# (v2 drops doc_id%10==1, adds a revision suffix to doc_id%7==0).


def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    v1 = docs.filter(F.col("doc_id") % 10 != 9).select(
        "doc_id", F.md5(F.col("text")).alias("h1")
    )
    v2 = (
        docs.filter(F.col("doc_id") % 10 != 1)
        .select(
            "doc_id",
            F.md5(
                F.when(
                    F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" [rev2]"))
                ).otherwise(F.col("text"))
            ).alias("h2"),
        )
    )
    return (
        v1.join(v2, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.when(F.col("h1").isNull(), F.lit("added"))
            .when(F.col("h2").isNull(), F.lit("removed"))
            .when(F.col("h1") != F.col("h2"), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
            .alias("status"),
        )
    )


_DIFF_ORACLE = """
WITH v1 AS (
  SELECT doc_id, md5(text) AS h1 FROM documents WHERE doc_id % 10 != 9),
v2 AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 7 = 0 THEN concat(text, ' [rev2]')
                  ELSE text END) AS h2
  FROM documents WHERE doc_id % 10 != 1)
SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
       CASE WHEN v1.doc_id IS NULL THEN 'added'
            WHEN v2.doc_id IS NULL THEN 'removed'
            WHEN h1 != h2 THEN 'changed'
            ELSE 'unchanged' END AS status
FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
"""

QUERIES["corpus_snapshot_diff"] = corpus_snapshot_diff
ORACLES["corpus_snapshot_diff"] = _DIFF_ORACLE


# ---------------------------------------------------------------------------
# Mergeable binned quantile sketch.  Exact percentiles need a global
# sort; at 100 TB the standard answer is a mergeable sketch.  Fixed
# integer bins (width 256 chars) give a deterministic, additively-
# mergeable histogram whose cumulative walk yields percentile upper
# bounds with error <= bin width — the t-digest trade-off with
# cross-engine-exact integer arithmetic (a float-centroid digest can
# never be hash-checked across engines).  One map-side-combinable
# groupBy; the percentile walk runs over |bins| rows per source.

QBIN_WIDTH = 256


def sketch_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source p50/p90/p99 upper-bound estimates of n_chars."""
    docs = load_table(spark, sf_dir, "documents")
    bins = docs.groupBy(
        "source", F.expr(f"n_chars div {QBIN_WIDTH}").alias("bin")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    bysrc = Window.partitionBy("source").orderBy("bin")
    cum = bins.withColumn("cum", F.sum("cnt").over(bysrc)).withColumn(
        "total", F.sum("cnt").over(Window.partitionBy("source"))
    )

    def est(p_num: int, p_den: int) -> F.Column:
        # smallest bin whose cumulative count reaches ceil(p * total):
        # integer threshold avoids float rank comparisons entirely.
        reach = F.col("cum") * p_den >= F.col("total") * p_num
        return F.min(F.when(reach, (F.col("bin") + 1) * QBIN_WIDTH))

    return cum.groupBy("source").agg(
        F.max("total").alias("n_docs"),
        est(50, 100).alias("p50_chars_ub"),
        est(90, 100).alias("p90_chars_ub"),
        est(99, 100).alias("p99_chars_ub"),
    )


_QBIN_ORACLE = f"""
WITH bins AS (
  SELECT source, CAST(n_chars // {QBIN_WIDTH} AS BIGINT) AS bin,
         count(*) AS cnt
  FROM documents GROUP BY 1, 2),
cum AS (
  SELECT source, bin, cnt,
         sum(cnt) OVER (PARTITION BY source ORDER BY bin) AS cum,
         sum(cnt) OVER (PARTITION BY source) AS total
  FROM bins)
SELECT source,
       CAST(max(total) AS BIGINT) AS n_docs,
       CAST(min(CASE WHEN cum * 100 >= total * 50
                THEN (bin + 1) * {QBIN_WIDTH} END) AS BIGINT) AS p50_chars_ub,
       CAST(min(CASE WHEN cum * 100 >= total * 90
                THEN (bin + 1) * {QBIN_WIDTH} END) AS BIGINT) AS p90_chars_ub,
       CAST(min(CASE WHEN cum * 100 >= total * 99
                THEN (bin + 1) * {QBIN_WIDTH} END) AS BIGINT) AS p99_chars_ub
FROM cum GROUP BY source
"""

QUERIES["sketch_quantile_bins"] = sketch_quantile_bins
ORACLES["sketch_quantile_bins"] = _QBIN_ORACLE


# ---------------------------------------------------------------------------
# Content-defined chunking (Rabin-style).  Fixed-width chunking
# (text_chunk_dedup, dedup_segments_crossdoc) breaks on insertion: one
# added word shifts every later segment boundary, so unchanged content
# re-hashes differently.  Content-defined boundaries — "cut where a
# rolling hash of the last G words satisfies h % B == 0" — move only
# locally under edits, which is why CDC-chunking underpins dedup
# storage (LBFS, restic, borg) and is the right chunk-level dedup for
# corpora that get revised between crawls.
#
# All chunking is ROW-LOCAL higher-order-array work (zero shuffle);
# only the chunk-hash groupBy and the per-doc stats join shuffle, both
# map-side combinable on 8-byte keys.  Expected chunk length B words.

CDC_G = 4  # rolling window (words) feeding the boundary test
CDC_B = 16  # boundary modulus ⇒ expected chunk length in words


def cdc_chunk_relation(docs: DataFrame) -> DataFrame:
    """(doc_id, idx, chunk_words, ch) — the content-defined chunk set of
    ``docs`` (needs doc_id + text columns).  Fully row-local."""
    M = 2147483647
    base = docs.select(
        "doc_id", words(F.col("text")).alias("w")
    ).withColumn("hs", F.transform(F.col("w"), lambda t: hash60(t) % M))
    n = F.size("w")

    def g(i):
        # windowed polynomial hash of words i-3..i (1-based); every term
        # < M*31^3 + M < 2^46, exact in int64 on both engines
        e = lambda k: F.element_at(F.col("hs"), i - k)
        return (((e(3) * 31 + e(2)) * 31 + e(1)) * 31 + e(0)) % M

    bpos = F.when(
        n >= CDC_G,
        F.filter(F.sequence(F.lit(CDC_G), n), lambda i: g(i) % CDC_B == 0),
    ).otherwise(F.array().cast("array<int>"))
    starts = F.concat(F.array(F.lit(1)), F.transform(bpos, lambda b: b + 1))
    ends = F.concat(bpos, F.array(n))
    spans = F.zip_with(starts, ends, lambda s, e: F.struct(s.alias("s"), e.alias("e")))
    return (
        base.select("doc_id", "w", F.posexplode(spans).alias("idx", "sp"))
        .filter(F.col("sp.e") >= F.col("sp.s"))
        .select(
            "doc_id",
            "idx",
            (F.col("sp.e") - F.col("sp.s") + 1).alias("chunk_words"),
            hash60(
                F.array_join(
                    F.slice(F.col("w"), F.col("sp.s"), F.col("sp.e") - F.col("sp.s") + 1),
                    " ",
                )
            ).alias("ch"),
        )
    )


def chunk_content_defined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-doc duplicate-chunk stats over content-defined chunks.

    Output per doc (scalar ints): n_chunks, n_dup_chunks (occurrences
    whose chunk text repeats globally, minus the global first
    occurrence), dup_chunk_words (word mass of those occurrences).
    """
    chunks = cdc_chunk_relation(load_table(spark, sf_dir, "documents"))
    occ = chunks.groupBy("ch").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min(F.struct("doc_id", "idx")).alias("first"),
    )
    dups = chunks.join(occ, "ch").filter(
        (F.col("cnt") > 1)
        & ~(
            (F.col("first.doc_id") == F.col("doc_id"))
            & (F.col("first.idx") == F.col("idx"))
        )
    )
    per_doc = chunks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_chunks"))
    dup_doc = dups.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup_chunks"),
        F.sum("chunk_words").alias("dup_chunk_words"),
    )
    return (
        per_doc.join(dup_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_chunks").cast("long").alias("n_chunks"),
            F.coalesce("n_dup_chunks", F.lit(0)).cast("long").alias("n_dup_chunks"),
            F.coalesce("dup_chunk_words", F.lit(0))
            .cast("long")
            .alias("dup_chunk_words"),
        )
    )


_CDC_CHUNK_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {WORDS_SQL} AS w FROM documents),
h AS (
  SELECT doc_id, w, len(w) AS n,
         list_transform(w, t -> {HASH60_SQL.format(x="t")} % 2147483647) AS hs
  FROM d),
b AS (
  SELECT doc_id, w, n,
         CASE WHEN n >= {CDC_G} THEN
           list_filter(range({CDC_G}, n + 1),
             i -> (((hs[i-3]*31 + hs[i-2])*31 + hs[i-1])*31 + hs[i])
                  % 2147483647 % {CDC_B} = 0)
         ELSE [] END AS bpos
  FROM h),
sp AS (
  SELECT doc_id, w,
         list_concat([1], list_transform(bpos, x -> x + 1)) AS starts,
         list_concat(bpos, [n]) AS ends
  FROM b),
chunks AS (
  SELECT doc_id, u.k - 1 AS idx,
         ends[u.k] - starts[u.k] + 1 AS chunk_words,
         {HASH60_SQL.format(x="array_to_string(w[starts[u.k] : ends[u.k]], ' ')")} AS ch
  FROM sp, unnest(range(1, len(starts) + 1)) AS u(k)
  WHERE ends[u.k] >= starts[u.k]),
occ AS (
  SELECT ch, count(*) AS cnt,
         min(struct_pack(doc_id := doc_id, idx := idx)) AS first
  FROM chunks GROUP BY ch),
dups AS (
  SELECT c.doc_id, c.chunk_words
  FROM chunks c JOIN occ o ON c.ch = o.ch
  WHERE o.cnt > 1
    AND NOT ((o.first).doc_id = c.doc_id AND (o.first).idx = c.idx)),
per_doc AS (
  SELECT doc_id, count(*) AS n_chunks FROM chunks GROUP BY doc_id),
dup_doc AS (
  SELECT doc_id, count(*) AS n_dup_chunks, sum(chunk_words) AS dup_chunk_words
  FROM dups GROUP BY doc_id)
SELECT p.doc_id,
       CAST(p.n_chunks AS BIGINT) AS n_chunks,
       CAST(coalesce(dd.n_dup_chunks, 0) AS BIGINT) AS n_dup_chunks,
       CAST(coalesce(dd.dup_chunk_words, 0) AS BIGINT) AS dup_chunk_words
FROM per_doc p LEFT JOIN dup_doc dd ON p.doc_id = dd.doc_id
"""

QUERIES["chunk_content_defined"] = chunk_content_defined
ORACLES["chunk_content_defined"] = _CDC_CHUNK_ORACLE


# ---------------------------------------------------------------------------
# Term-frequency drift between two corpus slices.  Distribution drift
# between crawls (or between a source and the blend) is a standard
# curation monitor; the usual KL/chi-square statistics divide floats,
# which can't be hash-checked across engines (round-2/3 lesson).  The
# exact-integer reformulation: rank terms by |n1*N2 - n2*N1| — the
# cross-multiplied difference of the two relative frequencies scaled by
# N1*N2 — which preserves the |p1 - p2| ordering exactly with 64-bit
# integer arithmetic (counts < 2^20, totals < 2^40 at any per-slice
# term mass this fixture or a 100 TB shard sees per executor; overflow
# would need n*N >= 2^63).
#
# Plan shape: one tokenize+groupBy per slice (map-side combinable),
# full-outer join on term, scalar totals via a single-row cross join
# (constant broadcast), TakeOrderedAndProject top-K — no window over
# the full vocabulary.

DRIFT_TOPK = 20


def corpus_term_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K drifting terms between even- and odd-doc_id slices."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(words(F.lower(F.col("text")))).alias("term")
    )
    c1 = (
        tok.filter(F.col("doc_id") % 2 == 0)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n1"))
    )
    c2 = (
        tok.filter(F.col("doc_id") % 2 == 1)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n2"))
    )
    both = (
        c1.join(c2, "term", "full_outer")
        .select(
            "term",
            F.coalesce("n1", F.lit(0)).alias("n1"),
            F.coalesce("n2", F.lit(0)).alias("n2"),
        )
    )
    totals = both.agg(
        F.sum("n1").alias("t1"), F.sum("n2").alias("t2")
    )
    scored = both.crossJoin(F.broadcast(totals)).select(
        "term",
        "n1",
        "n2",
        F.abs(F.col("n1") * F.col("t2") - F.col("n2") * F.col("t1")).alias(
            "drift_num"
        ),
    )
    return scored.orderBy(
        F.col("drift_num").desc(), F.col("term").asc()
    ).limit(DRIFT_TOPK)


_DRIFT_ORACLE = f"""
WITH tok AS (
  SELECT doc_id,
         unnest({WORDS_SQL.replace("trim(text)", "trim(lower(text))")}) AS term
  FROM documents),
c1 AS (SELECT term, count(*) AS n1 FROM tok WHERE doc_id % 2 = 0 GROUP BY 1),
c2 AS (SELECT term, count(*) AS n2 FROM tok WHERE doc_id % 2 = 1 GROUP BY 1),
both_sides AS (
  SELECT coalesce(c1.term, c2.term) AS term,
         CAST(coalesce(n1, 0) AS BIGINT) AS n1,
         CAST(coalesce(n2, 0) AS BIGINT) AS n2
  FROM c1 FULL OUTER JOIN c2 ON c1.term = c2.term),
tot AS (SELECT CAST(sum(n1) AS BIGINT) AS t1, CAST(sum(n2) AS BIGINT) AS t2
        FROM both_sides)
SELECT term, n1, n2,
       CAST(abs(n1 * t2 - n2 * t1) AS BIGINT) AS drift_num
FROM both_sides CROSS JOIN tot
ORDER BY drift_num DESC, term ASC
LIMIT {DRIFT_TOPK}
"""

QUERIES["corpus_term_drift"] = corpus_term_drift
ORACLES["corpus_term_drift"] = _DRIFT_ORACLE


# ---------------------------------------------------------------------------
# KMV (bottom-k / k-minimum-values) distinct sketch with SET OPERATIONS.
# HLL (sketch_hll_mergeable) answers |A| and |A∪B|, but |A∩B| via
# inclusion-exclusion is numerically unstable for small overlaps, and
# HLL registers can't be hash-checked across engines.  The KMV sketch
# (Bar-Yossef et al. 2002; Beyer et al. 2007 "distinct-value synopses")
# keeps the k smallest distinct hash values per set: a uniform sample
# of the hash space that is (a) MERGEABLE — bottom-k of the union of
# two sketches IS the union's sketch, (b) a direct Jaccard estimator —
# the match fraction within the union's bottom-k, no inclusion-
# exclusion, and (c) fully deterministic given the hash, so both
# engines compute bit-identical sketches and the gate hash-checks an
# ESTIMATOR, not just an exact rewrite.
#
# Estimator: with h uniform on [0, 2^60), the kth smallest of n
# distinct values ≈ k/n · 2^60, so n̂ = (k-1)·2^60 / h_k (the unbiased
# form).  (k-1)·2^60 = 127·2^60 overflows int64, so the one division
# runs in IEEE double — a single deterministic rounding per row,
# identical across engines (the round-2 float-portability rule: bare
# single IEEE ops are portable; compositions are not).
#
# Scale shape: the per-source bottom-k runs as a rank-limit window —
# Spark's InferWindowGroupLimit turns rn <= k into a map-side per-
# partition top-k BEFORE the shuffle, so the exchange carries at most
# k rows per partition per source, never the distinct-hash relation.
# Everything after operates on S·k sketch rows (S = #sources): the
# pair enumeration is S², bounded by the source DIMENSION like
# corpus_overlap_matrix, never by docs.  This is the sketch-tier
# answer to corpus_overlap_matrix's exact-tier join: the exact op
# shuffles the full distinct (source, shingle-hash) relation; at
# 100 TB you run THIS first and reserve the exact join for the pairs
# the sketch flags.

KMV_K = 128


def _kmv_est(n_k, kth):
    """n̂ as a Column: exact count below k, (k-1)·2^60/h_k at k."""
    return F.when(n_k < KMV_K, n_k).otherwise(
        F.floor(F.lit(float((KMV_K - 1) * (1 << 60))) / kth.cast("double")).cast(
            "long"
        )
    )


def kmv_sketch(df: DataFrame, set_col: str, hash_col) -> DataFrame:
    """Bottom-``KMV_K`` distinct hashes per ``set_col`` value.

    The rank-limit window compiles to WindowGroupLimit (map-side
    per-partition bottom-k), so the shuffle is O(k) per input
    partition per set — constant-size sketch state, the mergeable-
    summary contract."""
    hs = df.select(set_col, hash_col.alias("h")).distinct()
    w = Window.partitionBy(set_col).orderBy("h")
    return (
        hs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .drop("rn")
    )


def sketch_kmv_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per source pair: KMV estimates of |A|, |B|, |A∪B| and the
    bottom-k Jaccard match statistics over 3-word shingle sets."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "source", F.explode(word_shingles(F.col("text"))).alias("shingle")
    )
    sk = kmv_sketch(sh, "source", hash60(F.col("shingle"))).persist()

    per_src = sk.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_k"), F.max("h").alias("kth")
    )
    per_src = per_src.select(
        "source", _kmv_est(F.col("n_k"), F.col("kth")).alias("est_distinct")
    )

    srcs = sk.select("source").distinct()
    # S² pair enumeration over the source dimension (tiny by definition;
    # same bound as corpus_overlap_matrix) — BNLJ on the non-equi "<" is
    # the declared plan here, allowlisted in the bench join audit.
    pairs = (
        srcs.alias("a")
        .join(F.broadcast(srcs.alias("b")), F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
    )
    side_a = pairs.join(
        sk.select(F.col("source").alias("src_a"), "h"), "src_a"
    ).select(
        "src_a", "src_b", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b")
    )
    side_b = pairs.join(
        sk.select(F.col("source").alias("src_b"), "h"), "src_b"
    ).select(
        "src_a", "src_b", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
    )
    union_rows = (
        side_a.unionByName(side_b)
        .groupBy("src_a", "src_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    # merge step: bottom-k of the union of the two sketches (h is unique
    # within a pair after the groupBy, so the rank order is total).
    wu = Window.partitionBy("src_a", "src_b").orderBy("h")
    union_k = (
        union_rows.withColumn("rn", F.row_number().over(wu))
        .filter(F.col("rn") <= KMV_K)
    )
    pair_agg = union_k.groupBy("src_a", "src_b").agg(
        F.count(F.lit(1)).alias("n_k"),
        F.max("h").alias("kth"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("kmv_matches"),
    )
    ea = per_src.select(
        F.col("source").alias("src_a"), F.col("est_distinct").alias("est_a")
    )
    eb = per_src.select(
        F.col("source").alias("src_b"), F.col("est_distinct").alias("est_b")
    )
    out = (
        pair_agg.join(F.broadcast(ea), "src_a")
        .join(F.broadcast(eb), "src_b")
        .select(
            "src_a",
            "src_b",
            _kmv_est(F.col("n_k"), F.col("kth")).alias("est_union"),
            F.col("kmv_matches").cast("long").alias("kmv_matches"),
            F.expr("CAST((1000 * kmv_matches) DIV n_k AS BIGINT)").alias(
                "jaccard_pm"
            ),
            "est_a",
            "est_b",
        )
    )
    # materialize the S²-bounded pair result to a file-backed frame,
    # then release the sketch cache (the repo-wide materialize-then-
    # unpersist discipline) — persisting the result itself would trade
    # the big sketch cache for a smaller but session-lifetime leak
    import tempfile

    dest = gate_tmp("kmv_gate_") + "/out"
    try:
        out.write.parquet(dest)
    finally:
        sk.unpersist()
    return sk.sparkSession.read.parquet(dest)


_KMV_NUM = float((KMV_K - 1) * (1 << 60))

_KMV_EST_SQL = (
    "CASE WHEN {n} < " + str(KMV_K) + " THEN CAST({n} AS BIGINT) "
    "ELSE CAST(floor(" + repr(_KMV_NUM) + " / CAST({kth} AS DOUBLE)) AS BIGINT) END"
)

_KMV_ORACLE = f"""
WITH sh AS (
  SELECT source, unnest({SHINGLES_SQL.format(w=WORDS_SQL)}) AS shingle
  FROM documents),
ss AS (SELECT DISTINCT source,
              {HASH60_SQL.format(x='shingle')} AS h
       FROM sh),
sk AS (
  SELECT source, h FROM (
    SELECT source, h,
           row_number() OVER (PARTITION BY source ORDER BY h) AS rn
    FROM ss) WHERE rn <= {KMV_K}),
per_src AS (
  SELECT source,
         {_KMV_EST_SQL.format(n='count(*)', kth='max(h)')} AS est_distinct
  FROM sk GROUP BY source),
pairs AS (
  SELECT a.source AS src_a, b.source AS src_b
  FROM (SELECT DISTINCT source FROM sk) a,
       (SELECT DISTINCT source FROM sk) b
  WHERE a.source < b.source),
union_rows AS (
  SELECT src_a, src_b, h, max(in_a) AS in_a, max(in_b) AS in_b FROM (
    SELECT p.src_a, p.src_b, s.h, 1 AS in_a, 0 AS in_b
    FROM pairs p JOIN sk s ON s.source = p.src_a
    UNION ALL
    SELECT p.src_a, p.src_b, s.h, 0 AS in_a, 1 AS in_b
    FROM pairs p JOIN sk s ON s.source = p.src_b)
  GROUP BY 1, 2, 3),
union_k AS (
  SELECT * FROM (
    SELECT union_rows.*,
           row_number() OVER (PARTITION BY src_a, src_b ORDER BY h) AS rn
    FROM union_rows) WHERE rn <= {KMV_K}),
pa AS (
  SELECT src_a, src_b, count(*) AS n_k, max(h) AS kth,
         CAST(sum(in_a * in_b) AS BIGINT) AS kmv_matches
  FROM union_k GROUP BY 1, 2)
SELECT pa.src_a, pa.src_b,
       {_KMV_EST_SQL.format(n='n_k', kth='kth')} AS est_union,
       kmv_matches,
       CAST((1000 * kmv_matches) // n_k AS BIGINT) AS jaccard_pm,
       ea.est_distinct AS est_a,
       eb.est_distinct AS est_b
FROM pa
JOIN per_src ea ON ea.source = pa.src_a
JOIN per_src eb ON eb.source = pa.src_b
"""

QUERIES["sketch_kmv_source_overlap"] = sketch_kmv_source_overlap
ORACLES["sketch_kmv_source_overlap"] = _KMV_ORACLE
