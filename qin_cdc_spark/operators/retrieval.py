"""Retrieval + sketch-membership operators (north star, SURVEY §2.C
continued): Okapi BM25 ranked retrieval over the corpus, and a
Bloom-filter membership sketch used as a decontamination prefilter.

Reference parity: qin-cdc has none of these (it is a CDC pipeline);
they extend the BASELINE-mandated training-data surface — BM25 is the
standard hard-negative / retrieval-scoring primitive in data curation,
and the Bloom sketch is the constant-size alternative to broadcasting
a full benchmark shingle set.

Scale design
------------
* BM25: one explode + early term filter (query terms only survive the
  map side), two hash aggs, broadcast-scalar corpus stats, and a
  TakeOrderedAndProject for the top-K — no global window over the
  corpus, no second corpus scan (df is derived from tf).
* Bloom: the sketch is a WORD-INDEXED BITSET TABLE (word_idx → int64 of
  32 used bits) built with a `bit_or` hash agg — associative, partial-
  aggregatable, mergeable across corpus shards, and ~M/32 rows
  regardless of how many items were inserted.  Probes join the
  broadcast bitset on word_idx; a shingle is a candidate only when all
  K probe bits are set.  At 100 TB the train side streams through a
  constant-size broadcast instead of a broadcast of the full benchmark
  shingle set, and only bloom-passed candidates reach the exact
  confirmation join.  All hashing is the repo's md5-based hash60, so
  the DuckDB oracle reproduces the sketch BIT-FOR-BIT — false positives
  included — making even the probabilistic path hash-checkable.
"""

from __future__ import annotations

from qin_cdc_spark.testing import gate_tmp

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from qin_cdc_spark.functions.text import hash60, word_shingles, words
from qin_cdc_spark.operators.llm_text import HASH60_SQL, WORDS_SQL
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
# Okapi BM25 top-K retrieval.  Lucene-style idf (ln(1 + (N-df+.5)/(df+.5)),
# always positive); k1/b at their textbook defaults.  Scores are rounded
# per-term AND post-sum to 6 dp so JVM/libm ULP skew cannot flip ranks.
# ---------------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ("spark", "window", "merge")
BM25_TOPK = 50


@_q("text_bm25_topk")
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank the corpus against a fixed query with Okapi BM25; return the
    top-K docs with their rank.

    Plan shape: explode → filter to query terms (map-side, so only
    |Q|·N rows ever shuffle) → tf hash agg → df derived FROM tf (no
    second corpus scan) → broadcast df + broadcast (N, avgdl) scalars →
    per-doc sum → orderBy+limit (TakeOrderedAndProject, no global
    window) → row_number over the K survivors only."""
    docs = load_table(spark, sf_dir, "documents")
    dl_col = F.size(words(F.lower(F.col("text"))))
    stats = docs.select(dl_col.alias("dl")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    # dl rides along through the explode so tf never needs a corpus-sized
    # doc_id join back to a doc-length table — max() re-derives it for free
    # inside the tf agg (dl is functionally dependent on doc_id).
    tok = docs.select(
        "doc_id",
        dl_col.alias("dl"),
        F.explode(words(F.lower(F.col("text")))).alias("term"),
    ).filter(F.col("term").isin(*BM25_QUERY))
    tf = tok.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl")
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(F.broadcast(df), "term").join(F.broadcast(stats))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(BM25_K1) * (
        F.lit(1.0 - BM25_B)
        + F.lit(BM25_B) * F.col("dl").cast("double") / F.col("avgdl")
    )
    term_score = F.round(idf * F.col("tf") * F.lit(BM25_K1 + 1.0) / denom, 6)
    per_doc = (
        scored.withColumn("ts", term_score)
        .groupBy("doc_id")
        .agg(F.round(F.sum("ts"), 6).alias("bm25_r"))
        .orderBy(F.col("bm25_r").desc(), F.col("doc_id").asc())
        .limit(BM25_TOPK)
    )
    w = Window.orderBy(F.col("bm25_r").desc(), F.col("doc_id").asc())
    return per_doc.withColumn("rk", F.row_number().over(w)).select(
        "doc_id", "bm25_r", "rk"
    )


_Q_LIST = ", ".join(f"'{t}'" for t in BM25_QUERY)

BM25_ORACLE = f"""
WITH dl AS (
  SELECT doc_id, CAST(len({WORDS_SQL.replace("trim(text)", "trim(lower(text))")})
                      AS BIGINT) AS dl
  FROM documents
),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tok AS (
  SELECT doc_id,
         unnest({WORDS_SQL.replace("trim(text)", "trim(lower(text))")}) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
       WHERE term IN ({_Q_LIST}) GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
               * tf * {BM25_K1 + 1.0}
               / (tf + {BM25_K1} * ({1.0 - BM25_B}
                                    + {BM25_B} * CAST(dl.dl AS DOUBLE) / avgdl)),
               6) AS ts
  FROM tf JOIN df USING (term) CROSS JOIN stats JOIN dl ON tf.doc_id = dl.doc_id
),
per_doc AS (
  SELECT doc_id, round(sum(ts), 6) AS bm25_r FROM scored GROUP BY 1
)
SELECT doc_id, bm25_r, rk FROM (
  SELECT doc_id, bm25_r,
         CAST(row_number() OVER (ORDER BY bm25_r DESC, doc_id ASC) AS INTEGER) AS rk
  FROM per_doc)
WHERE rk <= {BM25_TOPK}
"""

ORACLES["text_bm25_topk"] = BM25_ORACLE


# ---------------------------------------------------------------------------
# Bloom-filter decontamination.  Benchmark set: doc_id % 89 == 0, 4-word
# shingles (deliberately distinct from decontaminate_ngram's %97 / 3-gram
# so the two queries exercise different data).  M = 2^17 bits stored as
# 4096 × 32-bit words in int64 columns (bit 31 max → no sign games in
# either engine); K = 3 probes per shingle.
# ---------------------------------------------------------------------------

BLOOM_M = 1 << 17  # bits
BLOOM_WORDS = BLOOM_M // 32
BLOOM_K = 3
BLOOM_BENCH_MOD = 89
BLOOM_SHINGLE_K = 4


def _probe(shingle: Column, i: int) -> Column:
    """i-th probe position in [0, BLOOM_M) — md5-derived, engine-portable."""
    return F.pmod(
        hash60(F.concat(F.lit(f"bloom{i}:"), shingle)), F.lit(BLOOM_M)
    )


@_q("decontaminate_bloom")
def decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per train doc: #shingles passing the benchmark Bloom sketch
    (candidates, FPs included) and #confirmed by the exact set.

    The sketch build is a bit_or hash agg over probe words — mergeable,
    partial-aggregated map-side, ≤ BLOOM_WORDS rows out.  Probes join
    the broadcast sketch; only all-K-bits-set shingles reach the exact
    confirmation join, which is the production prefilter shape: the
    constant ~0.5 MB bitset does the mass rejection, the exact set only
    sees survivors."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        F.explode(word_shingles(F.col("text"), k=BLOOM_SHINGLE_K)).alias("shingle"),
    )
    bench_sh = (
        sh.filter(F.col("doc_id") % BLOOM_BENCH_MOD == 0)
        .select("shingle")
        .distinct()
    )
    probes = F.array(*[_probe(F.col("shingle"), i) for i in range(BLOOM_K)])
    bloom = (
        bench_sh.select(F.explode(probes).alias("pos"))
        .select(
            F.shiftright(F.col("pos"), 5).alias("word_idx"),
            F.expr("shiftleft(1L, CAST(pos % 32 AS INT))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )
    train = sh.filter(F.col("doc_id") % BLOOM_BENCH_MOD != 0).distinct()
    probe_rows = train.select(
        "doc_id", "shingle", F.explode(probes).alias("pos")
    ).select(
        "doc_id",
        "shingle",
        F.shiftright(F.col("pos"), 5).alias("word_idx"),
        F.expr("shiftleft(1L, CAST(pos % 32 AS INT))").alias("mask"),
    )
    hits = (
        probe_rows.join(F.broadcast(bloom), "word_idx", "left")
        .withColumn(
            "hit",
            F.when(
                F.col("bits").isNotNull()
                & (F.col("bits").bitwiseAND(F.col("mask")) != 0),
                1,
            ).otherwise(0),
        )
        .groupBy("doc_id", "shingle")
        .agg(F.sum("hit").alias("n_bits"))
        .filter(F.col("n_bits") == BLOOM_K)
    )
    confirmed = hits.join(
        F.broadcast(bench_sh.withColumn("conf", F.lit(1))), "shingle", "left"
    )
    return confirmed.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum(F.coalesce(F.col("conf"), F.lit(0))).alias("n_confirmed"),
    )


_SHINGLES4_SQL = (
    "list_distinct(list_transform("
    "range(1, greatest(1, len({w}) - 3) + 1), "
    "i -> array_to_string(({w})[i:i+3], ' ')))"
)

_POS_SQL = (
    "CAST(" + HASH60_SQL.format(x="concat('bloom', i, ':', shingle)") + " % {m}"
    " AS BIGINT)"
).format(m=BLOOM_M)

BLOOM_ORACLE = f"""
WITH sh0 AS (
  SELECT doc_id, {_SHINGLES4_SQL.format(w=WORDS_SQL)} AS shingles FROM documents
),
sh AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh0),
bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {BLOOM_BENCH_MOD} = 0),
bench_pos AS (
  SELECT {_POS_SQL} AS pos
  FROM bench CROSS JOIN (SELECT unnest([0, 1, 2]) AS i)
),
bloom AS (
  SELECT pos // 32 AS word_idx,
         bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INTEGER)) AS bits
  FROM bench_pos GROUP BY 1
),
train AS (
  SELECT DISTINCT doc_id, shingle FROM sh WHERE doc_id % {BLOOM_BENCH_MOD} <> 0
),
probe AS (
  SELECT doc_id, shingle, {_POS_SQL} AS pos
  FROM train CROSS JOIN (SELECT unnest([0, 1, 2]) AS i)
),
hits AS (
  SELECT p.doc_id, p.shingle,
         sum(CASE WHEN b.bits IS NOT NULL
                   AND (b.bits & (CAST(1 AS BIGINT) << CAST(p.pos % 32 AS INTEGER)))
                       <> 0
                  THEN 1 ELSE 0 END) AS n_bits
  FROM probe p LEFT JOIN bloom b ON p.pos // 32 = b.word_idx
  GROUP BY 1, 2
),
cand AS (SELECT doc_id, shingle FROM hits WHERE n_bits = {BLOOM_K})
SELECT c.doc_id AS doc_id,
       count(*) AS n_candidates,
       CAST(sum(CASE WHEN be.shingle IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_confirmed
FROM cand c LEFT JOIN bench be ON c.shingle = be.shingle
GROUP BY 1
"""

ORACLES["decontaminate_bloom"] = BLOOM_ORACLE


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters — the third mergeable sketch in the
# family (HLL cardinality, Bloom membership, CMS frequency).  D=3 hash
# rows × W=1024 buckets of int64 counters built with one (d, pos) sum
# agg — associative, partial-aggregated map-side, mergeable across
# corpus shards, ≤ D·W rows regardless of stream length.  Estimates
# read the sketch with min-over-rows; CMS guarantees est ≥ true, and
# both the sketch and its collisions are md5-deterministic, so the
# DuckDB oracle reproduces every counter exactly.
# ---------------------------------------------------------------------------

CMS_D = 3
CMS_W = 1024
CMS_TOPK = 10


@_q("sketch_countmin_topk")
def sketch_countmin_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K terms by CMS-estimated frequency, with the exact count
    alongside (est >= exact always; equality unless a bucket collided).

    At 100 TB the sketch replaces a full-vocabulary count when only
    heavy hitters matter: the counter table is constant-size, candidate
    terms come from any cheap source (here the corpus's distinct terms),
    and the estimate join touches D rows per candidate."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(words(F.lower(F.col("text")))).alias("term")
    )
    probes = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                F.pmod(
                    hash60(F.concat(F.lit(f"cms{d}:"), F.col("term"))), F.lit(CMS_W)
                ).alias("pos"),
            )
            for d in range(CMS_D)
        ]
    )
    sketch = (
        tok.select(F.explode(probes).alias("p"))
        .groupBy(F.col("p.d").alias("d"), F.col("p.pos").alias("pos"))
        .agg(F.count(F.lit(1)).alias("counter"))
    )
    exact = tok.groupBy("term").agg(F.count(F.lit(1)).alias("true_count"))
    est = (
        exact.select("term", "true_count", F.explode(probes).alias("p"))
        .join(
            F.broadcast(sketch),
            (F.col("p.d") == F.col("d")) & (F.col("p.pos") == F.col("pos")),
        )
        .groupBy("term", "true_count")
        .agg(F.min("counter").alias("est_count"))
    )
    w = Window.orderBy(F.col("est_count").desc(), F.col("term").asc())
    return (
        est.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= CMS_TOPK)
        .select("term", "est_count", "true_count", "rk")
    )


_CMS_POS = "CAST({h} % {w} AS BIGINT)".format(
    h=HASH60_SQL.format(x="concat('cms', d, ':', term)"), w=CMS_W
)

CMS_ORACLE = f"""
WITH tok AS (
  SELECT doc_id,
         unnest({WORDS_SQL.replace("trim(text)", "trim(lower(text))")}) AS term
  FROM documents
),
probes AS (
  SELECT term, d, {_CMS_POS} AS pos
  FROM tok CROSS JOIN (SELECT unnest([0, 1, 2]) AS d)
),
sketch AS (SELECT d, pos, count(*) AS counter FROM probes GROUP BY 1, 2),
exact AS (SELECT term, count(*) AS true_count FROM tok GROUP BY 1),
cand AS (
  SELECT term, d, {_CMS_POS} AS pos
  FROM exact CROSS JOIN (SELECT unnest([0, 1, 2]) AS d)
),
est AS (
  SELECT c.term, min(s.counter) AS est_count
  FROM cand c JOIN sketch s ON c.d = s.d AND c.pos = s.pos
  GROUP BY 1
)
SELECT term, est_count, true_count, rk FROM (
  SELECT e.term, e.est_count, x.true_count,
         CAST(row_number() OVER (ORDER BY e.est_count DESC, e.term ASC)
              AS INTEGER) AS rk
  FROM est e JOIN exact x ON e.term = x.term)
WHERE rk <= {CMS_TOPK}
"""

ORACLES["sketch_countmin_topk"] = CMS_ORACLE


# ---------------------------------------------------------------------------
# BM25 over the INCREMENTALLY MAINTAINED index (streaming/text_index.py):
# the corpus mutates through a CDC stream (updates append query terms,
# deletes remove docs), the posting lists follow via the CDF — and the
# indexed search must hash-equal a from-scratch BM25 over the final
# corpus.  avgdl is sum_dl/n_docs from exact integers on both sides.
# ---------------------------------------------------------------------------

_LW = WORDS_SQL.replace("trim(text)", "trim(lower(text))")

from qin_cdc_spark.cdc.changestream import DOCUMENTS_STREAM_SQL  # noqa: E402

TEXT_BM25_INDEXED_ORACLE = f"""
WITH {DOCUMENTS_STREAM_SQL.strip().lstrip()},
lastd AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY seq DESC) AS rn
  FROM dev
),
corpus AS (SELECT doc_id, text FROM lastd WHERE rn = 1 AND op <> 'delete'),
dl AS (SELECT doc_id, CAST(len({_LW}) AS BIGINT) AS dl FROM corpus),
stats AS (SELECT count(*) AS n_docs,
                 CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
          FROM dl),
tok AS (SELECT doc_id, unnest({_LW}) AS term FROM corpus),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
       WHERE term IN ({_Q_LIST}) GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
               * tf * {BM25_K1 + 1.0}
               / (tf + {BM25_K1} * ({1.0 - BM25_B}
                                    + {BM25_B} * CAST(dl.dl AS DOUBLE) / avgdl)),
               6) AS ts
  FROM tf JOIN df USING (term) CROSS JOIN stats JOIN dl ON tf.doc_id = dl.doc_id
),
per_doc AS (
  SELECT doc_id, round(sum(ts), 6) AS bm25_r FROM scored GROUP BY 1
)
SELECT doc_id, bm25_r, rk FROM (
  SELECT doc_id, bm25_r,
         CAST(row_number() OVER (ORDER BY bm25_r DESC, doc_id ASC) AS INTEGER) AS rk
  FROM per_doc)
WHERE rk <= {BM25_TOPK}
"""


@_q("text_bm25_indexed", TEXT_BM25_INDEXED_ORACLE)
def text_bm25_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end maintained-index retrieval: the documents change
    stream lands once, applies to a versioned target in two batches
    (updates append the gate's query terms to some docs — postings AND
    lengths change — and deletes remove others), the BM25 index
    refreshes incrementally after each batch from the preimage CDF,
    and the INDEXED search must hash-equal a from-scratch BM25 over
    the final corpus (the oracle).  The search itself reads only the
    buckets the 3 query terms hash into — driver-side md5 pruning, no
    corpus scan anywhere in the maintained path."""
    import tempfile

    from qin_cdc_spark.cdc.changestream import documents_change_stream
    from qin_cdc_spark.streaming.text_index import IncrementalBm25Index
    from qin_cdc_spark.streaming.versioned import VersionedBucketedTable

    from qin_cdc_spark.cdc.queries import _landed_halfpoint, landed_stream

    base = gate_tmp("bm25idx_gate_")
    ev = landed_stream(
        spark, sf_dir, "documents",
        lambda: documents_change_stream(spark, sf_dir),
    )
    # memoized per landed artifact (OPTIMIZATION_r10 item 6's memo,
    # rolled out here in r11): the watermark is a property of the
    # deterministic landed file — re-scanning it per invocation was one
    # full-stream job of pure re-derivation
    s = _landed_halfpoint(ev, sf_dir, "documents")
    tbl = VersionedBucketedTable(spark, base + "/t", ["doc_id"], n_buckets=8)
    idx = IncrementalBm25Index(spark, base + "/idx")
    tbl.merge(ev.filter(F.col("seq") <= s), batch_id=0)
    idx.refresh(tbl)
    tbl.merge(ev.filter(F.col("seq") > s), batch_id=1)
    idx.refresh(tbl)
    return idx.search(list(BM25_QUERY), BM25_TOPK)
