"""Byte-pair-encoding tokenizer: distributed merge training + Arrow-
batched application.

Real training-data pipelines tokenize with a learned BPE vocabulary;
the two halves map onto Spark cleanly:

* **Training** (``train_bpe_merges``) iterates the classic algorithm —
  count adjacent symbol pairs, merge the most frequent — but counts
  pairs over the WORD-FREQUENCY table, not the corpus: ``groupBy(word)``
  is map-side combinable, and every subsequent iteration touches only
  |vocab| rows weighted by frequency (the standard efficiency trick,
  cf. the original Sennrich et al. 2016 implementation).  Each
  iteration is one small Spark job: pair explode → weighted count →
  argmax (a single-row driver collect — the only driver traffic is one
  (pair, count) row per merge).  The merge itself is a row-local
  ``aggregate`` fold (leftmost non-overlapping, all occurrences), so
  the vocab table never leaves the executors.
* **Application** (``apply_bpe``) broadcasts the learned merge ranks
  into an Arrow-batched ``mapInPandas`` kernel with a per-batch word
  memo — the realistic shape for tokenizing 100 TB: Python cost is per
  DISTINCT word per batch, not per occurrence, and nothing row-trips
  through pickle.

The gate query is rows-only by design (iterative training is not
SQL-expressible); invariants (round-trip decode, monotone compression,
determinism, a hand-computed classic example) are pytest-asserted.

No reference analog (qin-cdc has no text surface); north-star §2.C.
"""

from __future__ import annotations

from typing import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from qin_cdc_spark.functions.text import words
from qin_cdc_spark.sources.tables import load_table

EOW = "</w>"  # end-of-word marker, the classic BPE word terminator


def _symbols_col(word: F.Column) -> F.Column:
    """word → array of single chars + EOW."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)), lambda i: F.substring(word, i, 1)
    )
    return F.concat(chars, F.array(F.lit(EOW)))


def _merge_fold(symbols: F.Column, a: str, b: str) -> F.Column:
    """Row-local merge of every leftmost non-overlapping (a, b) pair."""
    ab = a + b
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(ab))),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def vocab_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) — the distinct-word frequency table training runs on."""
    return (
        docs.select(F.explode(words(F.lower(F.col(text_col)))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def train_bpe_merges(
    vocab: DataFrame, n_merges: int, *, min_pair_freq: int = 2
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` merge rules from a (word, freq) table.

    Deterministic: argmax ties break on (pair_a, pair_b) ascending.
    Stops early when no pair reaches ``min_pair_freq``.
    """
    # localCheckpoint (not persist): each iteration's fold would otherwise
    # chain onto the previous plan — analysis cost grows per merge and
    # deep nesting eventually overflows the planner.  Checkpointing
    # truncates lineage so every iteration plans against a flat scan.
    cur = vocab.select(
        "freq", _symbols_col(F.col("word")).alias("syms")
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        n = F.size("syms")
        pairs = F.zip_with(
            F.slice(F.col("syms"), 1, n - 1),
            F.slice(F.col("syms"), 2, n - 1),
            lambda x, y: F.struct(x.alias("a"), y.alias("b")),
        )
        top = (
            cur.filter(n >= 2)
            .select("freq", F.explode(pairs).alias("p"))
            .groupBy("p")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("p.a").asc(), F.col("p.b").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_pair_freq:
            break
        a, b = top[0]["p"]["a"], top[0]["p"]["b"]
        merges.append((a, b))
        cur = cur.select(
            "freq", _merge_fold(F.col("syms"), a, b).alias("syms")
        ).localCheckpoint(eager=True)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE encode of one word (lowest-rank pair first, all
    occurrences per pass) — the standard algorithm."""
    syms = list(word) + [EOW]
    while len(syms) >= 2:
        best_rank, best = None, None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, p
        if best is None:
            break
        a, b = best
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def apply_bpe(
    docs: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """Append ``n_words`` / ``n_bpe_tokens`` via an Arrow-batched kernel.

    The merge table rides the closure (broadcast once per executor);
    per-batch memoization makes the Python cost proportional to
    DISTINCT words in the batch, not occurrences.
    """
    ranks = {p: i for i, p in enumerate(merges)}
    fields = docs.schema.fieldNames()
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in docs.schema.fields
    )
    out_schema += ", n_words long, n_bpe_tokens long"

    def kernel(batches: Iterator) -> Iterator:
        memo: dict[str, int] = {}

        def count_tokens(text: str) -> tuple[int, int]:
            ws = [w for w in text.lower().strip().split() if w]
            total = 0
            for w in ws:
                hit = memo.get(w)
                if hit is None:
                    hit = len(encode_word(w, ranks))
                    memo[w] = hit
                total += hit
            return len(ws), total

        for pdf in batches:
            counts = pdf[text_col].map(count_tokens)
            pdf = pdf.assign(
                n_words=[c[0] for c in counts], n_bpe_tokens=[c[1] for c in counts]
            )
            yield pdf[fields + ["n_words", "n_bpe_tokens"]]

    return docs.mapInPandas(kernel, schema=out_schema)


N_MERGES = 30


def tokenize_bpe_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc tokenization under merges learned from the same corpus
    slice, as an ORACLE-CHECKED contract: the word count is exact and
    SQL-recomputable (the one quantity BPE shares with SQL), and the
    BPE token count must sit in its provable sandwich — at least one
    token per word (merges only ever shrink a word's symbol sequence)
    and at most chars+1 per word (the untrained ceiling: every char a
    token plus the end-of-word marker).  A bug anywhere in training or
    the Arrow kernel (dropped EOW, over-merging across word borders,
    mis-memoization) breaks a bound; the exact learned-merge behavior
    (round-trip decode, monotone compression, the hand-computed classic
    example) stays pytest-asserted — iterative training itself is not
    SQL-expressible, but its invariants are."""
    docs = load_table(spark, sf_dir, "documents")
    merges = train_bpe_merges(vocab_table(docs), N_MERGES)
    out = apply_bpe(
        docs.repartition(docs.sparkSession.sparkContext.defaultParallelism), merges
    )
    w = words(F.lower(F.col("text")))
    chars_plus_eow = F.aggregate(
        F.transform(w, lambda x: F.length(x) + 1), F.lit(0), lambda a, v: a + v
    )
    return out.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        (F.col("n_bpe_tokens") >= F.col("n_words")).alias("bpe_ge_words"),
        (F.col("n_bpe_tokens") <= chars_plus_eow).alias("bpe_le_chars_eow"),
    )


TOKENIZE_BPE_ORACLE = """
SELECT doc_id,
       CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT)
         AS n_words,
       true AS bpe_ge_words,
       true AS bpe_le_chars_eow
FROM documents
"""

QUERIES = {"tokenize_bpe_counts": tokenize_bpe_counts}
ORACLES: dict = {"tokenize_bpe_counts": TOKENIZE_BPE_ORACLE}
