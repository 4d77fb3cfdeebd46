"""BPE tokenizer: training determinism, classic hand-computed merges,
round-trip decode, monotone compression, distributed==local agreement."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_SMOKE


def _toy_vocab(spark):
    # the classic Sennrich example shape: low/lower/lowest/newest/widest
    rows = [
        ("low", 5),
        ("lower", 2),
        ("newest", 6),
        ("widest", 3),
    ]
    return spark.createDataFrame(rows, "word string, freq long")


def test_training_matches_hand_computed_merges(spark):
    from qin_cdc_spark.operators.bpe import train_bpe_merges

    merges = train_bpe_merges(_toy_vocab(spark), 4)
    # counts: ('e','s') 6+3=9; ('s','t') 9; ('t','</w>') 9; ties break
    # lexicographically → ('e','s') first, then ('es','t'), then
    # ('est','</w>'), then ('l','o') 5+2=7
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", "</w>")
    assert merges[3] == ("l", "o")


def test_encode_round_trip_and_greedy(spark):
    from qin_cdc_spark.operators.bpe import EOW, encode_word, train_bpe_merges

    merges = train_bpe_merges(_toy_vocab(spark), 8)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ("newest", "lowest", "low", "widest", "unseen"):
        toks = encode_word(w, ranks)
        assert "".join(toks) == w + EOW  # lossless
    ranks3 = {p: i for i, p in enumerate(merges[:3])}
    assert encode_word("newest", ranks3) == ["n", "e", "w", "est" + EOW]


def test_more_merges_never_increase_token_count(spark):
    from qin_cdc_spark.operators.bpe import encode_word, train_bpe_merges, vocab_table
    from qin_cdc_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    vocab = vocab_table(docs)
    merges = train_bpe_merges(vocab, 20)
    sample = [r.word for r in vocab.limit(30).collect()]
    for k in range(0, len(merges), 5):
        ranks_k = {p: i for i, p in enumerate(merges[:k])}
        ranks_k1 = {p: i for i, p in enumerate(merges[: k + 5])}
        for w in sample:
            assert len(encode_word(w, ranks_k1)) <= len(encode_word(w, ranks_k))


def test_distributed_apply_matches_local_encode(spark):
    from qin_cdc_spark.operators.bpe import (
        apply_bpe,
        encode_word,
        train_bpe_merges,
        vocab_table,
    )
    from qin_cdc_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents").limit(40)
    merges = train_bpe_merges(vocab_table(docs), 15)
    ranks = {p: i for i, p in enumerate(merges)}
    out = {r.doc_id: r for r in apply_bpe(docs, merges).collect()}
    for r in docs.select("doc_id", "text").collect():
        ws = [w for w in r.text.lower().strip().split() if w]
        expect = sum(len(encode_word(w, ranks)) for w in ws)
        assert out[r.doc_id].n_bpe_tokens == expect
        assert out[r.doc_id].n_words == len(ws)


def test_gate_query_is_deterministic(spark):
    from qin_cdc_spark.operators.bpe import tokenize_bpe_counts

    a = {tuple(r) for r in tokenize_bpe_counts(spark, SF_SMOKE).collect()}
    b = {tuple(r) for r in tokenize_bpe_counts(spark, SF_SMOKE).collect()}
    assert a == b and a
    # the contract columns hold for every doc (the oracle asserts the
    # same over DuckDB; this is the standalone leg)
    out = tokenize_bpe_counts(spark, SF_SMOKE).collect()
    assert all(r.bpe_ge_words and r.bpe_le_chars_eow for r in out)
    assert all(r.n_words >= 0 for r in out)
