"""Hybrid retrieval fusion + temperature apportionment semantics
(operators/fusion.py) — properties beyond what the DuckDB oracle
hash-check already proves."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from qin_cdc_spark.operators.fusion import (
    DENSE_TOPK,
    FUSED_TOPK,
    HN_TOPK,
    LEX_TOPK,
    MIX_BUDGET,
    RRF_K,
    RRF_SCALE,
    _dense_ranked,
    _lexical_ranked,
    mix_temperature_alloc,
    retrieval_hard_negatives,
    retrieval_rrf_fusion,
)

SF = "/root/testdata/sf0.001"


def test_rrf_matches_python_recompute(spark):
    """The fused ranking equals an independent Python recompute from the
    two source lists (same integer RRF formula, same tie-break)."""
    lex = {
        (r.query_id, r.cand_id): r.lex_rk
        for r in _lexical_ranked(spark, SF, LEX_TOPK).collect()
    }
    dense = {
        (r.query_id, r.cand_id): r.dense_rk
        for r in _dense_ranked(spark, SF, DENSE_TOPK).collect()
    }
    scores: dict = {}
    for (q, c), rk in lex.items():
        scores[(q, c)] = scores.get((q, c), 0) + RRF_SCALE // (RRF_K + rk)
    for (q, c), rk in dense.items():
        scores[(q, c)] = scores.get((q, c), 0) + RRF_SCALE // (RRF_K + rk)
    expected: dict = {}
    for q in {k[0] for k in scores}:
        cands = sorted(
            ((s, c) for (qq, c), s in scores.items() if qq == q),
            key=lambda t: (-t[0], t[1]),
        )[:FUSED_TOPK]
        for i, (s, c) in enumerate(cands, start=1):
            expected[(q, c)] = (s, i)

    got = retrieval_rrf_fusion(spark, SF).collect()
    assert len(got) == len(expected)
    for r in got:
        s, rk = expected[(r.query_id, r.cand_id)]
        assert (r.rrf_e9, r.fused_rk) == (s, rk)
        # rank provenance: a 0 rank means "absent from that list"
        assert (r.lex_rk > 0) == ((r.query_id, r.cand_id) in lex)
        assert (r.dense_rk > 0) == ((r.query_id, r.cand_id) in dense)


def test_rrf_both_lists_beat_single_list_at_equal_rank(spark):
    """A candidate in BOTH lists at rank r outranks one in a single list
    at the same r — the point of fusion (holds by construction of the
    integer score; asserted on the live output where instances exist)."""
    rows = retrieval_rrf_fusion(spark, SF).collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for rs in by_q.values():
        for a in rs:
            for b in rs:
                if (
                    a.lex_rk > 0
                    and a.dense_rk > 0
                    and b.lex_rk == 0
                    and b.dense_rk >= max(a.lex_rk, a.dense_rk)
                ):
                    assert a.rrf_e9 > b.rrf_e9


def test_hard_negatives_exclude_near_dups(spark):
    got = retrieval_hard_negatives(spark, SF)
    rows = got.collect()
    assert rows, "expected at least one hard negative on the fixture"
    for r in rows:
        # the integer Jaccard guard: 2·inter < union  ⇔  J < 0.5
        assert 2 * r.inter < r.union_sz
        assert 1 <= r.hn_rk <= HN_TOPK
        assert r.query_id != r.cand_id
    # ranked by overlap desc within each query
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for rs in by_q.values():
        rs.sort(key=lambda r: r.hn_rk)
        inters = [r.inter for r in rs]
        assert inters == sorted(inters, reverse=True)


def test_mix_temperature_alloc_exact_apportionment(spark):
    rows = mix_temperature_alloc(spark, SF).collect()
    assert sum(r.alloc for r in rows) == MIX_BUDGET
    total_w = sum(r.weight for r in rows)
    for r in rows:
        # within one unit of the real-valued quota (Hamilton guarantee)
        quota = MIX_BUDGET * r.weight / total_w
        assert abs(r.alloc - quota) < 1.0
        # α=0.5 weight definition
        assert r.weight == math.isqrt(r.n_tokens)


def test_mix_temperature_flattens_vs_proportional(spark):
    """sqrt weighting gives low-resource sources a larger share than
    token-proportional would — the reason temperature mixing exists."""
    rows = mix_temperature_alloc(spark, SF).collect()
    total_toks = sum(r.n_tokens for r in rows)
    smallest = min(rows, key=lambda r: r.n_tokens)
    largest = max(rows, key=lambda r: r.n_tokens)
    if smallest.n_tokens < largest.n_tokens:  # non-degenerate fixture
        assert smallest.alloc / MIX_BUDGET > smallest.n_tokens / total_toks
        assert largest.alloc / MIX_BUDGET < largest.n_tokens / total_toks
