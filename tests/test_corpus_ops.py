"""Semantic and plan-shape assertions for operators/corpus_ops.py
(value correctness is covered by the oracle gate sweep)."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_SMOKE


def test_substring_spans_detects_planted_duplicate(spark):
    """A 12-word run copied between two docs must surface as duplicated
    windows in the SECOND doc only (keep-first rule), merged into one
    span covering >= 12 words' worth of window starts."""
    from qin_cdc_spark.operators import corpus_ops
    from qin_cdc_spark.operators.corpus_ops import SUBSTR_W

    run = " ".join(f"tok{i}" for i in range(12))
    rows = [
        (1, f"alpha beta {run} gamma delta"),
        (2, f"unrelated prefix words here {run} trailing tail words"),
        (3, "totally different content with no duplication at all present here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # reuse the operator body by monkeypatching the loader
    import qin_cdc_spark.operators.corpus_ops as mod

    orig = mod.load_table
    mod.load_table = lambda s, d, n: docs
    try:
        out = {r.doc_id: r for r in mod.dedup_substring_spans(spark, "x").collect()}
    finally:
        mod.load_table = orig

    assert out[1].n_dup_windows == 0  # first occurrence is kept
    assert out[3].n_dup_windows == 0
    assert out[2].n_dup_windows == 12 - SUBSTR_W + 1  # all windows inside the run
    assert out[2].n_spans == 1
    assert out[2].dup_cover_words == 12  # span covers exactly the copied run


def test_substring_spans_short_docs_have_zero_windows(spark):
    from qin_cdc_spark.operators import corpus_ops

    docs = spark.createDataFrame(
        [(1, "only three words"), (2, "a b c d e f g h i")],
        "doc_id long, text string",
    )
    import qin_cdc_spark.operators.corpus_ops as mod

    orig = mod.load_table
    mod.load_table = lambda s, d, n: docs
    try:
        out = {r.doc_id: r for r in mod.dedup_substring_spans(spark, "x").collect()}
    finally:
        mod.load_table = orig
    assert out[1].n_windows == 0 and out[1].n_dup_windows == 0
    assert out[2].n_windows == 9 - corpus_ops.SUBSTR_W + 1


def test_hashed_linear_score_is_row_local(spark):
    """No Exchange may appear in the scoring plan — the operator's whole
    point is shuffle-free model inference."""
    from qin_cdc_spark.operators.corpus_ops import text_hashed_linear_score

    plan = text_hashed_linear_score(spark, SF_SMOKE)._jdf.queryExecution().optimizedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_hashed_linear_score_deterministic_and_bounded(spark):
    from qin_cdc_spark.operators.corpus_ops import text_hashed_linear_score

    a = {r.doc_id: r.score_milli for r in text_hashed_linear_score(spark, SF_SMOKE).collect()}
    b = {r.doc_id: r.score_milli for r in text_hashed_linear_score(spark, SF_SMOKE).collect()}
    assert a == b and a
    out = text_hashed_linear_score(spark, SF_SMOKE).collect()
    # |score| <= 1000 * n_feats (every per-feature weight is in [-1000, 1000])
    assert all(abs(r.score_milli) <= 1000 * r.n_feats for r in out)


def test_snapshot_diff_statuses_partition_the_id_space(spark):
    from qin_cdc_spark.operators.corpus_ops import corpus_snapshot_diff

    out = corpus_snapshot_diff(spark, SF_SMOKE).collect()
    by_status = {}
    for r in out:
        by_status.setdefault(r.status, set()).add(r.doc_id)
    # added docs are exactly v2-only ids (doc_id%10==9 minus the %10==1 drop)
    assert all(d % 10 == 9 for d in by_status.get("added", set()))
    assert all(d % 10 == 1 for d in by_status.get("removed", set()))
    assert all(d % 7 == 0 for d in by_status.get("changed", set()))
    # statuses are disjoint and cover every surviving id exactly once
    ids = [r.doc_id for r in out]
    assert len(ids) == len(set(ids))


def test_quantile_bins_bounds_true_percentiles(spark):
    """The sketch's upper bounds must dominate the exact percentile and
    stay within one bin width of it — the advertised error contract."""
    from qin_cdc_spark.operators.corpus_ops import QBIN_WIDTH, sketch_quantile_bins
    from qin_cdc_spark.sources.tables import load_table

    import math

    est = {r.source: r for r in sketch_quantile_bins(spark, SF_SMOKE).collect()}
    rows = load_table(spark, SF_SMOKE, "documents").select("source", "n_chars").collect()
    by_src: dict[str, list[int]] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r.n_chars)
    for src, vals in by_src.items():
        vals.sort()
        e = est[src]
        for p, ub in ((50, e.p50_chars_ub), (90, e.p90_chars_ub)):
            # the sketch bounds the ceil(p*n/100)-th order statistic:
            # ub is that value's bin upper edge
            v = vals[math.ceil(p * len(vals) / 100) - 1]
            assert v <= ub <= v + QBIN_WIDTH, (src, p, v, ub)


def test_quantile_bins_is_mergeable(spark):
    """Sketch(A ∪ B) == merge(Sketch(A), Sketch(B)) — the property that
    lets per-partition sketches combine without re-scanning."""
    from qin_cdc_spark.operators.corpus_ops import QBIN_WIDTH
    from qin_cdc_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    bins = (
        docs.groupBy("source", F.expr(f"n_chars div {QBIN_WIDTH}").alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    merged = (
        half_a.groupBy("source", F.expr(f"n_chars div {QBIN_WIDTH}").alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .unionByName(
            half_b.groupBy("source", F.expr(f"n_chars div {QBIN_WIDTH}").alias("bin"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        .groupBy("source", "bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    a = {(r.source, r.bin): r.cnt for r in bins.collect()}
    b = {(r.source, r.bin): r.cnt for r in merged.collect()}
    assert a == b


def test_cdc_chunks_survive_insertion(spark):
    """The content-defined property: inserting one word near the front
    must leave most chunk hashes intact (a fixed-width segmenter would
    shift every boundary and share ~nothing)."""
    import random

    from qin_cdc_spark.operators.corpus_ops import cdc_chunk_relation

    rng = random.Random(7)
    base_words = [f"w{rng.randrange(10_000)}" for _ in range(400)]
    edited = base_words[:5] + ["INSERTED"] + base_words[5:]
    docs = spark.createDataFrame(
        [(1, " ".join(base_words)), (2, " ".join(edited))],
        "doc_id long, text string",
    )
    chunks = cdc_chunk_relation(docs).collect()
    a = {r.ch for r in chunks if r.doc_id == 1}
    b = {r.ch for r in chunks if r.doc_id == 2}
    assert a and b
    shared = len(a & b) / max(len(a), len(b))
    assert shared >= 0.5, f"only {shared:.0%} of chunks survived the edit"


def test_cdc_chunks_partition_every_doc_exactly(spark):
    """Chunk word masses must sum to the doc's word count — chunking is
    a partition of the token stream, no loss, no overlap."""
    import pyspark.sql.functions as F

    from qin_cdc_spark.operators.corpus_ops import cdc_chunk_relation
    from qin_cdc_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    chunks = cdc_chunk_relation(docs)
    per_doc = chunks.groupBy("doc_id").agg(F.sum("chunk_words").alias("cw"))
    joined = docs.select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("nw")
    ).join(per_doc, "doc_id")
    bad = joined.filter(F.col("cw") != F.col("nw")).count()
    assert bad == 0


def test_term_drift_uses_topk_not_full_sort(spark):
    """Global top-K must compile to TakeOrderedAndProject, not a full
    sort of the vocabulary."""
    import contextlib
    import io

    from qin_cdc_spark.operators.corpus_ops import corpus_term_drift

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        corpus_term_drift(spark, SF_SMOKE).explain("formatted")
    assert "TakeOrderedAndProject" in buf.getvalue()


def test_ahash_finds_identical_and_edited_payloads(spark):
    """Identical payloads must pair at hamming 0; a small in-place edit
    must still pair within the hamming budget; unrelated payloads with
    different content must not flood the output."""
    import random

    from qin_cdc_spark.operators.multimodal import (
        AHASH_HAMMING_MAX,
        ahash_signatures,
        with_payload,
    )

    rng = random.Random(3)
    base = " ".join(f"w{rng.randrange(50)}" for _ in range(120))
    edited = "_".join(base.split(" ", 3)[:3]) + " " + base.split(" ", 3)[3]
    other = " ".join(f"z{rng.randrange(50, 99)}" for _ in range(150))
    docs = spark.createDataFrame(
        [(1, base, "en", "s", len(base)),
         (2, base, "en", "s", len(base)),        # identical copy
         (3, edited, "en", "s", len(edited)),     # small in-place edit
         (4, other, "en", "s", len(other))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sigs = ahash_signatures(with_payload(docs))
    bits = {r.doc_id: r.bits for r in sigs.collect()}
    ham = lambda a, b: sum(x != y for x, y in zip(bits[a], bits[b]))
    assert ham(1, 2) == 0
    assert ham(1, 3) <= AHASH_HAMMING_MAX
    sigs.unpersist()


def test_prefix_exact_jaccard_keeps_hot_shingle_pairs(spark):
    """Docs whose overlap consists ENTIRELY of corpus-hot shingles: a
    df-cut approximation (dedup_ngram_jaccard's declared trade-off)
    drops those shingles and misses the pair; the prefix-filtered EXACT
    join must report it — hot shingles sort to the END of the rarity
    order, out of the index, but the verify still counts them."""
    import qin_cdc_spark.operators.similarity as sim

    boiler = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(1, boiler + " alpha"), (2, boiler + " beta")]
    # 8 more docs that all carry the boilerplate (making its shingles
    # hot: df = 100%) plus enough unique text to stay under 0.5 with
    # everything else
    for i in range(3, 11):
        uniq = " ".join(f"unique{i}word{j}" for j in range(30))
        rows.append((i, boiler + " " + uniq))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    orig = sim.load_table
    sim.load_table = lambda s, d, n: docs
    try:
        out = {(r.doc_a, r.doc_b) for r in
               sim.dedup_jaccard_prefix_exact(spark, "x").collect()}
    finally:
        sim.load_table = orig
    assert (1, 2) in out  # the hot-overlap pair is found
    # docs 3..10 share only the boilerplate, diluted by 30 unique words
    assert all(a in (1, 2) and b in (1, 2) for a, b in out), out


def test_kmv_estimates_track_exact_counts(spark):
    """KMV distinct/union estimates must land within the sketch's
    statistical error (rel. stderr ≈ 1/√(k−2) ≈ 9% at k=128; assert a
    generous 35% to stay flake-free) — and be EXACT for any source
    whose distinct-shingle count is below k."""
    from qin_cdc_spark.functions.text import hash60, word_shingles
    from qin_cdc_spark.operators.corpus_ops import (
        KMV_K,
        sketch_kmv_source_overlap,
    )
    from qin_cdc_spark.sources.tables import load_table

    est = {
        (r.src_a, r.src_b): r
        for r in sketch_kmv_source_overlap(spark, SF_SMOKE).collect()
    }
    docs = load_table(spark, SF_SMOKE, "documents")
    hs = docs.select(
        "source", F.explode(word_shingles(F.col("text"))).alias("sh")
    ).select("source", hash60(F.col("sh")).alias("h")).distinct()
    exact = {
        r.source: r.n for r in hs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    checked_pairs = 0
    for (a, b), row in est.items():
        na, nb = exact[a], exact[b]
        if na < KMV_K:
            assert row.est_a == na, (a, row.est_a, na)
        else:
            assert abs(row.est_a - na) <= 0.35 * na, (a, row.est_a, na)
        if nb < KMV_K:
            assert row.est_b == nb, (b, row.est_b, nb)
        # union estimate: bounded by the same error vs the exact union
        # (exact union computed only for a few pairs to keep this fast)
        if checked_pairs < 5:
            nu = (
                hs.filter(F.col("source").isin([a, b]))
                .select("h")
                .distinct()
                .count()
            )
            if nu < KMV_K:
                assert row.est_union == nu
            else:
                assert abs(row.est_union - nu) <= 0.35 * nu, (a, b, row.est_union, nu)
            checked_pairs += 1
    assert checked_pairs > 0


def test_kmv_sketch_plan_uses_window_group_limit(spark):
    """The bottom-k rank filter must compile to WindowGroupLimit — the
    map-side per-partition top-k that keeps the shuffle O(k) per
    partition instead of carrying the full distinct-hash relation."""
    from qin_cdc_spark.functions.text import hash60, word_shingles
    from qin_cdc_spark.operators.corpus_ops import kmv_sketch
    from qin_cdc_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    sh = docs.select(
        "source", F.explode(word_shingles(F.col("text"))).alias("shingle")
    )
    sk = kmv_sketch(sh, "source", hash60(F.col("shingle")))
    plan = sk._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
