"""Plan-shape and semantic assertions for operators/curation.py
(value correctness is covered by the oracle gate sweep)."""

from __future__ import annotations

import contextlib
import io

import pyspark.sql.functions as F

from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_decontaminate_broadcasts_benchmark_side(spark):
    """The benchmark shingle set must broadcast: the train side (100 TB
    at scale) streams through with no shuffle for the join itself."""
    from qin_cdc_spark.operators.curation import decontaminate_ngram

    plan = _plan(decontaminate_ngram(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan, plan


def test_decontaminate_no_benchmark_doc_in_output(spark):
    from qin_cdc_spark.operators.curation import decontaminate_ngram

    out = decontaminate_ngram(spark, SF_SMOKE).collect()
    assert all(r.doc_id % 97 != 0 for r in out)
    assert all(r.n_contaminated >= 1 for r in out)


def test_source_cap_bounds_every_source(spark):
    from qin_cdc_spark.operators.curation import SOURCE_CAP, curation_source_cap

    counts = (
        curation_source_cap(spark, SF_SMOKE)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert counts and all(r.n <= SOURCE_CAP for r in counts)


def test_emb_quantize_roundtrip_error_bounded(spark):
    """Dequantized values must be within half a quantization step of the
    original — the invariant that makes int8 storage usable."""
    from qin_cdc_spark.operators.curation import emb_quantize_int8
    from qin_cdc_spark.sources.tables import load_table

    q = emb_quantize_int8(spark, SF_SMOKE).withColumn(
        "q", F.split("q_csv", ",").cast("array<int>")
    )
    emb = load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
    joined = q.join(emb, "vec_id")
    bad = joined.select(
        F.aggregate(
            F.zip_with(
                "embedding",
                "q",
                lambda x, qi: F.abs(x.cast("double") - qi * F.col("scale"))
                > F.col("scale") * 0.5 + 1e-12,
            ),
            F.lit(False),
            lambda acc, v: acc | v,
        ).alias("bad")
    ).filter(F.col("bad"))
    assert bad.count() == 0
    # int8 range respected
    rng = joined.select(
        F.array_max("q").alias("mx"), F.array_min("q").alias("mn")
    ).agg(F.max("mx").alias("mx"), F.min("mn").alias("mn")).first()
    assert rng.mx <= 127 and rng.mn >= -127


def test_knn_vote_query_side_broadcast(spark):
    from qin_cdc_spark.operators.curation import sim_knn_label_vote

    plan = _plan(sim_knn_label_vote(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_cluster_keep_best_rep_is_member(spark):
    from qin_cdc_spark.operators.curation import dedup_cluster_keep_best
    from qin_cdc_spark.operators.llm_ext import dedup_cluster_cc

    best = dedup_cluster_keep_best(spark, SF_SMOKE)
    members = dedup_cluster_cc(spark, SF_SMOKE)
    # every representative belongs to its own cluster
    dangling = best.join(
        members,
        (best.rep_doc_id == members.doc_id) & (best.component == members.component),
        "left_anti",
    )
    assert dangling.count() == 0


def test_hll_sketch_union_within_tolerance(spark):
    """Grouped sketches unioned == global estimate within 5% of exact."""
    import pyspark.sql.functions as F

    from qin_cdc_spark.operators.relational_ext import sketch_hll_mergeable
    from qin_cdc_spark.sources.tables import load_table

    row = sketch_hll_mergeable(spark, SF_SMOKE).first()
    exact = (
        load_table(spark, SF_SMOKE, "orders")
        .agg(F.count_distinct("o_custkey").alias("n"))
        .first()
        .n
    )
    assert row.exact_distinct_cust == exact
    assert row.est_within_5pct  # the query carries its own bound check


def test_semantic_clustered_dedup_recall_vs_global(spark):
    """Cluster-scoped pairs are a subset of the global brute-force pairs
    with usable recall (near-dups land in the same cluster)."""
    from qin_cdc_spark.operators.curation import (
        dedup_semantic_clustered,
        semantic_cluster_pairs,
    )
    from qin_cdc_spark.operators.similarity import dedup_embedding_cosine_bruteforce

    got = {
        (r.vec_a, r.vec_b)
        for r in semantic_cluster_pairs(spark, SF_SMOKE).collect()
    }
    want = {
        (min(r.vec_a, r.vec_b), max(r.vec_a, r.vec_b))
        for r in dedup_embedding_cosine_bruteforce(spark, SF_SMOKE).collect()
    }
    assert got <= want  # no false pairs: same threshold, same metric
    if want:
        assert len(got) / len(want) >= 0.6
    # the gate contract row agrees with the set arithmetic above
    row = dedup_semantic_clustered(spark, SF_SMOKE).first()
    assert row.n_true_pairs == len(want)
    assert row.all_found_true and row.recall_ge_50pct
    assert row.n_assignments == 2 * 500  # top-2 soft assignment census


def test_weighted_pps_sample_size_tracks_weight(spark):
    """Systematic PPS guarantee: per-source picks = floor-or-ceil of
    total_weight/STEP (within 1), i.e. sample size tracks weight mass
    exactly — the property that makes it a budgeted mixing primitive."""
    import pyspark.sql.functions as F

    from qin_cdc_spark.operators.curation import PPS_STEP, sample_weighted_pps
    from qin_cdc_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    picks = (
        sample_weighted_pps(spark, SF_SMOKE)
        .groupBy("source")
        .agg(F.sum("multiplicity").alias("n_picked"))
    )
    mass = (
        load_table(spark, SF_SMOKE, "documents")
        .groupBy("source")
        .agg((F.sum("n_chars") / PPS_STEP).alias("expected"))
    )
    for r in picks.join(mass, "source").collect():
        assert abs(r.n_picked - r.expected) <= 1, r


def test_pps_multiplicity_for_boundary_spanning_weights(spark):
    """A doc whose weight spans m step boundaries is picked with
    multiplicity m (E[multiplicity] = w/STEP holds for EVERY weight) —
    the advisor-flagged gap where heavy docs were silently picked at
    most once."""
    import pyspark.sql.functions as F

    from qin_cdc_spark.operators.curation import PPS_STEP

    # one source: weights 2.5 steps, 0.5 step, 3 steps exactly
    rows = [
        (1, "s", int(PPS_STEP * 2.5)),
        (2, "s", PPS_STEP // 2),
        (3, "s", PPS_STEP * 3),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = F.col("n_chars").cast("long")
    cum = F.sum(wt).over(w)
    mult = F.expr(f"(cum_w div {PPS_STEP}) - ((cum_w - weight) div {PPS_STEP})")
    got = {
        r.doc_id: r.m
        for r in docs.select(
            "doc_id", wt.alias("weight"), cum.alias("cum_w")
        )
        .withColumn("m", mult)
        .collect()
    }
    # cum: 12500, 15000, 30000 → boundaries crossed: 2, 1, 3
    assert got == {1: 2, 2: 1, 3: 3}
    assert sum(got.values()) == 6  # == total weight / STEP exactly


def test_corpus_overlap_matrix_matches_python_sets(spark):
    """Independent cross-check (no shared SQL, no Spark): recompute the
    inter-source shingle-set Jaccard with plain Python sets from the raw
    fixture text and compare every pair exactly."""
    from collections import defaultdict

    from qin_cdc_spark.operators.curation import corpus_overlap_matrix
    from qin_cdc_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    rows = load_table(spark, SF_SMOKE, "documents").select(
        "source", "text"
    ).collect()
    sets: dict[str, set] = defaultdict(set)
    for r in rows:
        w = r.text.strip().split()
        n = max(1, len(w) - 2)
        sets[r.source].update(" ".join(w[i : i + 3]) for i in range(n))

    got = {
        (r.src_a, r.src_b): (r.n_inter, r.jaccard)
        for r in corpus_overlap_matrix(spark, SF_SMOKE).collect()
    }
    srcs = sorted(sets)
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1 :]:
            inter = len(sets[sa] & sets[sb])
            union = len(sets[sa] | sets[sb])
            if inter == 0:
                assert (sa, sb) not in got
                continue
            n_inter, jac = got[(sa, sb)]
            assert n_inter == inter, (sa, sb)
            assert abs(jac - round(inter / union, 6)) < 1e-9, (sa, sb)


def test_mix_token_budget_shares_and_order(spark):
    """Budgeted mixing invariants: per-source token spend stays within
    one doc of its weight-proportional share, and the admitted set is a
    prefix of the portable-hash order (determinism)."""
    import pyspark.sql.functions as F

    from qin_cdc_spark.functions.text import hash60
    from qin_cdc_spark.operators.curation import (
        CHARS_PER_TOKEN,
        MIX_TOTAL_TOKENS,
        _mix_weight_expr,
        mix_token_budget,
    )
    from qin_cdc_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    picked = mix_token_budget(spark, SF_SMOKE)
    docs = load_table(spark, SF_SMOKE, "documents")
    weights = {
        r.source: r.w
        for r in docs.select("source", _mix_weight_expr(F.col("source")).alias("w"))
        .distinct()
        .collect()
    }
    total_w = sum(weights.values())
    spend = {
        r.source: r.t
        for r in picked.groupBy("source").agg(F.sum("n_tokens").alias("t")).collect()
    }
    max_doc_tokens = docs.agg(
        F.max(F.expr(f"n_chars div {CHARS_PER_TOKEN}"))
    ).first()[0]
    for src, w in weights.items():
        share = (w * MIX_TOTAL_TOKENS) // total_w
        got = spend.get(src, 0)
        # prefix rule: under-fills only if the source ran out of docs;
        # overshoots by at most the last admitted doc
        assert got <= share + max_doc_tokens, (src, got, share)

    # determinism + prefix property: re-running picks the identical set,
    # and every unpicked doc hashes after every picked doc per source
    a = sorted(map(tuple, picked.collect()))
    b = sorted(map(tuple, mix_token_budget(spark, SF_SMOKE).collect()))
    assert a == b
    hashed = docs.select(
        "source", "doc_id", hash60(F.col("doc_id").cast("string")).alias("h")
    )
    pk = {(r.source, r.doc_id) for r in picked.collect()}
    rows = sorted(
        ((r.source, r.h, r.doc_id) for r in hashed.collect()),
    )
    by_src = {}
    for src, h, d in rows:
        by_src.setdefault(src, []).append((h, d))
    for src, lst in by_src.items():
        seen_unpicked = False
        for h, d in lst:
            if (src, d) in pk:
                assert not seen_unpicked, (src, d)  # picked after a gap
            else:
                seen_unpicked = True


def test_dedup_segments_crossdoc_invariants(spark):
    """Every doc keeps <= its segment count; a corpus with a repeated
    doc keeps the duplicate's segments only at the first occurrence."""
    import pyspark.sql.functions as F

    from qin_cdc_spark.operators.curation import dedup_segments_crossdoc
    from tests.conftest import SF_SMOKE

    out = dedup_segments_crossdoc(spark, SF_SMOKE)
    assert out.filter(F.col("n_kept") > F.col("n_segs")).count() == 0
    # fixture corpus has near/exact dup docs → something must drop
    dropped = out.filter(F.col("n_kept") < F.col("n_segs")).count()
    assert dropped > 0


def test_gopher_rules_flags(spark):
    """keep is the conjunction of the published rule battery — verified
    on hand-built rows that isolate each rule."""
    from pyspark.sql import Row

    from qin_cdc_spark.operators.curation import (
        GOPHER_MIN_STOP_HITS,
        text_gopher_rules,
    )

    # monkeypatch-free: run on the real fixture, then assert rule logic
    # on the returned columns directly
    from tests.conftest import SF_SMOKE

    rows = text_gopher_rules(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        want = (
            15 <= r.n_words <= 100_000
            and 3.0 <= r.mean_word_len <= 10.0
            and r.frac_alpha >= 0.8
            and r.n_stop_hits >= GOPHER_MIN_STOP_HITS
        )
        assert r.keep == want, r


def test_curriculum_bins_partition_docs_evenly(spark):
    """ntile contract per source: bin sizes differ by at most 1, bins
    cover all docs, and avg quality is non-decreasing with bin index
    (the curriculum ordering the op exists to provide)."""
    import pyspark.sql.functions as F

    from qin_cdc_spark.operators.curation import curriculum_quality_bins
    from qin_cdc_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    out = curriculum_quality_bins(spark, SF_SMOKE).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    n_total = sum(r.n_docs for r in out)
    assert n_total == load_table(spark, SF_SMOKE, "documents").count()
    for src, rows in by_src.items():
        sizes = [r.n_docs for r in rows]
        assert max(sizes) - min(sizes) <= 1, (src, sizes)
        ordered = sorted(rows, key=lambda r: r.bin)
        qs = [r.avg_quality_e6 for r in ordered]
        assert qs == sorted(qs), (src, qs)


def test_dsir_topk_excludes_target_and_broadcasts_weights(spark):
    """DSIR importance ranking: only raw-corpus docs are ranked, the
    512-row weight relation broadcasts into the scoring pass (no
    shuffle join against the token scan), and scores are exact longs
    in strictly deterministic order."""
    from qin_cdc_spark.operators.curation import (
        DSIR_TARGET_SOURCES,
        DSIR_TOPK,
        curation_dsir_topk,
    )
    from qin_cdc_spark.sources.tables import load_table

    # plan asserted on the LAZY form (the registered query materializes
    # to a file-backed frame, whose plan is just the result scan)
    plan = _plan(curation_dsir_topk(spark, SF_SMOKE, _lazy=True))
    assert "BroadcastHashJoin" in plan  # weights side broadcast
    out = curation_dsir_topk(spark, SF_SMOKE)
    rows = out.collect()
    assert len(rows) == DSIR_TOPK
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(isinstance(r.score, int) for r in rows)
    tgt_ids = {
        r.doc_id
        for r in load_table(spark, SF_SMOKE, "documents")
        .filter(F.col("source").isin(*DSIR_TARGET_SOURCES))
        .select("doc_id")
        .collect()
    }
    assert not ({r.doc_id for r in rows} & tgt_ids)
