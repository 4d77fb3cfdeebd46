"""Central query/oracle registry.

Collects every operator module's ``QUERIES`` (name → (spark, sf_dir) →
DataFrame) and ``ORACLES`` (name → DuckDB SQL) into the flat dicts the
driver consumes through ``__spark_entry__``.  A query without an oracle
entry is a declared non-SQL-expressible operator (weaker rows-only
check, per the driver contract).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# The driver's correctness gate evaluates a PREFIX of this registry (rounds
# 1-2: exactly the first 50 entries), so iteration order is part of the
# contract.  Round-3 layout per the round-2 verdict: positions 1-15 are ONE
# known-green representative per operator family (any prefix cap still
# samples the whole SURVEY §2 matrix, and emb_quantize_int8 stays to prove
# the round-2 red row is fixed); positions 16-50 ROTATE never-driver-checked
# names (35 this round) so every registry query gets driver-verified at
# least once by round 4.
#
# Rotation ledger — still never-driver-checked after round 3 (rotate these
# into positions 16-50 next round; 32 names, fits one more rotation):
#   hist_equi_depth sketch_hll_mergeable q2_min_price_part q4… (remaining
#   q-series: q2,q7,q8,q9,q10,q11,q13,q15,q16,q19,q20,q22) text_rolling_hash
#   text_clean_canonical sample_stratified_topn text_bigram_logprob
#   pipeline_corpus_curation text_repetition_ratio text_word_entropy
#   text_chunk_dedup corpus_top_ngrams decontaminate_embedding
#   dedup_semantic_clustered udf_pandas_grouped_agg udf_python_rowwise
#   sim_ann_ivf ev_sliding_window ev_dedup_first_by_key mm_resize_meta
#   mm_frame_sample + the round-3 additions (mix_token_budget,
#   dedup_segments_crossdoc, text_gopher_rules, curriculum_quality_bins,
#   join_interval_binned, udf_map_in_arrow, asof_join_next_purchase,
#   asof_join_nearest_purchase, text_bm25_topk, decontaminate_bloom,
#   sim_pq_adc_topk, sim_ivf_pq_topk [rows-only], dedup_substring_spans,
#   text_hashed_linear_score, corpus_snapshot_diff, sketch_quantile_bins,
#   chunk_content_defined, corpus_term_drift, sketch_countmin_stream_merge,
#   tokenize_bpe_counts [rows-only], dq_constraint_report,
#   dq_profile_orders, shards_plan_stats, mm_ahash_neardup,
#   ev_attribution_last_touch, ev_rate_anomaly, cdc_bootstrap_overlap,
#   q21_sole_late_shipper, q17_small_qty_revenue, scan_zorder_2d, dedup_jaccard_prefix_exact, retrieval_rrf_fusion,
#   retrieval_hard_negatives, mix_temperature_alloc, cdc_time_travel,
#   agg_stats_exact, cdc_derived_rollup,
#   cdc_version_diff, sketch_kmv_source_overlap, scan_bloom_pruned,
#   cdc_consistent_snapshot, cdc_versioned_bloom_lookup)
_HEAD = [
    # -- family representatives (1-15), all green in CORRECTNESS_r02 --
    "cdc_apply_orders",  # CDC apply/merge
    "cdc_replay_idempotent",  # CDC delivery invariants
    "ev_tumbling_window",  # streaming/event analytics
    "dedup_minhash_lsh",  # near-dup (LSH family)
    "sim_ann_lsh",  # ANN similarity
    "text_quality_score",  # LLM text pipeline
    "sample_split_3way",  # curation/sampling
    "emb_quantize_int8",  # round-2 red row — now canon-proof (q_csv)
    "mm_decode_meta",  # multimodal
    "udf_apply_in_pandas",  # UDF surface
    "join_salted_skew",  # scale joins
    "scan_sorted_zonemap",  # scans/layout
    "q1_pricing_summary",  # TPC-H relational
    "rollup_continuous_agg",  # continuous-aggregate store
    "neardup_store_two_batch",  # streaming near-dup store
    # -- rotation block (16-50): first-time driver checks this round --
    "dedup_containment",
    "join_salted_twophase",
    "corpus_overlap_matrix",
    "sample_weighted_pps",
    "pack_sequences_concat",
    "mm_audio_rms",
    "mm_byte_histogram",
    "fn_map_ops",
    "agg_collect_sorted",
    "fn_regexp",
    "fn_array_setops",
    "fn_string_extras",
    "fn_date_extras",
    "fn_agg_extras",
    "fn_bitwise",
    "win_nth_value",
    "win_ignore_nulls",
    "win_time_range",
    "agg_mode_median",
    "agg_grouping_id",
    "unpivot_metrics",
    "setop_union_missing",
    "scan_partitioned_pruned",
    "scan_csv",
    "scan_orc",
    "sql_hint_broadcast",
    "join_null_safe_eq",
    "subquery_not_in_null",
    "date_spine_zerofill",
    "text_fingerprint",
    "text_pii_redact",
    "sample_hash_bernoulli",
    "q4_order_priority",
    "cdc_derived_rollup",  # round-3 derived-MV flagship
    "cdc_time_travel",  # round-3 versioned-target family representative
]


def _collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}

    import qin_cdc_spark.operators.relational as relational
    import qin_cdc_spark.operators.relational_ext as relational_ext

    import qin_cdc_spark.operators.tpch_ext as tpch_ext

    modules = [relational, relational_ext, tpch_ext]

    try:
        import qin_cdc_spark.operators.llm_text as llm_text

        modules.append(llm_text)
    except ImportError:
        pass
    try:
        import qin_cdc_spark.operators.llm_ext as llm_ext

        modules.append(llm_ext)
    except ImportError:
        pass
    try:
        import qin_cdc_spark.operators.scale_joins as scale_joins

        modules.append(scale_joins)
    except ImportError:
        pass
    try:
        import qin_cdc_spark.operators.similarity as similarity

        modules.append(similarity)
    except ImportError:
        pass
    try:
        import qin_cdc_spark.operators.curation as curation

        modules.append(curation)
    except ImportError:
        pass
    try:
        import qin_cdc_spark.operators.multimodal as multimodal

        modules.append(multimodal)
    except ImportError:
        pass
    try:
        import qin_cdc_spark.operators.udf_surface as udf_surface

        modules.append(udf_surface)
    except ImportError:
        pass
    try:
        import qin_cdc_spark.operators.ivf as ivf

        modules.append(ivf)
    except ImportError:
        pass
    try:
        import qin_cdc_spark.operators.retrieval as retrieval

        modules.append(retrieval)
    except ImportError:
        pass
    try:
        import qin_cdc_spark.operators.fusion as fusion

        modules.append(fusion)
    except ImportError:
        pass
    try:
        import qin_cdc_spark.operators.pq as pq

        modules.append(pq)
    except ImportError:
        pass
    try:
        import qin_cdc_spark.operators.corpus_ops as corpus_ops

        modules.append(corpus_ops)
    except ImportError:
        pass
    try:
        import qin_cdc_spark.operators.lsh_index as lsh_index

        modules.append(lsh_index)
    except ImportError:
        pass
    try:
        import qin_cdc_spark.operators.bpe as bpe

        modules.append(bpe)
    except ImportError:
        pass
    try:
        import qin_cdc_spark.operators.dq as dq

        modules.append(dq)
    except ImportError:
        pass
    try:
        import qin_cdc_spark.operators.shards as shards

        modules.append(shards)
    except ImportError:
        pass
    try:
        import qin_cdc_spark.cdc.queries as cdc_queries

        modules.append(cdc_queries)
    except ImportError:
        pass
    try:
        import qin_cdc_spark.streaming.queries as streaming_queries

        modules.append(streaming_queries)
    except ImportError:
        pass
    try:
        import qin_cdc_spark.streaming.neardup_store as neardup_store

        modules.append(neardup_store)
    except ImportError:
        pass
    try:
        import qin_cdc_spark.streaming.cms_store as cms_store

        modules.append(cms_store)
    except ImportError:
        pass

    for mod in modules:
        for name, fn in getattr(mod, "QUERIES", {}).items():
            if name in queries:
                raise ValueError(f"duplicate query name {name!r} in {mod.__name__}")
            queries[name] = fn
        for name, sql in getattr(mod, "ORACLES", {}).items():
            oracles[name] = sql

    unknown = set(oracles) - set(queries)
    if unknown:
        raise ValueError(f"oracle without query: {sorted(unknown)}")

    missing_head = [n for n in _HEAD if n not in queries]
    if missing_head:
        raise ValueError(f"_HEAD names not registered: {missing_head}")
    ordered = {n: queries[n] for n in _HEAD}
    ordered.update((n, f) for n, f in queries.items() if n not in ordered)
    return ordered, oracles


def all_queries() -> dict[str, QueryFn]:
    return _collect()[0]


def all_oracles() -> dict[str, str]:
    return _collect()[1]
