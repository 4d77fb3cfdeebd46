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
# 1-3: exactly the first 50 entries), so iteration order is part of the
# contract.  Round-4 layout: positions 1-8 are ONE known-green family
# representative each (join_salted_twophase replaces join_salted_skew as
# the scale-joins rep to prove the round-3 red row — a float-accumulation
# hash flip, now decimal-exact — is fixed); positions 9-50 ROTATE 42
# never-driver-checked names.
#
# Rotation ledger — still never-driver-checked after round 4 (34 names;
# rotate into positions 9-50 next round and every registry query will have
# been driver-verified at least once):
#   mm_ahash_neardup udf_python_rowwise udf_map_in_arrow text_bm25_topk
#   decontaminate_bloom sketch_countmin_topk retrieval_rrf_fusion
#   retrieval_hard_negatives mix_temperature_alloc dedup_substring_spans
#   text_hashed_linear_score corpus_snapshot_diff sketch_quantile_bins
#   chunk_content_defined corpus_term_drift sketch_kmv_source_overlap
#   dedup_minhash_lsh_indexed dq_constraint_report dq_profile_orders
#   shards_plan_stats cdc_bootstrap_overlap cdc_consistent_snapshot
#   cdc_versioned_bloom_lookup ev_sliding_window ev_dedup_first_by_key
#   ev_attribution_last_touch ev_rate_anomaly sketch_countmin_stream_merge
#   + rows-only: sketch_hll_mergeable dedup_semantic_clustered sim_ann_ivf
#   sim_pq_adc_topk sim_ivf_pq_topk tokenize_bpe_counts
_HEAD = [
    # -- family representatives (1-8), all green in CORRECTNESS_r03 or
    #    locally re-verified this round --
    "cdc_apply_orders",  # CDC apply/merge
    "join_salted_twophase",  # scale joins — round-3 red row, now decimal-exact
    "ev_tumbling_window",  # streaming/event analytics
    "dedup_minhash_lsh",  # near-dup (LSH family)
    "q1_pricing_summary",  # TPC-H relational
    "mm_decode_meta",  # multimodal
    "udf_apply_in_pandas",  # UDF surface
    "neardup_store_two_batch",  # streaming near-dup store
    # -- rotation block (9-50): first-time driver checks this round --
    "q2_min_price_part",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_stock",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_supplier_cnt",
    "q17_small_qty_revenue",
    "q19_disjunctive_filter",
    "q20_excess_suppliers",
    "q21_sole_late_shipper",
    "q22_dormant_customers",
    "asof_join_next_purchase",
    "asof_join_nearest_purchase",
    "agg_stats_exact",
    "hist_equi_depth",
    "text_rolling_hash",
    "text_clean_canonical",
    "sample_stratified_topn",
    "text_bigram_logprob",
    "pipeline_corpus_curation",
    "text_repetition_ratio",
    "text_word_entropy",
    "text_chunk_dedup",
    "corpus_top_ngrams",
    "join_interval_binned",
    "scan_zorder_2d",
    "join_dpp_pruned",
    "scan_bloom_pruned",
    "dedup_jaccard_prefix_exact",
    "decontaminate_embedding",
    "mix_token_budget",
    "dedup_segments_crossdoc",
    "text_gopher_rules",
    "curriculum_quality_bins",
    "sample_split_leakage_safe",
    "mm_resize_meta",
    "mm_frame_sample",
    "udf_pandas_grouped_agg",
    "cdc_version_diff",
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
