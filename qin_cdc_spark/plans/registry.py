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

# The driver's correctness gate evaluates a PREFIX of this registry (round 1:
# exactly the first 50 entries), so iteration order is part of the contract.
# Lead with one-or-more representatives of EVERY operator family — CDC apply,
# each dedup family, ANN, streaming windows, multimodal, UDF surface, skew/
# bucketed joins, TPC-H — so any prefix cap still samples the whole SURVEY §2
# matrix; the long tail (remaining relational/TPC-H variants) follows in
# module order.
_HEAD = [
    # CDC core (the reference's raison d'être)
    "cdc_apply_orders",
    "cdc_replay_idempotent",
    "cdc_apply_lineitem_multipk",
    "cdc_last_event_per_key",
    "cdc_transform_rename_drop",
    "cdc_pk_move",
    "kafka_default_format",
    # streaming / event analytics
    "ev_tumbling_window",
    "ev_session_window",
    "ev_sessionize_gap",
    "ev_funnel_conversion",
    "ev_cohort_retention",
    "ev_watermark_late_drop",
    # dedup families (exact, MinHash-LSH, SimHash, n-gram, embedding, CC,
    # edit-distance, representative-pick)
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "dedup_cluster_cc",
    "dedup_edit_distance",
    "dedup_cluster_keep_best",
    # similarity / ANN
    "sim_cosine_topk",
    "sim_ann_lsh",
    "sim_knn_label_vote",
    # LLM text pipeline
    "text_language_id",
    "text_quality_score",
    "text_token_count",
    "text_tfidf_topk",
    "decontaminate_ngram",
    "sample_split_3way",
    "pack_sequences_bins",
    "emb_quantize_int8",
    "curation_source_cap",
    "corpus_stats_by_lang",
    # multimodal
    "mm_decode_meta",
    "mm_payload_stats",
    # UDF surface
    "udf_pandas_scalar",
    "udf_apply_in_pandas",
    # scale joins / scans
    "join_salted_skew",
    "join_bucketed_colocated",
    "scan_sorted_zonemap",
    # relational + TPC-H representatives (incl. the two round-1 hash-fails,
    # now canon-proof)
    "q1_pricing_summary",
    "q12_shipmode_priority",
    "fn_case_cast_null",
    "agg_decimal_exact",
    # continuous-aggregate store (hypertable-rollup parity), oracle-checked
    "rollup_continuous_agg",
    "agg_rollup",
    # streaming near-dup admission store (new family, round 2 late) —
    # window functions stay sampled via topk_per_group
    "neardup_store_two_batch",
    "topk_per_group",
    "asof_join_last_purchase",
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
