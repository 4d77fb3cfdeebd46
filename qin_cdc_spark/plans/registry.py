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
# 1-5: exactly the first 50 entries), so iteration order is part of the
# contract.  Rotation policy (VERDICT r7 #2 extends it with a FRESHNESS
# rule, applied every round from now on): positions 1-8 stay ONE
# known-green family representative each; the remaining slots go FIRST
# to the round's new gate queries, THEN to the OLDEST-green registry
# names (computed from the CORRECTNESS_r* ledger: the name's most
# recent green driver row), so stale rows refresh instead of the same
# recent names re-greening forever.  Every evicted name already has a
# green driver row (all 50 round-7 prefix entries were green in
# CORRECTNESS_r07), so the cross-round ledger "every registry query has
# ≥1 green driver row" stays intact by construction.
#
# Round-9 layout: slot 9 is the round's new gate
# (cdc_rename_relay_chain — an upstream RENAME COLUMN round-trips
# store → wire → store with historical values intact, VERDICT r8 #1);
# slots 10-17 refresh the 8 deferred r1-vintage names the round-8
# rotation ran out of room for (agg_cube … subquery_in); slots 18-48
# are the entire r2-vintage block (latest green = r2); slots 49-50
# start the r3 block alphabetically.  `python3 tools/vintage.py`
# prints the live ledger.
#
# Round-10 refresh queue (oldest-green names NOT in this prefix): the
# remaining 39 r3-vintage names (agg_mode_median … win_time_range) —
# one more rotation finishes the ledger: no name's newest driver-green
# row will predate round 8.
_HEAD = [
    # -- family representatives (1-8) --
    "cdc_apply_orders",  # CDC apply/merge
    "join_salted_twophase",  # scale joins
    "ev_tumbling_window",  # streaming/event analytics
    "dedup_minhash_lsh",  # near-dup (LSH family)
    "q1_pricing_summary",  # TPC-H relational
    "mm_decode_meta",  # multimodal
    "udf_apply_in_pandas",  # UDF surface
    "neardup_store_two_batch",  # streaming near-dup store
    # -- round-9 addition (9) --
    "cdc_rename_relay_chain",
    # -- deferred r1-vintage refresh (10-17) --
    "agg_cube",
    "agg_having",
    "join_cross",
    "join_full_outer",
    "q18_large_orders",
    "setop_intersect",
    "setop_union_all",
    "subquery_in",
    # -- r2-vintage refresh block (18-48) --
    "agg_decimal_exact",
    "agg_rollup",
    "asof_join_last_purchase",
    "cdc_apply_lineitem_multipk",
    "cdc_pk_move",
    "corpus_stats_by_lang",
    "curation_source_cap",
    "decontaminate_ngram",
    "dedup_cluster_cc",
    "dedup_cluster_keep_best",
    "dedup_edit_distance",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "ev_cohort_retention",
    "ev_funnel_conversion",
    "ev_session_window",
    "ev_sessionize_gap",
    "ev_watermark_late_drop",
    "join_bucketed_colocated",
    "mm_payload_stats",
    "pack_sequences_bins",
    "q12_shipmode_priority",
    "sim_cosine_topk",
    "sim_knn_label_vote",
    "text_language_id",
    "text_tfidf_topk",
    "text_token_count",
    "topk_per_group",
    "udf_pandas_scalar",
    # -- r3-vintage refresh starts (49-50) --
    "agg_collect_sorted",
    "agg_grouping_id",
]


# Every module expected to contribute QUERIES/ORACLES.  Imports FAIL
# LOUDLY (VERDICT r7 "what's wrong" #1): the old per-module
# `except ImportError: pass` meant a transitive break (e.g. numpy
# missing for similarity) silently dropped dozens of queries, shifted
# the driver's 50-slot prefix, and the gate green-checked the wrong
# set — nothing failed until someone diffed the counts.  All listed
# dependencies (numpy/pandas/pyarrow) are baked into the target
# environment, so an ImportError here is a BUG, not a platform gap.
_REQUIRED_MODULES = [
    "qin_cdc_spark.operators.relational",
    "qin_cdc_spark.operators.relational_ext",
    "qin_cdc_spark.operators.tpch_ext",
    "qin_cdc_spark.operators.llm_text",
    "qin_cdc_spark.operators.llm_ext",
    "qin_cdc_spark.operators.scale_joins",
    "qin_cdc_spark.operators.similarity",
    "qin_cdc_spark.operators.curation",
    "qin_cdc_spark.operators.multimodal",
    "qin_cdc_spark.operators.udf_surface",
    "qin_cdc_spark.operators.ivf",
    "qin_cdc_spark.operators.retrieval",
    "qin_cdc_spark.operators.fusion",
    "qin_cdc_spark.operators.pq",
    "qin_cdc_spark.operators.corpus_ops",
    "qin_cdc_spark.operators.lsh_index",
    "qin_cdc_spark.operators.bpe",
    "qin_cdc_spark.operators.dq",
    "qin_cdc_spark.operators.linalg",
    "qin_cdc_spark.operators.shards",
    "qin_cdc_spark.cdc.queries",
    "qin_cdc_spark.streaming.queries",
    "qin_cdc_spark.streaming.neardup_store",
    "qin_cdc_spark.streaming.cms_store",
]


def _import_required() -> list:
    import importlib

    modules = []
    for name in _REQUIRED_MODULES:
        try:
            modules.append(importlib.import_module(name))
        except ImportError as e:
            raise RuntimeError(
                f"query registry: required operator module {name!r} failed "
                f"to import ({e}) — refusing to serve a silently-shrunken "
                "registry (the driver would green-check the wrong 50-query "
                "prefix)"
            ) from e
    return modules


def _collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}

    for mod in _import_required():
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
