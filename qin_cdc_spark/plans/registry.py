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
# Round-10 layout: slot 9 is the round's new gate
# (cdc_mv_rename_follow — declared-MV state follows a wire-relayed
# RENAME COLUMN of its group column, VERDICT r9 #2); slots 10-48 are
# the ENTIRE remaining r3-vintage block (agg_mode_median …
# win_time_range) — this rotation FINISHES the freshness ledger: after
# it, no registry name's newest driver-green row predates round 8;
# slots 49-50 start the r4 block alphabetically.  From round 11 on the
# rotation is pure oldest-green maintenance.  `python3 tools/vintage.py`
# prints the live ledger.
#
# Round-11 refresh queue (oldest-green names NOT in this prefix): the
# remaining r4-vintage names (asof_join_next_purchase …), then r5.
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
    # -- round-10 addition (9) --
    "cdc_mv_rename_follow",
    # -- r3-vintage refresh block (10-48, the whole remainder) --
    "agg_mode_median",
    "cdc_derived_rollup",
    "cdc_time_travel",
    "corpus_overlap_matrix",
    "date_spine_zerofill",
    "dedup_containment",
    "emb_quantize_int8",
    "fn_agg_extras",
    "fn_array_setops",
    "fn_bitwise",
    "fn_date_extras",
    "fn_map_ops",
    "fn_regexp",
    "fn_string_extras",
    "join_null_safe_eq",
    "join_salted_skew",
    "mm_audio_rms",
    "mm_byte_histogram",
    "pack_sequences_concat",
    "q4_order_priority",
    "rollup_continuous_agg",
    "sample_hash_bernoulli",
    "sample_split_3way",
    "sample_weighted_pps",
    "scan_csv",
    "scan_orc",
    "scan_partitioned_pruned",
    "scan_sorted_zonemap",
    "setop_union_missing",
    "sim_ann_lsh",
    "sql_hint_broadcast",
    "subquery_not_in_null",
    "text_fingerprint",
    "text_pii_redact",
    "text_quality_score",
    "unpivot_metrics",
    "win_ignore_nulls",
    "win_nth_value",
    "win_time_range",
    # -- r4-vintage refresh starts (49-50) --
    "agg_stats_exact",
    "asof_join_nearest_purchase",
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
