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
# Round-8 layout: slots 9-10 are the round's new queries
# (cdc_ddl_relay_chain — ALTER propagates store → wire → store;
# cdc_scd2_dwell_mv — the history stats MV, the retention floor's
# first consumer); slots 11-15 refresh the five names the round-7
# verdict called out by vintage (cdc_transform_rename_drop,
# kafka_default_format, cdc_last_event_per_key, cdc_replay_idempotent,
# fn_case_cast_null — latest green r2/r3); slots 16-50 are 35 of the
# 43 r1-vintage names (latest green = r1), alphabetical within family,
# keeping every family represented.
#
# Round-9 refresh queue (oldest-green names NOT in this prefix):
# the 8 deferred r1-vintage names — agg_cube, agg_having, join_cross,
# join_full_outer, q18_large_orders, setop_intersect, setop_union_all,
# subquery_in — then the remaining r2/r3-vintage block (see
# `python3 tools/vintage.py` for the live ledger).
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
    # -- round-8 additions (9-10) --
    "cdc_ddl_relay_chain",
    "cdc_scd2_dwell_mv",
    # -- verdict-named stale rows (11-15, latest green r2/r3) --
    "cdc_transform_rename_drop",
    "kafka_default_format",
    "cdc_last_event_per_key",
    "cdc_replay_idempotent",
    "fn_case_cast_null",
    # -- oldest-green refresh block (16-50, latest green r1) --
    "agg_basic",
    "agg_distinct",
    "agg_grouping_sets",
    "agg_percentile",
    "agg_stats",
    "explode_posexplode",
    "filter_predicates",
    "fn_array",
    "fn_date",
    "fn_json",
    "fn_math",
    "fn_string",
    "join_anti",
    "join_inner_equi",
    "join_left_outer",
    "join_range_nonequi",
    "join_semi",
    "pivot_status_by_priority",
    "proj_select_alias",
    "q14_promo_effect",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "scalar_subquery",
    "scan_jsonl",
    "setop_except",
    "setop_union_distinct",
    "sort_limit_global",
    "subquery_exists_correlated",
    "win_lag_lead",
    "win_ntile_percent",
    "win_range_between",
    "win_rank_dense",
    "win_row_number",
    "win_running_sum",
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
