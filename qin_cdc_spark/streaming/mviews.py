"""Materialized-view factory for the TOML config surface.

The reference's config declares inputs, transforms and routed outputs
(config/config.go:10-31); this engine extends that schema with
``[[materialized-views]]`` blocks so the derived views the engine can
maintain (streaming/derived.py, streaming/stats.py) are DECLARED next
to the routes they consume, and the compiled pipeline refreshes them
inside every micro-batch — no hand-written post_batch wiring:

    [[materialized-views]]
    name = "orders_by_status"
    type = "agg"                       # agg | extrema | distinct |
    source-schema = "src"              # quantile | topk | keyed-agg |
    source-table  = "orders"           # column-stats | gsi | scd2-stats
    [materialized-views.config]
    group-cols = ["o_orderstatus"]
    sum-cols   = ["price_c"]

``type = "scd2-stats"`` (per-key version-count/dwell stats over the
route's SCD2 history, scd2.py::ScdHistoryStatsMV) requires
``history = true`` on the router and binds through the route's history
store — the pipeline compiles it directly, not this factory.

A declared view forces its route's target to be VERSIONED (the views
refresh from the change data feed — there is nothing to refresh from
otherwise).  Config keys are kebab-case like the rest of the surface.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def build_materialized_view(
    spark: SparkSession, path: str, mv_type: str, cfg: dict
):
    """Instantiate a derived-view maintainer from config; every returned
    object exposes ``refresh(source) -> int`` and ``read()``."""
    from qin_cdc_spark.streaming.derived import (
        DerivedAggTable,
        DerivedDistinctTable,
        DerivedExtremaTable,
        DerivedKeyedAggTable,
        DerivedQuantileTable,
        DerivedTopKTable,
    )
    from qin_cdc_spark.streaming.stats import IncrementalColumnStats

    g = list(cfg.get("group-cols", []))
    if mv_type == "agg":
        return DerivedAggTable(
            spark, path, group_cols=g, sum_cols=list(cfg.get("sum-cols", []))
        )
    if mv_type == "extrema":
        return DerivedExtremaTable(
            spark, path, group_cols=g,
            minmax_cols=list(cfg.get("minmax-cols", [])),
        )
    if mv_type == "distinct":
        return DerivedDistinctTable(
            spark, path, group_cols=g, value_col=cfg["value-col"],
            n_buckets=int(cfg.get("n-buckets", 32)),
        )
    if mv_type == "quantile":
        return DerivedQuantileTable(
            spark, path, group_cols=g, value_col=cfg["value-col"],
            bin_width=int(cfg["bin-width"]),
        )
    if mv_type == "topk":
        return DerivedTopKTable(
            spark, path, group_cols=g, key_cols=list(cfg["key-cols"]),
            value_col=cfg["value-col"], k=int(cfg["k"]),
            buffer_size=int(cfg["buffer-size"]) if "buffer-size" in cfg else None,
        )
    if mv_type == "keyed-agg":
        return DerivedKeyedAggTable(
            spark, path, group_cols=g, sum_cols=list(cfg.get("sum-cols", [])),
            n_buckets=int(cfg.get("n-buckets", 32)),
            cnt_col=cfg.get("cnt-col", "cnt"),
        )
    if mv_type == "column-stats":
        return IncrementalColumnStats(
            spark, path, group_cols=g, value_col=cfg["value-col"],
            bin_width=int(cfg["bin-width"]),
            ndv_buckets=int(cfg.get("ndv-buckets", 32)),
        )
    if mv_type == "gsi":
        from qin_cdc_spark.streaming.gsi import GlobalSecondaryIndex

        return GlobalSecondaryIndex(
            spark, path, index_col=cfg["index-col"],
            pk_cols=list(cfg["pk-cols"]),
            include_cols=list(cfg.get("include-cols", [])),
            n_buckets=int(cfg.get("n-buckets", 32)),
        )
    raise ValueError(f"unknown materialized-view type {mv_type!r}")
