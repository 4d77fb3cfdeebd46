"""Property checks that the oracle gate can't express: approx-agg
accuracy, plan-shape assertions (pushdown / broadcast / top-k)."""

from __future__ import annotations

import pyspark.sql.functions as F

from qin_cdc_spark.operators.relational import q5_region_revenue, sort_limit_global
from qin_cdc_spark.operators.relational_ext import approx_distinct_rows_only
from qin_cdc_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_approx_count_distinct_within_5pct(spark):
    rows = approx_distinct_rows_only(spark, SF_SMOKE).collect()
    exact = {
        r.l_returnflag: r.n
        for r in load_table(spark, SF_SMOKE, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    for r in rows:
        assert r.exact_parts == exact[r.l_returnflag]
        assert r.approx_within_5pct  # the query carries its own bound


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q5_joins_are_broadcast(spark):
    """Dimension joins must never shuffle the fact side."""
    plan = _plan(q5_region_revenue(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_global_topk_avoids_full_sort(spark):
    plan = _plan(sort_limit_global(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan


def test_scan_pushdown_and_pruning(spark):
    """Filters reach the parquet scan; only referenced columns are read."""
    from qin_cdc_spark.operators.relational_ext import q6_forecast_revenue

    plan = _plan(q6_forecast_revenue(spark, SF_SMOKE))
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:300]
    read_schema = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "l_returnflag" not in read_schema  # unreferenced column pruned