"""Every registered (query, oracle) pair hash-matches DuckDB at sf0.001 —
the in-repo replica of the driver's t2 gate (fast smoke scale; the
harness tools/check_correctness.py runs the same sweep at sf0.01)."""

from __future__ import annotations

import pytest

from qin_cdc_spark.plans.registry import all_oracles, all_queries
from qin_cdc_spark.testing import assert_matches_oracle
from tests.conftest import SF_SMOKE

QUERIES = all_queries()
ORACLES = all_oracles()


def test_registry_complete():
    assert len(QUERIES) >= 54
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    df = QUERIES[name](spark, SF_SMOKE)
    assert_matches_oracle(df, ORACLES[name], duck)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_query_runs(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    assert df.count() >= 0
