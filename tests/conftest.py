from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_SMOKE = "/root/testdata/sf0.001"
SF_T2 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from qin_cdc_spark.session import get_spark

    spark = get_spark("qin_cdc_spark_tests", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    from qin_cdc_spark.testing import duckdb_conn

    return duckdb_conn(SF_SMOKE)


def pytest_sessionfinish(session, exitstatus):
    """Drop the LAST gate query's temp store trees (gate_tmp defers
    cleanup by one query; everything earlier was already reclaimed)."""
    from qin_cdc_spark.session import cleanup_session_tmp
    from qin_cdc_spark.testing import cleanup_gate_tmp

    cleanup_gate_tmp()
    cleanup_session_tmp()
