"""Data-quality operators: violation detection on corrupted data and
the one-pass plan contract."""

from __future__ import annotations

import contextlib
import io

import pyspark.sql.functions as F

from tests.conftest import SF_SMOKE


def test_constraints_catch_planted_violations(spark):
    from qin_cdc_spark.operators.dq import check_constraints

    df = spark.createDataFrame(
        [(1, 10.0, "O"), (2, -5.0, "O"), (3, 7.0, "X"), (4, 0.0, None)],
        "id long, price double, status string",
    )
    out = {
        r.constraint: r
        for r in check_constraints(
            df,
            [
                ("price_positive", F.col("price") > 0),
                (
                    "status_in_domain",
                    F.coalesce(F.col("status").isin("O", "F"), F.lit(False)),
                ),
            ],
        ).collect()
    }
    assert out["price_positive"].violations == 2  # -5.0 and 0.0
    assert out["price_positive"].status == "fail"
    assert out["status_in_domain"].violations == 2  # 'X' and NULL
    assert all(r.total == 4 for r in out.values())


def test_unique_and_reference_checks(spark):
    from qin_cdc_spark.operators.dq import check_references, check_unique

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    dup = spark.createDataFrame([(1,), (1,), (2,)], "k long")

    u = check_unique(dup, "k_unique", ["k"]).collect()[0]
    assert u.violations == 1 and u.status == "fail"

    r = check_references(child, "fk", parent, "pk", "fk_check").collect()[0]
    assert r.violations == 1 and r.total == 3 and r.status == "fail"


def test_rowlocal_constraints_are_one_scan(spark):
    """However many rules are declared, the plan must contain exactly
    one scan of the input (one HashAggregate chain, no self-joins)."""
    from qin_cdc_spark.operators.dq import check_constraints
    from qin_cdc_spark.sources.tables import load_table

    orders = load_table(spark, SF_SMOKE, "orders")
    report = check_constraints(
        orders,
        [(f"r{i}", F.col("o_totalprice") > i) for i in range(8)],
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        report.explain("formatted")
    plan = buf.getvalue()
    # one agg row exploded into report rows: exactly one table scan
    # (formatted explain prints each node twice: tree line + detail)
    assert plan.count("Scan parquet") == 2, plan


def test_gate_report_all_green_on_fixtures(spark):
    from qin_cdc_spark.operators.dq import dq_constraint_report

    out = dq_constraint_report(spark, SF_SMOKE).collect()
    assert len(out) == 6
    assert all(r.status == "pass" for r in out), out
