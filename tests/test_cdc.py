"""CDC semantics tests: delivery invariants from SURVEY §2.A, config
parsing, transform chain — at sf0.001."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from qin_cdc_spark.cdc.apply import apply_changes, decode_envelope, latest_by_key
from qin_cdc_spark.cdc.changestream import orders_change_stream
from qin_cdc_spark.cdc.envelope import ENVELOPE_SCHEMA, envelope_from_typed
from qin_cdc_spark.operators.transforms import (
    DeleteColumnTransform,
    FilterRowsTransform,
    RenameColumnTransform,
    TransformChain,
    build_transform,
)
from qin_cdc_spark.plans.config import parse_config
from qin_cdc_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def orders_env(spark):
    env = envelope_from_typed(
        orders_change_stream(spark, SF_SMOKE), db="src", table="orders"
    ).persist()
    env.count()
    return env


def test_envelope_schema(spark, orders_env):
    # nullability differs between literal-built and declared schemas;
    # names + types are the contract
    got = [(f.name, f.dataType) for f in orders_env.schema.fields]
    want = [(f.name, f.dataType) for f in ENVELOPE_SCHEMA.fields]
    assert got == want


def test_decode_roundtrip(spark, orders_env):
    """JSON envelope decode reproduces the typed rows exactly (A2-A4/A7)."""
    schema = load_table(spark, SF_SMOKE, "orders").schema
    decoded = decode_envelope(orders_env, schema, db="src", table="orders")
    orig = orders_change_stream(spark, SF_SMOKE)
    assert decoded.count() == orig.count()
    # round-trip fidelity incl. doubles and timestamps
    assert decoded.subtract(orig.select(decoded.columns)).count() == 0


def test_lww_invariants(spark, orders_env):
    """Last-writer-wins + delete tombstones + update=full-image upsert."""
    schema = load_table(spark, SF_SMOKE, "orders").schema
    decoded = decode_envelope(orders_env, schema, db="src", table="orders")
    final = apply_changes(None, decoded, ["o_orderkey"])
    orders = load_table(spark, SF_SMOKE, "orders")
    n = orders.count()
    n_deleted = orders.filter(F.col("o_orderkey") % 10 % 2 == 1).filter(
        (F.col("o_orderkey") % 10).isin(7, 9)
    ).count()
    assert final.count() == n - orders.filter((F.col("o_orderkey") % 10).isin(7, 9)).count()
    # keys ending 5 got two updates; the second (status V) must win
    v = final.filter(F.col("o_orderkey") % 10 == 5)
    assert v.count() > 0
    assert v.filter(F.col("o_orderstatus") != "V").count() == 0
    # untouched keys keep their original image
    untouched = final.filter(~(F.col("o_orderkey") % 10).isin(1, 3, 5, 7, 9))
    base = orders.filter(~(F.col("o_orderkey") % 10).isin(1, 3, 5, 7, 9))
    assert untouched.subtract(base.select(untouched.columns)).count() == 0


def test_replay_idempotent(spark, orders_env):
    """Re-applying any suffix of the stream is a no-op (invariant 4)."""
    schema = load_table(spark, SF_SMOKE, "orders").schema
    decoded = decode_envelope(orders_env, schema, db="src", table="orders").persist()
    final = apply_changes(None, decoded, ["o_orderkey"]).persist()
    # full replay
    again = apply_changes(final, decoded, ["o_orderkey"])
    assert again.subtract(final).count() == 0 and final.subtract(again).count() == 0
    # suffix replay (second half by seq)
    mid = decoded.approxQuantile("seq", [0.5], 0.0)[0]
    suffix = decoded.filter(F.col("seq") >= mid)
    after_suffix = apply_changes(final, suffix, ["o_orderkey"])
    assert after_suffix.subtract(final).count() == 0


def test_latest_by_key_matches_window(spark, orders_env):
    """max_by reduction == row_number()=1 window reduction."""
    from pyspark.sql import Window

    ev = orders_env.select("seq", "op", "data")
    keyed = ev.withColumn("k", F.get_json_object("data", "$.o_orderkey"))
    a = latest_by_key(keyed, ["k"]).select("k", "seq")
    w = Window.partitionBy("k").orderBy(F.col("seq").desc())
    b = (
        keyed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("k", "seq")
    )
    assert a.subtract(b).count() == 0 and b.subtract(a).count() == 0


def test_pk_changing_update(spark):
    """SURVEY §4.3.4: an update that changes the primary key must
    delete the old key and land the row at the new key (the reference's
    ON-DUPLICATE-KEY upsert would leak the old row — fixed by intent)."""
    import json

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [StructField("id", LongType()), StructField("v", StringType())]
    )

    def ev(op, seq, data, old=None):
        return ("db1", "t1", op, seq, None, 1, json.dumps(data), json.dumps(old) if old else None)

    env = spark.createDataFrame(
        [
            ev("insert", 1, {"id": 1, "v": "a"}),
            ev("insert", 2, {"id": 2, "v": "b"}),
            # PK move: row 1 becomes row 10
            ev("update", 3, {"id": 10, "v": "a2"}, old={"id": 1, "v": "a"}),
            # ordinary update (same PK) with old image present
            ev("update", 4, {"id": 2, "v": "b2"}, old={"id": 2, "v": "b"}),
        ],
        ENVELOPE_SCHEMA,
    )
    decoded = decode_envelope(env, schema, db="db1", table="t1", keys=["id"])
    final = apply_changes(None, decoded, ["id"]).orderBy("id")
    assert [(r.id, r.v) for r in final.collect()] == [(2, "b2"), (10, "a2")]

    # idempotent under replay, PK moves included
    again = apply_changes(final, decoded, ["id"]).orderBy("id")
    assert [(r.id, r.v) for r in again.collect()] == [(2, "b2"), (10, "a2")]


SAMPLE_TOML = """
name = "mysql2starrocks"

[input]
type = "mysql"

[[transforms]]
type = "rename-column"
[transforms.config]
match-schema = "src"
match-table = "orders"
columns = ["o_orderpriority"]
rename-as = ["priority"]

[[transforms]]
type = "delete-column"
[transforms.config]
match-schema = "src"
match-table = "orders"
columns = ["o_orderdate"]

[output]
type = "starrocks"

[[output.config.routers]]
source-schema = "src"
source-table = "orders"
target-schema = "dw"
target-table = "ods_orders"

[[output.config.routers]]
source-schema = "src"
source-table = "customer"
target-schema = "dw"
target-table = "ods_customer"
[output.config.routers.columns-mapper]
source-columns = ["c_custkey", "c_name"]
target-columns = ["id", "name"]
"""


def test_config_parse_reference_schema():
    """Accepts the reference's exact TOML shape (docs/*.toml)."""
    cfg = parse_config(SAMPLE_TOML)
    assert cfg.name == "mysql2starrocks"
    assert cfg.input_type == "mysql"
    assert cfg.output_type == "starrocks"
    assert len(cfg.transforms.transforms) == 2
    r = cfg.router_for("src", "orders")
    assert r is not None and r.target_table == "ods_orders"
    rc = cfg.router_for("src", "customer")
    assert rc.column_mapping([]) == [("c_custkey", "id"), ("c_name", "name")]
    # identity mapping when mapper omitted (core/meta.go:43-55 analog)
    assert r.column_mapping(["a", "b"]) == [("a", "a"), ("b", "b")]


def test_transform_chain(spark):
    """rename + drop + filter, gated on (schema, table), in order."""
    orders = load_table(spark, SF_SMOKE, "orders")
    chain = TransformChain(
        [
            RenameColumnTransform("src", "orders", ("o_orderpriority",), ("priority",)),
            DeleteColumnTransform("src", "orders", ("o_orderdate",)),
            FilterRowsTransform("src", "orders", "o_totalprice > 100000"),
            RenameColumnTransform("src", "other_table", ("o_custkey",), ("nope",)),
        ]
    )
    out = chain.apply("src", "orders", orders)
    assert "priority" in out.columns and "o_orderpriority" not in out.columns
    assert "o_orderdate" not in out.columns
    assert "o_custkey" in out.columns  # non-matching transform skipped
    assert out.filter(F.col("o_totalprice") <= 100000).count() == 0
    # non-matching table passes through untouched
    assert chain.apply("src", "nation", orders).columns == orders.columns


def test_build_transform_rejects_unknown():
    with pytest.raises(ValueError):
        build_transform("no-such-transform", {})


def test_rename_requires_aligned_lists():
    with pytest.raises(ValueError):
        RenameColumnTransform("s", "t", ("a", "b"), ("x",))
