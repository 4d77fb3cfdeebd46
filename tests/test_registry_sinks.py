"""Schema registry / DDL evolution (A10-A13) and sink formatter/applier
tests (A22-A30 analogs)."""

from __future__ import annotations

import json
import sqlite3

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import IntegerType, LongType, StringType, StructField, StructType

from qin_cdc_spark.cdc.registry import DdlOp, SchemaRegistry, is_online_ddl_shadow
from qin_cdc_spark.sinks.jdbc import (
    apply_batch_dbapi,
    generate_bulk_delete,
    generate_bulk_upsert,
)
from qin_cdc_spark.sinks.kafka import canal_json_value, default_json_value
from qin_cdc_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


BASE = StructType(
    [
        StructField("id", LongType(), False),
        StructField("name", StringType(), True),
        StructField("qty", IntegerType(), True),
    ]
)


def test_registry_versioning():
    reg = SchemaRegistry()
    reg.add("db", "t", BASE)
    assert reg.current_version("db", "t") == 1
    v2 = reg.apply_ddl("db", "t", DdlOp("add-column", column="note", dtype=StringType()))
    assert v2 == 2
    assert [f.name for f in reg.get("db", "t").fields] == ["id", "name", "qty", "note"]
    # old version still resolvable for in-flight rows (A10)
    assert [f.name for f in reg.get_version("db", "t", 1).fields] == ["id", "name", "qty"]


def test_registry_column_positions():
    reg = SchemaRegistry()
    reg.add("db", "t", BASE)
    reg.apply_ddl("db", "t", DdlOp("add-column", column="first_col", dtype=StringType(), position="first"))
    assert [f.name for f in reg.get("db", "t").fields][0] == "first_col"
    reg.apply_ddl("db", "t", DdlOp("add-column", column="after_id", dtype=StringType(), position="after:id"))
    names = [f.name for f in reg.get("db", "t").fields]
    assert names[names.index("id") + 1] == "after_id"
    with pytest.raises(ValueError):
        reg.apply_ddl("db", "t", DdlOp("add-column", column="x", dtype=StringType(), position="after:nope"))


def test_registry_rename_drop_modify():
    reg = SchemaRegistry()
    reg.add("db", "t", BASE)
    reg.apply_ddl("db", "t", DdlOp("rename-column", column="name", new_name="full_name"))
    assert "full_name" in [f.name for f in reg.get("db", "t").fields]
    reg.apply_ddl("db", "t", DdlOp("modify-column", column="qty", dtype=LongType()))
    assert dict((f.name, f.dataType) for f in reg.get("db", "t").fields)["qty"] == LongType()
    reg.apply_ddl("db", "t", DdlOp("drop-column", column="qty"))
    assert "qty" not in [f.name for f in reg.get("db", "t").fields]
    assert reg.current_version("db", "t") == 4
    reg.apply_ddl("db", "t", DdlOp("rename-table", new_table="t2"))
    assert ("db", "t2") in reg.tables() and ("db", "t") not in reg.tables()
    reg.apply_ddl("db", "t2", DdlOp("drop-table"))
    assert reg.tables() == []


def test_online_ddl_shadow_detection():
    """gh-ost + Aliyun DMS shadow tables (A13 regexes)."""
    for shadow in ["_orders_gho", "_orders_ghc", "_orders_del", "tp_123_ogt_t", "tp_9_del_t", "tpa_ab12_t"]:
        assert is_online_ddl_shadow(shadow), shadow
    for real in ["orders", "ghost", "tp_orders", "t_del"]:
        assert not is_online_ddl_shadow(real), real
    reg = SchemaRegistry()
    reg.add("db", "orders", BASE)
    assert reg.apply_ddl("db", "_orders_gho", DdlOp("drop-table")) is None
    assert ("db", "orders") in reg.tables()


@pytest.fixture(scope="module")
def small_changes(spark):
    cust = load_table(spark, SF_SMOKE, "customer").limit(20)
    return cust.select(
        F.when(F.col("c_custkey") % 4 == 0, "delete").otherwise("insert").alias("op"),
        F.col("c_custkey").alias("seq"),
        "c_custkey",
        "c_name",
        "c_acctbal",
    ).withColumn("ts", F.lit(None).cast("timestamp"))


def test_kafka_default_format(spark, small_changes):
    out = default_json_value(small_changes, database="src", table="customer", pk_cols=["c_custkey"])
    assert out.columns == ["key", "value"]
    row = out.first()
    msg = json.loads(row.value)
    assert msg["database"] == "src" and msg["table"] == "customer"
    assert msg["type"] in ("insert", "delete")
    assert set(msg["data"]) == {"c_custkey", "c_name", "c_acctbal"}
    assert row.key == str(msg["data"]["c_custkey"])


def test_kafka_canal_format(spark, small_changes):
    out = canal_json_value(
        small_changes,
        database="src",
        table="customer",
        pk_cols=["c_custkey"],
        raw_types={"c_custkey": "bigint(20)", "c_name": "varchar(25)"},
        emit_ts_ms=1704067200000,
    )
    msg = json.loads(out.first().value)
    # reference struct fields in marshal order (kafka_utils.go:98-114)
    assert list(msg) == [
        "database", "table", "type", "es", "ts", "data", "old", "sqlType",
        "mysqlType", "serverId", "sql", "pkNames", "isDdl", "id", "gtid",
    ]
    assert msg["pkNames"] == ["c_custkey"]
    assert msg["isDdl"] is False
    assert msg["type"] in ("INSERT", "DELETE")
    # canal carries stringified values in 1-element data arrays
    assert isinstance(msg["data"], list) and len(msg["data"]) == 1
    assert all(isinstance(v, str) for v in msg["data"][0].values())
    # the reference's OWN type switch (MySQL wire codes, base names —
    # kafka_utils.go:134-227), not java.sql.Types
    assert msg["sqlType"]["c_custkey"] == 8
    assert msg["mysqlType"]["c_name"] == "varchar"
    assert msg["old"] is None and msg["gtid"] is None
    assert msg["serverId"] == "" and msg["sql"] == ""
    assert msg["ts"] == 1704067200000
    assert msg["id"] == int(msg["data"][0]["c_custkey"])  # id carries seq (= custkey here)


def test_canal_type_switch_matches_reference():
    """The reference's TypeNumber else-branch and TypeBinary family
    (kafka_utils.go:154-157, 219-226): plain int raw types are
    sqlType 3 / "int"; blob/varbinary are 252 / "blob" while binary(N)
    keeps its own base name."""
    from qin_cdc_spark.sinks.kafka import _canal_type

    rt = {
        "a": "int(11)", "b": "integer", "c": "blob", "d": "longblob",
        "e": "varbinary(255)", "f": "binary(16)", "g": "mediumint(9)",
    }
    assert _canal_type("a", "long", rt) == (3, "int")
    assert _canal_type("b", "long", rt) == (3, "int")
    assert _canal_type("c", "binary", rt) == (252, "blob")
    assert _canal_type("d", "binary", rt) == (252, "blob")
    assert _canal_type("e", "binary", rt) == (252, "blob")
    assert _canal_type("f", "binary", rt) == (252, "binary")
    assert _canal_type("g", "long", rt) == (9, "mediumint")


def test_canal_cdf_egress_carries_preimages(spark, tmp_path):
    """cdf_canal_messages: a versioned table's change feed in the canal
    wire format — UPDATE messages carry the full preimage row as the
    1-element old array, DELETE messages name the removed row as data."""
    from qin_cdc_spark.sinks.kafka import cdf_canal_messages
    from qin_cdc_spark.streaming.versioned import VersionedBucketedTable

    tbl = VersionedBucketedTable(spark, str(tmp_path / "t"), ["k"], n_buckets=2)
    ev = spark.createDataFrame(
        [("insert", 1, 1, "a"), ("insert", 2, 2, "b")],
        "op string, seq long, k long, v string",
    )
    v1 = tbl.merge(ev, batch_id=0)
    ev2 = spark.createDataFrame(
        [("update", 3, 1, "a2"), ("delete", 4, 2, "b"), ("insert", 5, 3, "c")],
        "op string, seq long, k long, v string",
    )
    v2 = tbl.merge(ev2, batch_id=1)
    out = {
        json.loads(r.value)["type"]: json.loads(r.value)
        for r in cdf_canal_messages(
            tbl, v1, v2, database="src", table_name="t"
        ).collect()
    }
    assert set(out) == {"INSERT", "UPDATE", "DELETE"}
    upd = out["UPDATE"]
    assert upd["data"] == [{"k": "1", "v": "a2"}]
    assert upd["old"] == [{"k": "1", "v": "a"}]      # full preimage row
    dele = out["DELETE"]
    assert dele["data"] == [{"k": "2", "v": "b"}]    # removed row named
    assert dele["old"] is None
    ins = out["INSERT"]
    assert ins["data"] == [{"k": "3", "v": "c"}] and ins["old"] is None


def test_bulk_upsert_sql_mysql_dialect():
    sql, params = generate_bulk_upsert(
        "t", ["id", "v"], ["id"], [[1, "a"], [2, "b"]], dialect="mysql"
    )
    assert sql == (
        "INSERT INTO `t` (`id`, `v`) VALUES (?, ?), (?, ?) "
        "ON DUPLICATE KEY UPDATE `v`=VALUES(`v`)"
    )
    assert params == [1, "a", 2, "b"]


def test_bulk_delete_sql():
    sql, params = generate_bulk_delete("t", ["id"], [[1], [2], [3]])
    assert sql == "DELETE FROM `t` WHERE `id` IN (?, ?, ?)"
    assert params == [1, 2, 3]
    # multi-PK binds values from the row image (reference bug fixed,
    # SURVEY §4.3.2)
    sql, params = generate_bulk_delete("t", ["a", "b"], [[1, 10], [2, 20]])
    assert sql == "DELETE FROM `t` WHERE (`a` = ? AND `b` = ?) OR (`a` = ? AND `b` = ?)"
    assert params == [1, 10, 2, 20]


def test_apply_batch_to_sqlite(spark, tmp_path):
    """End-to-end relational apply: LWW-reduce + delete/upsert through a
    real DB-API connection (sqlite as the JDBC stand-in)."""
    db = str(tmp_path / "sink.db")
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE tgt (id INTEGER PRIMARY KEY, v TEXT)")
    conn.execute("INSERT INTO tgt VALUES (1, 'old'), (99, 'keep')")
    conn.commit()
    conn.close()

    changes = spark.createDataFrame(
        [
            ("insert", 1, 1, "a"),
            ("update", 2, 1, "b"),   # same key: seq 2 wins
            ("insert", 3, 2, "x"),
            ("delete", 4, 2, None),  # then deleted
            ("insert", 5, 3, "z"),
        ],
        ["op", "seq", "id", "v"],
    ).coalesce(1)

    apply_batch_dbapi(
        changes,
        table="tgt",
        pk_cols=["id"],
        connect=lambda: sqlite3.connect(db),
        dialect="sqlite",
    )
    conn = sqlite3.connect(db)
    got = dict(conn.execute("SELECT id, v FROM tgt ORDER BY id").fetchall())
    conn.close()
    assert got == {1: "b", 3: "z", 99: "keep"}
