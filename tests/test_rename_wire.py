"""Rename fidelity over the wire (VERDICT r8 #1): an upstream
RENAME COLUMN crosses store → wire → store as a RENAME — historical
values intact at every hop — instead of the name-based diff's DROP+ADD
(which nulled old rows downstream).  The reference carries the raw
statement as a first-class event (core/msg.go:49-53) and its parser
applies renames as metadata (metas/mysql_ddl_parse.go:200-260); here
the statement forwards verbatim (re-rendered canonically) through the
egress feed, and every local store applies a value-preserving column
rename."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pytest

from qin_cdc_spark.cdc.envelope import ENVELOPE_SCHEMA, envelope_from_typed
from qin_cdc_spark.streaming.cdc_stream import (
    BucketedUpsertTable,
    CdcStreamRoute,
    ParquetUpsertTable,
    envelope_from_canal_egress,
)
from qin_cdc_spark.streaming.versioned import VersionedBucketedTable

RENAME_SQL = "ALTER TABLE `src`.`t` RENAME COLUMN `v` TO `w`"


def _old(spark, rows):
    return spark.createDataFrame(rows, "op string, seq long, k long, v string")


def _new(spark, rows):
    return spark.createDataFrame(rows, "op string, seq long, k long, w string")


def _ddl_env(spark, seq, sql, db="src", table="t"):
    return spark.createDataFrame(
        [(db, table, "ddl", seq, None, None, sql, None)], ENVELOPE_SCHEMA
    )


B1 = [("insert", 1, 1, "a"), ("insert", 2, 2, "b")]
B2 = [("update", 4, 1, "a2"), ("insert", 5, 3, "c")]


def test_versioned_rename_preserves_values_and_history(spark, tmp_path):
    tbl = VersionedBucketedTable(spark, str(tmp_path / "t"), ["k"], n_buckets=4)
    v1 = tbl.merge(_old(spark, B1))
    v2 = tbl.rename_columns({"v": "w"})
    assert v2 == v1 + 1
    # values survive under the new name
    assert {(r.k, r.w) for r in tbl.read().collect()} == {(1, "a"), (2, "b")}
    # time travel is honest: the old snapshot keeps its old names
    assert {(r.k, r.v) for r in tbl.read_at(v1).collect()} == {(1, "a"), (2, "b")}
    # CDF across the rename boundary: the pre side aligns through the
    # recorded rename, so the update's preimage lands under _pre_w
    v3 = tbl.merge(_new(spark, B2))
    cdf = {
        (r._change, r.k): r
        for r in tbl.changes_between(v1, v3, include_preimage=True).collect()
    }
    assert cdf[("update", 1)].w == "a2" and cdf[("update", 1)]._pre_w == "a"
    assert cdf[("insert", 3)].w == "c"
    # the rename-only version contributes no DML changes
    assert tbl.changes_between(v1, v2, include_preimage=True).count() == 0
    # replay idempotence: re-applying mints no version, errors nothing
    assert tbl.rename_columns({"v": "w"}) == v3
    # unknown column in both shapes is loud
    with pytest.raises(ValueError, match="not found"):
        tbl.rename_columns({"nope": "x"})


def test_versioned_rename_key_column(spark, tmp_path):
    tbl = VersionedBucketedTable(spark, str(tmp_path / "t"), ["k"], n_buckets=4)
    v1 = tbl.merge(_old(spark, B1))
    tbl.rename_columns({"k": "id"})
    assert tbl.keys == ["id"] and tbl.bucket_cols == ["id"]
    # LWW continues under the new key name; placement is value-hashed
    tbl.merge(
        spark.createDataFrame(
            [("update", 4, 1, "a2")], "op string, seq long, id long, v string"
        )
    )
    assert {(r.id, r.v) for r in tbl.read().collect()} == {(1, "a2"), (2, "b")}
    # CDF spanning the key rename joins on the aligned key
    cdf = {
        (r._change, r.id): r
        for r in tbl.changes_between(
            v1, tbl.current_version(), include_preimage=True
        ).collect()
    }
    assert cdf[("update", 1)]._pre_v == "a"
    # point lookup under the new key still prunes to one bucket
    assert tbl.read_key([2]).collect()[0].v == "b"


def test_flat_and_bucketed_target_rename(spark, tmp_path):
    for cls, name in ((ParquetUpsertTable, "flat"), (BucketedUpsertTable, "b")):
        tbl = cls(spark, str(tmp_path / name), ["k"])
        tbl.merge(_old(spark, B1))
        tbl.rename_columns({"v": "w"})
        tbl.merge(_new(spark, B2))
        got = {(r.k, r.w) for r in tbl.read().collect()}
        assert got == {(1, "a2"), (2, "b"), (3, "c")}, name
        # replay skip + loud unknown
        tbl.rename_columns({"v": "w"})
        with pytest.raises(ValueError, match="not found"):
            tbl.rename_columns({"zz": "q"})


def test_route_segments_inband_ddl_at_its_seq(spark, tmp_path):
    """ONE batch carrying pre-rename rows, the DDL row, and post-rename
    rows: rows before the DDL's seq decode under the old schema, rows
    after under the new — and the old rows' values survive into the
    renamed column (at-batch-start application would null them)."""
    schema0 = _old(spark, B1).drop("op", "seq").schema
    route = CdcStreamRoute(
        spark, db="src", table="t", schema=schema0, keys=["k"],
        target_path=str(tmp_path / "t"), n_buckets=4,
    )
    env = (
        envelope_from_typed(_old(spark, B1), db="src", table="t")
        .unionByName(_ddl_env(spark, 3, RENAME_SQL))
        .unionByName(envelope_from_typed(_new(spark, B2), db="src", table="t"))
    )
    route.apply_batch_with_ddl(env, batch_id=0)
    got = {(r.k, r.w) for r in route.bind_target().read().collect()}
    assert got == {(1, "a2"), (2, "b"), (3, "c")}
    assert [f.name for f in route.schema.fields] == ["k", "w"]
    # in-session redelivery: the schema rewinds, segments decode under
    # the same vintages, the merge converges to the same state
    route.apply_batch_with_ddl(env, batch_id=0)
    assert {(r.k, r.w) for r in route.bind_target().read().collect()} == got


def test_route_rename_maintains_history_store(spark, tmp_path):
    """history=true routes rename the SCD2 store too — closed versions
    keep their values under the new name."""
    schema0 = _old(spark, B1).drop("op", "seq").schema
    route = CdcStreamRoute(
        spark, db="src", table="t", schema=schema0, keys=["k"],
        target_path=str(tmp_path / "t"), n_buckets=4,
        history_path=str(tmp_path / "h"),
    )
    route.apply_batch(
        envelope_from_typed(_old(spark, B1), db="src", table="t"), batch_id=0
    )
    env2 = _ddl_env(spark, 3, RENAME_SQL).unionByName(
        envelope_from_typed(_new(spark, B2), db="src", table="t")
    )
    route.apply_batch_with_ddl(env2, batch_id=1)
    hist = {
        (r.k, r.valid_from, r.w)
        for r in route.bind_history().read_history().collect()
    }
    # k=1's CLOSED first version keeps its value under the new name
    assert (1, 1, "a") in hist and (1, 4, "a2") in hist and (3, 5, "c") in hist


def test_egress_forwards_rename_verbatim(spark, tmp_path):
    """The emitted control message carries the RENAME (never DROP+ADD),
    and a relay consumer applying the wire feed preserves the old rows'
    values — the full store → wire → store chain."""
    schema0 = _old(spark, B1).drop("op", "seq").schema
    route_a = CdcStreamRoute(
        spark, db="src", table="t", schema=schema0, keys=["k"],
        target_path=str(tmp_path / "a"), n_buckets=4, versioned=True,
        egress_format="canal",
    )
    route_a.apply_batch(
        envelope_from_typed(_old(spark, B1), db="src", table="t"), batch_id=0
    )
    env2 = _ddl_env(spark, 3, RENAME_SQL).unionByName(
        envelope_from_typed(_new(spark, B2), db="src", table="t")
    )
    route_a.apply_batch_with_ddl(env2, batch_id=1)
    msgs = [json.loads(r.value) for r in route_a.read_egress().collect()]
    ddl = [m for m in msgs if m["isDdl"]]
    assert len(ddl) == 1
    assert ddl[0]["sql"] == "ALTER TABLE `src`.`t` RENAME COLUMN `v` TO `w`"
    assert "DROP COLUMN" not in ddl[0]["sql"]
    # consumer: seeded with the pre-DDL schema, evolves from the wire
    route_b = CdcStreamRoute(
        spark, db="src", table="t", schema=schema0, keys=["k"],
        target_path=str(tmp_path / "b"), n_buckets=4,
    )
    route_b.apply_batch_with_ddl(
        envelope_from_canal_egress(route_a.read_egress()), batch_id=0
    )
    got = {(r.k, r.w) for r in route_b.bind_target().read().collect()}
    # k=2 never re-appeared after the rename: DROP+ADD would null it
    assert got == {(1, "a2"), (2, "b"), (3, "c")}


def test_egress_residual_diff_composes_with_verbatim(spark, tmp_path):
    """Schema movement the forwarded DDL does NOT explain (here an
    added column arriving without a DDL row) still emits as the
    synthesized residual, in the same control message after the
    verbatim statements."""
    schema0 = _old(spark, B1).drop("op", "seq").schema
    route_a = CdcStreamRoute(
        spark, db="src", table="t", schema=schema0, keys=["k"],
        target_path=str(tmp_path / "a"), n_buckets=4, versioned=True,
        egress_format="default",
    )
    route_a.apply_batch(
        envelope_from_typed(_old(spark, B1), db="src", table="t"), batch_id=0
    )
    b2 = spark.createDataFrame(
        [("update", 4, 1, "a2", 7), ("insert", 5, 3, "c", 9)],
        "op string, seq long, k long, w string, x long",
    )
    env2 = _ddl_env(spark, 3, RENAME_SQL).unionByName(
        envelope_from_typed(b2, db="src", table="t")
    )
    # the untracked column rides in via a manual schema widen (a
    # transform change in real life), on top of the in-band rename
    from pyspark.sql.types import LongType, StructField, StructType

    route_a.schema = StructType(
        [*schema0.fields, StructField("x", LongType())]
    )
    route_a.apply_batch_with_ddl(env2, batch_id=1)
    msgs = [json.loads(r.value) for r in route_a.read_egress().collect()]
    ddl = [m for m in msgs if m["type"] == "ddl"]
    assert len(ddl) == 1
    sql = ddl[0]["data"]["sql"]
    assert sql.index("RENAME COLUMN `v` TO `w`") < sql.index("ADD COLUMN `x`")
    assert "DROP COLUMN" not in sql
    # the consumer's registry lands exactly on the producer's schema
    from qin_cdc_spark.cdc.registry import SchemaRegistry
    from qin_cdc_spark.streaming.cdc_stream import (
        envelope_from_egress,
        handle_ddl_rows,
    )

    reg = SchemaRegistry()
    reg.add("src", "t", schema0)
    handle_ddl_rows(envelope_from_egress(route_a.read_egress()), reg)
    assert [f.name for f in reg.get("src", "t").fields] == ["k", "w", "x"]


def test_rename_relay_through_structured_streaming(spark, tmp_path):
    """The full streaming machinery: a registry-managed stream whose
    second micro-batch carries the DDL row AND post-rename DML —
    process_batch routes the DDL into the segmentation path, the store
    renames in place, and pre-rename rows keep their values."""
    from qin_cdc_spark.cdc.registry import SchemaRegistry
    from qin_cdc_spark.streaming.cdc_stream import start_cdc_stream

    env_dir = str(tmp_path / "env")
    os.makedirs(env_dir)
    envelope_from_typed(_old(spark, B1), db="src", table="t").coalesce(
        1
    ).write.parquet(f"{env_dir}/tmp0")
    b2 = _ddl_env(spark, 3, RENAME_SQL).unionByName(
        envelope_from_typed(_new(spark, B2), db="src", table="t")
    )
    b2.coalesce(1).write.parquet(f"{env_dir}/tmp1")
    for i in (0, 1):
        src = next(
            f for f in os.listdir(f"{env_dir}/tmp{i}") if f.endswith(".parquet")
        )
        os.rename(f"{env_dir}/tmp{i}/{src}", f"{env_dir}/f{i}.parquet")
        import shutil

        shutil.rmtree(f"{env_dir}/tmp{i}")
    schema0 = _old(spark, B1).drop("op", "seq").schema
    reg = SchemaRegistry()
    reg.add("src", "t", schema0)
    route = CdcStreamRoute(
        spark, db="src", table="t", schema=schema0, keys=["k"],
        target_path=str(tmp_path / "t"), n_buckets=4,
    )
    stream = (
        spark.readStream.schema(ENVELOPE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(env_dir)
    )
    q = start_cdc_stream(
        spark, stream, [route],
        checkpoint_dir=str(tmp_path / "ckpt"), registry=reg,
    )
    q.awaitTermination()
    assert [f.name for f in reg.get("src", "t").fields] == ["k", "w"]
    got = {(r.k, r.w) for r in route.bind_target().read().collect()}
    assert got == {(1, "a2"), (2, "b"), (3, "c")}


def test_scd2_rename_refuses_interval_columns(spark, tmp_path):
    from qin_cdc_spark.streaming.scd2 import ScdType2Table

    scd = ScdType2Table(spark, str(tmp_path / "h"), keys=["k"], n_buckets=4)
    with pytest.raises(ValueError, match="interval columns"):
        scd.rename_columns({"valid_from": "vf"})


def test_partitioned_rename_and_cdf_across_boundary(spark, tmp_path):
    """Partitioned targets rename too: every live partition's sub-store
    renames in place, ONE parent flip publishes atomically, and a
    parent-range CDF spanning the rename (including a dropped
    partition's deletes rendered from a pre-rename generation) aligns
    forward to the new names."""
    from qin_cdc_spark.streaming.partitioned import PartitionedVersionedTable

    tbl = PartitionedVersionedTable(
        spark, str(tmp_path / "t"), ["k"], partition_col="y", n_buckets=2
    )
    v1 = tbl.merge(
        spark.createDataFrame(
            [("insert", 1, 1, 2023, "a"), ("insert", 2, 2, 2024, "b")],
            "op string, seq long, k long, y int, v string",
        ),
        batch_id=0,
    )
    tbl.rename_columns({"v": "w"})
    with pytest.raises(ValueError, match="partition column"):
        tbl.rename_columns({"y": "year"})
    assert {(r.k, r.y, r.w) for r in tbl.read().collect()} == {
        (1, 2023, "a"), (2, 2024, "b")
    }
    # post-rename merge under the new name, then drop the 2023 partition
    tbl.merge(
        spark.createDataFrame(
            [("update", 3, 2, 2024, "b2")],
            "op string, seq long, k long, y int, w string",
        ),
        batch_id=1,
    )
    v_drop = tbl.drop_partitions([2023])
    cdf = {
        (r._change, r.k): r
        for r in tbl.changes_between(v1, v_drop, include_preimage=True).collect()
    }
    # the dropped partition's delete renders under the NEW name with
    # the old value as preimage; the update aligns through the sub CDF
    assert cdf[("delete", 1)]._pre_w == "a" and cdf[("delete", 1)].w is None
    assert cdf[("update", 2)].w == "b2" and cdf[("update", 2)]._pre_w == "b"


def test_partitioned_route_rename_over_the_wire(spark, tmp_path):
    """A partitioned route applies an in-band RENAME and forwards it
    verbatim through its egress (the parent-level ddl ledger)."""
    schema0 = _old(spark, B1).drop("op", "seq").schema
    from pyspark.sql.types import IntegerType, StructField, StructType

    schema_y = StructType([*schema0.fields, StructField("y", IntegerType())])
    route = CdcStreamRoute(
        spark, db="src", table="t", schema=schema_y, keys=["k"],
        target_path=str(tmp_path / "t"), n_buckets=2,
        partition_col="y", egress_format="default",
    )
    b1 = spark.createDataFrame(
        [("insert", 1, 1, "a", 2024), ("insert", 2, 2, "b", 2024)],
        "op string, seq long, k long, v string, y int",
    )
    route.apply_batch(envelope_from_typed(b1, db="src", table="t"), batch_id=0)
    b2 = spark.createDataFrame(
        [("update", 4, 1, "a2", 2024)],
        "op string, seq long, k long, w string, y int",
    )
    env2 = _ddl_env(spark, 3, RENAME_SQL).unionByName(
        envelope_from_typed(b2, db="src", table="t")
    )
    route.apply_batch_with_ddl(env2, batch_id=1)
    got = {(r.k, r.w) for r in route.bind_target().read().collect()}
    assert got == {(1, "a2"), (2, "b")}
    msgs = [json.loads(r.value) for r in route.read_egress().collect()]
    ddl = [m for m in msgs if m["type"] == "ddl"]
    assert len(ddl) == 1
    assert "RENAME COLUMN `v` TO `w`" in ddl[0]["data"]["sql"]
    assert "DROP COLUMN" not in ddl[0]["data"]["sql"]


def test_pending_ddl_lost_falls_back_to_diff(spark, tmp_path):
    """A statement lost to a crash between merge and ledger-attach must
    DEGRADE (rename crosses as DROP+ADD for that emission), never
    vanish: the residual diff still reports the schema movement, so
    the consumer registry cannot silently diverge."""
    schema0 = _old(spark, B1).drop("op", "seq").schema
    route = CdcStreamRoute(
        spark, db="src", table="t", schema=schema0, keys=["k"],
        target_path=str(tmp_path / "a"), n_buckets=4, versioned=True,
        egress_format="default",
    )
    route.apply_batch(
        envelope_from_typed(_old(spark, B1), db="src", table="t"), batch_id=0
    )
    env2 = _ddl_env(spark, 3, RENAME_SQL).unionByName(
        envelope_from_typed(_new(spark, B2), db="src", table="t")
    )
    # simulate the crash window: the attach never lands
    tgt = route.bind_target()
    real_attach = tgt.attach_ddl
    tgt.attach_ddl = lambda sqls: None
    try:
        route.apply_batch_with_ddl(env2, batch_id=1)
    finally:
        tgt.attach_ddl = real_attach
    msgs = [json.loads(r.value) for r in route.read_egress().collect()]
    ddl = [m for m in msgs if m["type"] == "ddl"]
    assert len(ddl) == 1
    sql = ddl[0]["data"]["sql"]
    # no verbatim statement survived — the diff fallback reports the
    # movement as ADD `w` + DROP `v` (lossy but never silent)
    assert "ADD COLUMN `w`" in sql and "DROP COLUMN `v`" in sql
    assert "RENAME" not in sql


def test_change_column_rename_plus_retype_chain(spark, tmp_path):
    """CHANGE COLUMN = rename + retype in ONE upstream statement: the
    store renames value-preservingly, the retype rides the aligned
    merge, the wire forwards the CHANGE verbatim, and the consumer
    lands on the producer's exact schema with history intact."""
    schema0 = spark.createDataFrame(
        [(1, "10")], "k long, v string"
    ).schema
    route_a = CdcStreamRoute(
        spark, db="src", table="t", schema=schema0, keys=["k"],
        target_path=str(tmp_path / "a"), n_buckets=4, versioned=True,
        egress_format="default",
    )
    b1 = spark.createDataFrame(
        [("insert", 1, 1, "10"), ("insert", 2, 2, "20")],
        "op string, seq long, k long, v string",
    )
    route_a.apply_batch(envelope_from_typed(b1, db="src", table="t"), batch_id=0)
    change_sql = "ALTER TABLE `src`.`t` CHANGE COLUMN `v` `w` bigint"
    b2 = spark.createDataFrame(
        [("update", 4, 1, 11)], "op string, seq long, k long, w long"
    )
    env2 = _ddl_env(spark, 3, change_sql).unionByName(
        envelope_from_typed(b2, db="src", table="t")
    )
    route_a.apply_batch_with_ddl(env2, batch_id=1)
    # producer: renamed AND retyped, values intact ("20" cast to 20)
    got = {(r.k): r.w for r in route_a.bind_target().read().collect()}
    assert got == {1: 11, 2: 20}
    assert dict((f.name, f.dataType.simpleString()) for f in route_a.schema.fields) == {
        "k": "bigint", "w": "bigint"
    }
    # the wire carries the CHANGE verbatim
    msgs = [json.loads(r.value) for r in route_a.read_egress().collect()]
    ddl = [m for m in msgs if m["type"] == "ddl"]
    assert len(ddl) == 1 and "CHANGE COLUMN `v` `w` bigint" in ddl[0]["data"]["sql"]
    # consumer chain: seeded pre-DDL, ends on the producer's schema
    route_b = CdcStreamRoute(
        spark, db="src", table="t", schema=schema0, keys=["k"],
        target_path=str(tmp_path / "b"), n_buckets=4,
    )
    from qin_cdc_spark.streaming.cdc_stream import envelope_from_egress

    route_b.apply_batch_with_ddl(envelope_from_egress(route_a.read_egress()), batch_id=0)
    got_b = {(r.k): r.w for r in route_b.bind_target().read().collect()}
    assert got_b == {1: 11, 2: 20}
    assert route_b.bind_target().read().schema["w"].dataType.simpleString() == "bigint"


# -- ADVICE r9: legal upstream DDL sequences the snapshot validation
# -- rejected (retype-only CHANGE, rename-before-materialize, freed-name
# -- chains) ------------------------------------------------------------


def test_retype_only_change_column_is_not_a_rename(spark, tmp_path):
    """`CHANGE COLUMN v v bigint` — MySQL's standard retype idiom —
    parses with new_name == column.  The identity entry must NOT reach
    the store as a {v: v} rename (round-9 code raised 'target column
    already exists' and killed the route); the retype itself rides the
    aligned merge."""
    schema0 = spark.createDataFrame([(1, "10")], "k long, v string").schema
    route = CdcStreamRoute(
        spark, db="src", table="t", schema=schema0, keys=["k"],
        target_path=str(tmp_path / "t"), n_buckets=4,
    )
    b1 = spark.createDataFrame(
        [("insert", 1, 1, "10"), ("insert", 2, 2, "20")],
        "op string, seq long, k long, v string",
    )
    route.apply_batch(envelope_from_typed(b1, db="src", table="t"), batch_id=0)
    retype_sql = "ALTER TABLE `src`.`t` CHANGE COLUMN `v` `v` bigint"
    b2 = spark.createDataFrame(
        [("update", 4, 1, 11)], "op string, seq long, k long, v long"
    )
    env2 = _ddl_env(spark, 3, retype_sql).unionByName(
        envelope_from_typed(b2, db="src", table="t")
    )
    route.apply_batch_with_ddl(env2, batch_id=1)
    got = {r.k: r.v for r in route.bind_target().read().collect()}
    assert got == {1: 11, 2: 20}
    assert route.schema["v"].dataType.simpleString() == "bigint"
    # the retype forwards verbatim; no rename was recorded
    assert route.apply_ddl_statements([retype_sql]) == {}


def test_add_then_rename_before_any_merge_materializes(spark, tmp_path):
    """ADD COLUMN x then RENAME x TO y inside the same publication,
    before any merge materialized x: the store holds NEITHER name, the
    decode schema already evolved, so the store-side rename must skip
    (round-9 code raised \"column 'x' not found\") and the merge lands
    the data under the new name."""
    schema0 = spark.createDataFrame([(1, "a")], "k long, v string").schema
    route = CdcStreamRoute(
        spark, db="src", table="t", schema=schema0, keys=["k"],
        target_path=str(tmp_path / "t"), n_buckets=4,
    )
    route.apply_batch(
        envelope_from_typed(_old(spark, B1), db="src", table="t"), batch_id=0
    )
    b2 = spark.createDataFrame(
        [("update", 6, 1, "a2", 7), ("insert", 7, 3, "c", 9)],
        "op string, seq long, k long, v string, y long",
    )
    env2 = (
        _ddl_env(spark, 3, "ALTER TABLE `src`.`t` ADD COLUMN `x` bigint")
        .unionByName(
            _ddl_env(spark, 4, "ALTER TABLE `src`.`t` RENAME COLUMN `x` TO `y`")
        )
        .unionByName(envelope_from_typed(b2, db="src", table="t"))
    )
    route.apply_batch_with_ddl(env2, batch_id=1)
    got = {(r.k, r.v, r.y) for r in route.bind_target().read().collect()}
    assert got == {(1, "a2", 7), (2, "b", None), (3, "c", 9)}
    assert [f.name for f in route.schema.fields] == ["k", "v", "y"]


def test_add_then_rename_one_joined_statement(spark, tmp_path):
    """The same sequence as ONE ;-joined control message (a single
    egress DDL row can span both statements): the cumulative rename map
    sees a column the store never held — skip, not crash."""
    schema0 = spark.createDataFrame([(1, "a")], "k long, v string").schema
    route = CdcStreamRoute(
        spark, db="src", table="t", schema=schema0, keys=["k"],
        target_path=str(tmp_path / "t"), n_buckets=4,
    )
    route.apply_batch(
        envelope_from_typed(_old(spark, B1), db="src", table="t"), batch_id=0
    )
    joined = (
        "ALTER TABLE `src`.`t` ADD COLUMN `x` bigint; "
        "ALTER TABLE `src`.`t` RENAME COLUMN `x` TO `y`"
    )
    b2 = spark.createDataFrame(
        [("insert", 5, 3, "c", 9)], "op string, seq long, k long, v string, y long"
    )
    env2 = _ddl_env(spark, 3, joined).unionByName(
        envelope_from_typed(b2, db="src", table="t")
    )
    route.apply_batch_with_ddl(env2, batch_id=1)
    got = {(r.k, r.y) for r in route.bind_target().read().collect()}
    assert got == {(1, None), (2, None), (3, 9)}
    assert [f.name for f in route.schema.fields] == ["k", "v", "y"]


def test_freed_name_chain_applies_and_replays(spark, tmp_path):
    """RENAME a TO b then RENAME c TO a in one mapping — sequentially
    legal upstream (the second statement reuses the freed name) but
    rejected by round-9's pre-rename-snapshot validation.  Both store
    shapes apply it in order, and a full replay of the same mapping
    no-ops instead of raising."""
    flat = ParquetUpsertTable(spark, str(tmp_path / "flat"), ["k"])
    ver = VersionedBucketedTable(spark, str(tmp_path / "ver"), ["k"], n_buckets=4)
    rows = spark.createDataFrame(
        [("insert", 1, 1, "A", "C")], "op string, seq long, k long, a string, c string"
    )
    for tbl in (flat, ver):
        tbl.merge(rows)
        tbl.rename_columns({"a": "b", "c": "a"})
        got = tbl.read().collect()[0]
        assert (got.b, got.a) == ("A", "C")
        # replay of the full chain: freed-name reuse means the naive
        # first-entry check sees `b` occupied — must detect the replay
        tbl.rename_columns({"a": "b", "c": "a"})
        got = tbl.read().collect()[0]
        assert (got.b, got.a) == ("A", "C")
    # a TRUE collision still raises: `b` exists and nothing frees it
    with pytest.raises(ValueError, match="already exists"):
        flat.rename_columns({"b": "a"})


def test_plan_rename_steps_unit():
    from qin_cdc_spark.streaming.rename_plan import plan_rename_steps

    cols = {"k", "v"}
    assert plan_rename_steps(cols, {"v": "v"}) == []  # identity retype
    assert plan_rename_steps(cols, {"v": "w"}) == [("v", "w")]
    assert plan_rename_steps({"k", "w"}, {"v": "w"}) == []  # replay
    # missing both names: loud by default, skipped when the route vouches
    with pytest.raises(ValueError, match="not found"):
        plan_rename_steps(cols, {"x": "y"})
    assert plan_rename_steps(cols, {"x": "y"}, missing_ok=True) == []
    # freed-name chain fresh vs replayed vs true conflict
    assert plan_rename_steps({"k", "a", "c"}, {"a": "b", "c": "a"}) == [
        ("a", "b"), ("c", "a")
    ]
    assert plan_rename_steps({"k", "b", "a"}, {"a": "b", "c": "a"}) == []
    with pytest.raises(ValueError, match="already exists"):
        plan_rename_steps({"k", "a", "b"}, {"a": "b"})


# -- RENAME TABLE forwarding (VERDICT r9 #3): a routing change, not a
# -- schema one — the route re-binds, the wire forwards verbatim -------


def test_rename_table_rebinds_route_mid_batch(spark, tmp_path):
    """An in-band RENAME TABLE re-binds the route to the new upstream
    name while it keeps applying to the SAME store: pre-rename keys
    still LWW-resolve against post-rename events, and a replayed batch
    converges (the rewind restores the pre-batch binding)."""
    schema0 = _old(spark, B1).drop("op", "seq").schema
    route = CdcStreamRoute(
        spark, db="src", table="t", schema=schema0, keys=["k"],
        target_path=str(tmp_path / "t"), n_buckets=4,
    )
    route.apply_batch(
        envelope_from_typed(_old(spark, B1), db="src", table="t"), batch_id=0
    )
    env2 = _ddl_env(
        spark, 3, "RENAME TABLE `src`.`t` TO `src`.`t2`"
    ).unionByName(
        envelope_from_typed(_old(spark, B2), db="src", table="t2")
    )
    route.apply_batch_with_ddl(env2, batch_id=1)
    assert route.table == "t2"
    got = {(r.k, r.v) for r in route.bind_target().read().collect()}
    # k=1 updated under the NEW table name resolves over its old row;
    # k=2 (pre-rename only) survives untouched
    assert got == {(1, "a2"), (2, "b"), (3, "c")}
    # redelivery: binding rewinds, segments re-decode, state converges
    route.apply_batch_with_ddl(env2, batch_id=1)
    assert route.table == "t2"
    assert {(r.k, r.v) for r in route.bind_target().read().collect()} == got


def test_rename_table_forwards_over_the_wire(spark, tmp_path):
    """Producer ledgers the RENAME TABLE and forwards it verbatim in
    the egress control message; a relay consumer bound to the OLD name
    re-binds from the wire alone and its pre-rename keys LWW-resolve
    post-rename — the reference parses RENAME TABLE and re-keys its
    registry (metas/mysql_ddl_parse.go:378-505,
    inputs/mysql/mysql_meta.go:108-133) but its kafka output drops DDL
    entirely (outputs/kafka/kafka_utils.go:112); this closes the loop."""
    schema0 = _old(spark, B1).drop("op", "seq").schema
    route_a = CdcStreamRoute(
        spark, db="src", table="t", schema=schema0, keys=["k"],
        target_path=str(tmp_path / "a"), n_buckets=4, versioned=True,
        egress_format="default",
    )
    route_a.apply_batch(
        envelope_from_typed(_old(spark, B1), db="src", table="t"), batch_id=0
    )
    env2 = _ddl_env(
        spark, 3, "RENAME TABLE `src`.`t` TO `src`.`t2`"
    ).unionByName(
        envelope_from_typed(_old(spark, B2), db="src", table="t2")
    )
    route_a.apply_batch_with_ddl(env2, batch_id=1)
    assert route_a.table == "t2"
    msgs = [json.loads(r.value) for r in route_a.read_egress().collect()]
    ddl = [m for m in msgs if m["type"] == "ddl"]
    assert len(ddl) == 1
    assert ddl[0]["data"]["sql"] == "RENAME TABLE `src`.`t` TO `src`.`t2`"
    # post-rename DML messages publish under the new name
    assert {m["table"] for m in msgs if m["type"] != "ddl"} >= {"t", "t2"}

    from qin_cdc_spark.streaming.cdc_stream import envelope_from_egress

    route_b = CdcStreamRoute(
        spark, db="src", table="t", schema=schema0, keys=["k"],
        target_path=str(tmp_path / "b"), n_buckets=4,
    )
    route_b.apply_batch_with_ddl(
        envelope_from_egress(route_a.read_egress()), batch_id=0
    )
    assert route_b.table == "t2"
    got = {(r.k, r.v) for r in route_b.bind_target().read().collect()}
    assert got == {(1, "a2"), (2, "b"), (3, "c")}


def test_rename_table_composes_with_column_ddl_in_one_window(spark, tmp_path):
    """ALTER ADD COLUMN, then RENAME TABLE, then post-rename DML — one
    emission window: the forwarded statements requalify under the name
    the feed had AT EACH STATEMENT (the ALTER under the old table, the
    rename bridging old→new), the residual diff stays empty, and the
    consumer lands on the producer's schema AND binding."""
    schema0 = _old(spark, B1).drop("op", "seq").schema
    route_a = CdcStreamRoute(
        spark, db="src", table="t", schema=schema0, keys=["k"],
        target_path=str(tmp_path / "a"), n_buckets=4, versioned=True,
        egress_format="default",
    )
    route_a.apply_batch(
        envelope_from_typed(_old(spark, B1), db="src", table="t"), batch_id=0
    )
    b2 = spark.createDataFrame(
        [("update", 6, 1, "a2", 7), ("insert", 7, 3, "c", 9)],
        "op string, seq long, k long, v string, x long",
    )
    env2 = (
        _ddl_env(spark, 3, "ALTER TABLE `src`.`t` ADD COLUMN `x` bigint")
        .unionByName(_ddl_env(spark, 4, "RENAME TABLE `src`.`t` TO `src`.`t2`"))
        .unionByName(envelope_from_typed(b2, db="src", table="t2"))
    )
    route_a.apply_batch_with_ddl(env2, batch_id=1)
    msgs = [json.loads(r.value) for r in route_a.read_egress().collect()]
    ddl = [m for m in msgs if m["type"] == "ddl"]
    assert len(ddl) == 1
    sql = ddl[0]["data"]["sql"]
    assert "ALTER TABLE `src`.`t` ADD COLUMN `x` bigint" in sql
    assert "RENAME TABLE `src`.`t` TO `src`.`t2`" in sql
    assert sql.index("ADD COLUMN") < sql.index("RENAME TABLE")
    assert "DROP COLUMN" not in sql  # residual stayed empty

    from qin_cdc_spark.streaming.cdc_stream import envelope_from_egress

    route_b = CdcStreamRoute(
        spark, db="src", table="t", schema=schema0, keys=["k"],
        target_path=str(tmp_path / "b"), n_buckets=4,
    )
    route_b.apply_batch_with_ddl(
        envelope_from_egress(route_a.read_egress()), batch_id=0
    )
    assert route_b.table == "t2"
    assert [f.name for f in route_b.schema.fields] == ["k", "v", "x"]
    got = {(r.k, r.v, r.x) for r in route_b.bind_target().read().collect()}
    assert got == {(1, "a2", 7), (2, "b", None), (3, "c", 9)}


def test_column_swap_single_alter_statement(spark, tmp_path):
    """A column SWAP via one legal ALTER (`RENAME a TO zz, b TO a,
    zz TO b`) chain-collapses to the CYCLIC net mapping {a: b, b: a} —
    no ordered one-at-a-time application can realize it (round-10
    property-test finding).  The store applies it SIMULTANEOUSLY, the
    wire forwards the three ops verbatim, a relay consumer lands the
    swap, and a replayed batch does NOT swap back (statement-id dedup:
    in-session set + durable store marker — a swap's replay is
    invisible to column-set inspection)."""
    swap_sql = (
        "ALTER TABLE `src`.`t` RENAME COLUMN `a` TO `zz`, "
        "RENAME COLUMN `b` TO `a`, RENAME COLUMN `zz` TO `b`"
    )
    schema0 = spark.createDataFrame([(1, "A", "B")], "k long, a string, b string").schema
    route_a = CdcStreamRoute(
        spark, db="src", table="t", schema=schema0, keys=["k"],
        target_path=str(tmp_path / "a"), n_buckets=4, versioned=True,
        egress_format="default",
    )
    b1 = spark.createDataFrame(
        [("insert", 1, 1, "A1", "B1"), ("insert", 2, 2, "A2", "B2")],
        "op string, seq long, k long, a string, b string",
    )
    route_a.apply_batch(envelope_from_typed(b1, db="src", table="t"), batch_id=0)
    # post-swap DML: column `a` now carries what was `b` and vice versa
    b2 = spark.createDataFrame(
        [("update", 4, 1, "B1x", "A1")],
        "op string, seq long, k long, a string, b string",
    )
    env2 = _ddl_env(spark, 3, swap_sql).unionByName(
        envelope_from_typed(b2, db="src", table="t")
    )
    route_a.apply_batch_with_ddl(env2, batch_id=1)
    got = {(r.k, r.a, r.b) for r in route_a.bind_target().read().collect()}
    # k=2 (pre-swap only): values must have SWAPPED columns; k=1 updated
    assert got == {(1, "B1x", "A1"), (2, "B2", "A2")}
    # replay: the swap must NOT re-apply (in-session stmt dedup +
    # rewind) — state identical
    route_a.apply_batch_with_ddl(env2, batch_id=1)
    assert {(r.k, r.a, r.b) for r in route_a.bind_target().read().collect()} == got
    # durable marker: a FRESH route object over the same store (restart
    # analog, in-memory dedup gone) skips the store swap too
    route_fresh = CdcStreamRoute(
        spark, db="src", table="t", schema=route_a.schema, keys=["k"],
        target_path=str(tmp_path / "a"), n_buckets=4, versioned=True,
        egress_format="default",
    )
    tgt = route_fresh.bind_target()
    v_before = tgt.current_version()
    assert tgt.rename_columns({"a": "b", "b": "a"}, stmt_id=3) == v_before
    assert {(r.k, r.a, r.b) for r in tgt.read().collect()} == got

    # the wire carries the three RENAMEs verbatim; a relay consumer
    # lands the swap with values intact
    msgs = [json.loads(r.value) for r in route_a.read_egress().collect()]
    ddl = [m for m in msgs if m["type"] == "ddl"]
    assert len(ddl) == 1
    assert "RENAME COLUMN `a` TO `zz`" in ddl[0]["data"]["sql"]
    from qin_cdc_spark.streaming.cdc_stream import envelope_from_egress

    route_b = CdcStreamRoute(
        spark, db="src", table="t", schema=schema0, keys=["k"],
        target_path=str(tmp_path / "b"), n_buckets=4,
    )
    route_b.apply_batch_with_ddl(
        envelope_from_egress(route_a.read_egress()), batch_id=0
    )
    got_b = {(r.k, r.a, r.b) for r in route_b.bind_target().read().collect()}
    assert got_b == got


def test_versioned_swap_cdf_alignment(spark, tmp_path):
    """CDF spanning a recorded SWAP aligns the pre side correctly —
    the old entry-by-entry rename fold silently dropped half of a
    recorded swap, mis-joining preimages."""
    tbl = VersionedBucketedTable(spark, str(tmp_path / "t"), ["k"], n_buckets=4)
    v1 = tbl.merge(
        spark.createDataFrame(
            [("insert", 1, 1, "A", "B")],
            "op string, seq long, k long, a string, b string",
        )
    )
    tbl.rename_columns({"a": "b", "b": "a"})
    assert tbl.renames_between(v1, tbl.current_version()) == {"a": "b", "b": "a"}
    v3 = tbl.merge(
        spark.createDataFrame(
            [("update", 4, 1, "Bx", "Ax")],
            "op string, seq long, k long, a string, b string",
        )
    )
    cdf = {
        r.k: r
        for r in tbl.changes_between(v1, v3, include_preimage=True).collect()
    }
    # preimages land under the POST-swap names: _pre_a was column b's
    # value ("B"), _pre_b was column a's ("A")
    assert cdf[1]._pre_a == "B" and cdf[1]._pre_b == "A"
    assert cdf[1].a == "Bx" and cdf[1].b == "Ax"
