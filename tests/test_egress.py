"""In-stream CDF egress (CdcStreamRoute.emit_egress) — the reference's
relay loop (MySQL → Kafka wire messages, outputs/kafka/kafka.go:154-208)
closed over the engine's own tables: every landed batch re-emits the
target's change feed since the egress high-water mark in the default or
canal wire format, crash-safe (range-named publications, staged rename).
"""

from __future__ import annotations

import json
import os
import shutil

import pyspark.sql.functions as F

from qin_cdc_spark.cdc.envelope import envelope_from_typed
from qin_cdc_spark.streaming.cdc_stream import CdcStreamRoute


def _ev(spark, rows):
    return spark.createDataFrame(rows, "op string, seq long, k long, v string")


B1 = [("insert", 1, 1, "a"), ("insert", 2, 2, "b")]
B2 = [("update", 3, 1, "a2"), ("delete", 4, 2, "b"), ("insert", 5, 3, "c")]


def _route(spark, tmp_path, **kw):
    changes = _ev(spark, B1 + B2)
    env = envelope_from_typed(changes, db="src", table="t")
    schema = changes.drop("op", "seq").schema
    route = CdcStreamRoute(
        spark, db="src", table="t", schema=schema, keys=["k"],
        target_path=str(tmp_path / "t"), n_buckets=4, versioned=True,
        egress_format=kw.pop("egress_format", "default"), **kw,
    )
    return route, env


def test_default_egress_follows_batches(spark, tmp_path):
    route, env = _route(spark, tmp_path)
    route.apply_batch(env.filter(F.col("seq") <= 2), batch_id=0)
    route.apply_batch(env.filter(F.col("seq") > 2), batch_id=1)
    msgs = [json.loads(r.value) for r in route.read_egress().collect()]
    by = {(m["type"], m["data"]["k"]): m for m in msgs}
    assert set(by) == {
        ("insert", 1), ("insert", 2),            # batch 1
        ("update", 1), ("delete", 2), ("insert", 3),  # batch 2
    }
    upd = by[("update", 1)]
    assert upd["data"]["v"] == "a2" and upd["old"]["v"] == "a"  # preimage
    dele = by[("delete", 2)]
    assert dele["data"]["v"] == "b"  # delete names the removed row
    assert all(m["database"] == "src" and m["table"] == "t" for m in msgs)
    # two range-named publications, contiguous from 0
    dirs = sorted(d for d in os.listdir(route.egress_dir) if d.startswith("v"))
    assert dirs == ["v0-1", "v1-2"]


def test_crash_window_heals_and_replay_emits_nothing(spark, tmp_path):
    route, env = _route(spark, tmp_path)
    route.apply_batch(env.filter(F.col("seq") <= 2), batch_id=0)
    route.apply_batch(env.filter(F.col("seq") > 2), batch_id=1)
    # caught up: no-op
    assert route.emit_egress() is None
    # crash between merge and emit, simulated: lose the last publication
    shutil.rmtree(os.path.join(route.egress_dir, "v1-2"))
    assert route.emit_egress() == (1, 2)  # heals from the hwm
    assert route.read_egress().count() == 5
    # whole-batch redelivery: merge no-ops (guard), egress no-ops (hwm)
    route.apply_batch(env.filter(F.col("seq") > 2), batch_id=1)
    assert route.read_egress().count() == 5
    # a crashed stage dir is ignored by hwm and reads
    os.makedirs(os.path.join(route.egress_dir, "v1-2.stage-dead"), exist_ok=True)
    assert route.emit_egress() is None
    assert route.read_egress().count() == 5


def test_canal_egress_wire_shape(spark, tmp_path):
    route, env = _route(spark, tmp_path, egress_format="canal")
    route.apply_batch(env.filter(F.col("seq") <= 2), batch_id=0)
    route.apply_batch(env.filter(F.col("seq") > 2), batch_id=1)
    msgs = [json.loads(r.value) for r in route.read_egress().collect()]
    by = {(m["type"], m["data"][0]["k"]): m for m in msgs}
    assert set(by) == {
        ("INSERT", "1"), ("INSERT", "2"),
        ("UPDATE", "1"), ("DELETE", "2"), ("INSERT", "3"),
    }
    upd = by[("UPDATE", "1")]
    assert upd["old"] == [{"k": "1", "v": "a"}]
    assert upd["pkNames"] == ["k"] and upd["isDdl"] is False


def test_egress_compaction(spark, tmp_path):
    """compact_egress collapses per-batch publications into one
    v0-{hwm} dir; message content identical; crash residue (subsumed
    dir left behind) never double-reads and is cleaned next time."""
    import os as _os

    from qin_cdc_spark.streaming.cdc_stream import (
        compact_egress,
        read_store_egress,
    )

    route, env = _route(spark, tmp_path)
    route.apply_batch(env.filter(F.col("seq") <= 2), batch_id=0)
    route.apply_batch(env.filter(F.col("seq") > 2), batch_id=1)
    before = sorted(r.value for r in route.read_egress().collect())
    assert compact_egress(spark, route.egress_dir) == (0, 2)
    dirs = sorted(d for d in _os.listdir(route.egress_dir) if d.startswith("v"))
    assert dirs == ["v0-2"]
    assert sorted(r.value for r in route.read_egress().collect()) == before
    # new batches append after the compacted publication
    ev3 = envelope_from_typed(
        _ev(spark, [("insert", 9, 7, "g")]), db="src", table="t"
    )
    route.apply_batch(ev3, batch_id=2)
    assert route.read_egress().count() == len(before) + 1
    # crash residue: re-plant a subsumed dir — reads ignore it,
    # compaction cleans it
    _os.makedirs(_os.path.join(route.egress_dir, "v1-2"), exist_ok=True)
    assert read_store_egress(spark, route.egress_dir).count() == len(before) + 1
    compact_egress(spark, route.egress_dir)
    assert not _os.path.isdir(_os.path.join(route.egress_dir, "v1-2"))


def test_route_tombstone_gc_lag(spark, tmp_path):
    """tombstone-gc-lag: after each batch the route drops delete
    tombstones below max(applied seq) - lag; newer tombstones stay
    inside the redelivery window."""
    changes = _ev(spark, B1 + B2 + [("insert", 50, 9, "z"),
                                    ("delete", 52, 9, "z")])
    env = envelope_from_typed(changes, db="src", table="t")
    schema = changes.drop("op", "seq").schema
    route = CdcStreamRoute(
        spark, db="src", table="t", schema=schema, keys=["k"],
        target_path=str(tmp_path / "t"), n_buckets=4, versioned=True,
        tombstone_gc_lag=10,
    )
    route.apply_batch(env.filter(F.col("seq") <= 5), batch_id=0)
    route.apply_batch(env.filter(F.col("seq") > 5), batch_id=1)
    # batch 2: hw=52, mark=42 → the k=2 tombstone (seq 4) dropped,
    # the k=9 tombstone (seq 52) kept
    internal = route.target.read_internal()
    dead = {r.k: r._seq for r in internal.filter(F.col("_deleted")).collect()}
    assert dead == {9: 52}
    assert {(r.k, r.v) for r in route.target.read().collect()} == {
        (1, "a2"), (3, "c")
    }


def test_egress_requires_versioned_target(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="versioned"):
        CdcStreamRoute(
            spark, db="src", table="t",
            schema=_ev(spark, B1).drop("op", "seq").schema, keys=["k"],
            target_path=str(tmp_path / "t"), egress_format="default",
        )
    with pytest.raises(ValueError, match="unknown egress format"):
        CdcStreamRoute(
            spark, db="src", table="t",
            schema=_ev(spark, B1).drop("op", "seq").schema, keys=["k"],
            target_path=str(tmp_path / "t"), versioned=True,
            egress_format="avro",
        )


def test_partitioned_route_egress_emits_retention_drops(spark, tmp_path):
    """Egress over a PARTITIONED target: the in-stream retention drop
    rides the same publication as the batch that triggered it — the
    downstream consumer sees dropped partitions as delete messages."""
    rows = [("insert", 1, 1, 1995, "a"), ("insert", 2, 2, 1996, "b"),
            ("insert", 3, 3, 1997, "c")]
    changes = spark.createDataFrame(
        rows, "op string, seq long, k long, yr int, v string"
    )
    env = envelope_from_typed(changes, db="src", table="t")
    route = CdcStreamRoute(
        spark, db="src", table="t", schema=changes.drop("op", "seq").schema,
        keys=["k"], target_path=str(tmp_path / "t"), n_buckets=2,
        partition_col="yr", partition_keep_latest=2, egress_format="default",
    )
    route.apply_batch(env.filter(F.col("seq") <= 2), batch_id=0)
    route.apply_batch(env.filter(F.col("seq") > 2), batch_id=1)
    msgs = [json.loads(r.value) for r in route.read_egress().collect()]
    by = [(m["type"], m["data"]["k"], m["data"]["yr"]) for m in msgs]
    # batch 2 publication: 1997 born AND 1995 retention-dropped
    assert ("insert", 3, 1997) in by
    assert ("delete", 1, 1995) in by
    assert ("insert", 1, 1995) in by and ("insert", 2, 1996) in by  # batch 1


def test_mv_state_egress(spark, tmp_path):
    """emit_store_egress over an MV's own bucketed state: a derived
    aggregate streams downstream in the wire format — retractions show
    as update/delete messages carrying preimages."""
    from qin_cdc_spark.streaming.cdc_stream import (
        emit_store_egress,
        read_store_egress,
    )
    from qin_cdc_spark.streaming.derived import DerivedKeyedAggTable
    from qin_cdc_spark.streaming.versioned import VersionedBucketedTable

    tbl = VersionedBucketedTable(spark, str(tmp_path / "t"), ["k"], n_buckets=4)
    mv = DerivedKeyedAggTable(
        spark, str(tmp_path / "mv"), group_cols=["v"], sum_cols=[], n_buckets=4
    )
    out = str(tmp_path / "mv_egress")
    tbl.merge(_ev(spark, B1), batch_id=0)  # k1→a, k2→b
    mv.refresh(tbl)
    emit_store_egress(mv.store, out, database="dw", table_name="counts_by_v")
    tbl.merge(_ev(spark, B2), batch_id=1)  # a→a2, b deleted, +c
    mv.refresh(tbl)
    emit_store_egress(mv.store, out, database="dw", table_name="counts_by_v")
    msgs = [json.loads(r.value) for r in read_store_egress(spark, out).collect()]
    by = [(m["type"], m["data"]["v"], m["data"]["cnt"]) for m in msgs]
    assert ("insert", "a", 1) in by and ("insert", "b", 1) in by  # batch 1
    # deletes NAME the removed aggregate row (data = preimage)
    assert ("delete", "a", 1) in by and ("delete", "b", 1) in by
    assert ("insert", "a2", 1) in by and ("insert", "c", 1) in by
    assert all(m["table"] == "counts_by_v" for m in msgs)


EGRESS_CONFIG = """
name = "relay"

[input]
type = "mysql"

[output]
type = "starrocks"

[[output.config.routers]]
source-schema = "src"
source-table = "t"
target-schema = "dw"
target-table = "ods_t"
egress-format = "default"
"""


def test_pipeline_declared_egress(spark, tmp_path):
    """TOML-declared egress end to end: the route's target is forced
    versioned, messages appear after a batch apply, named for the
    TARGET table (what the downstream consumer subscribes to)."""
    from qin_cdc_spark.cdc.registry import SchemaRegistry
    from qin_cdc_spark.plans.config import parse_config
    from qin_cdc_spark.plans.pipeline import Pipeline

    changes = _ev(spark, B1)
    cfg = parse_config(EGRESS_CONFIG)
    reg = SchemaRegistry()
    reg.add("src", "t", changes.drop("op", "seq").schema)
    pipe = Pipeline(
        spark, cfg, reg,
        primary_keys={("src", "t"): ["k"]},
        target_root=str(tmp_path / "root"),
        n_buckets=4,
    )
    pipe.run_batch(envelope_from_typed(changes, db="src", table="t"))
    route = pipe.routes[0]
    msgs = [json.loads(r.value) for r in route.read_egress().collect()]
    assert {m["type"] for m in msgs} == {"insert"}
    assert all(m["database"] == "dw" and m["table"] == "ods_t" for m in msgs)


class _PlantedCrash(Exception):
    pass


def test_egress_crash_point_fuzz(spark, tmp_path):
    """Exhaustive crash-point sweep over the publication/compaction
    protocol: the coverage rule (widest range wins, stage residue
    ignored) is load-bearing for exactly-once publication, and
    compaction deletes subsumed dirs only after its rename.  A crash is
    planted at EVERY os.rename / shutil.rmtree boundary inside
    emit/compact across a merge→emit→compact script (the op is then
    re-run, as the stream's at-least-once replay would); after each
    sweep the coverage read must yield byte-identical messages to the
    never-crashed baseline — no range lost, none double-read."""
    import qin_cdc_spark.streaming.cdc_stream as cs
    from qin_cdc_spark.streaming.versioned import VersionedBucketedTable

    B = [
        [("insert", 1, 1, "a"), ("insert", 2, 2, "b")],
        [("update", 3, 1, "a2"), ("delete", 4, 2, "b")],
        [("insert", 5, 2, "b2"), ("update", 6, 1, "a3")],
    ]

    def run(base, crash_at):
        """Returns (messages, armed-call-count).  crash_at=None never
        crashes (the baseline)."""
        tbl = VersionedBucketedTable(spark, base + "/t", ["k"], n_buckets=4)
        eg = base + "/eg"
        armed = {"on": False, "n": 0, "fired": False}
        real_rename, real_rmtree = cs.os.rename, cs.shutil.rmtree

        def fallible(fn):
            def w(*a, **kw):
                if armed["on"]:
                    if crash_at is not None and armed["n"] == crash_at:
                        armed["n"] += 1
                        armed["fired"] = True
                        raise _PlantedCrash()
                    armed["n"] += 1
                return fn(*a, **kw)
            return w

        def emit():
            armed["on"] = True
            try:
                cs.emit_store_egress(tbl, eg, database="src", table_name="t")
            finally:
                armed["on"] = False

        def compact():
            armed["on"] = True
            try:
                cs.compact_egress(spark, eg)
            finally:
                armed["on"] = False

        ops = []
        for i, rows in enumerate(B):
            def mk(i=i, rows=rows):
                def op():
                    tbl.merge(_ev(spark, rows), batch_id=i)
                    emit()
                return op
            ops.append(mk())
            if i >= 1:
                ops.append(compact)

        cs.os.rename = fallible(real_rename)
        cs.shutil.rmtree = fallible(real_rmtree)
        try:
            for op in ops:
                try:
                    op()
                except _PlantedCrash:
                    op()  # the stream replays the op after a crash
        finally:
            cs.os.rename, cs.shutil.rmtree = real_rename, real_rmtree
        msgs = cs.read_store_egress(spark, eg)
        got = sorted((r.key, r.value, r._v_to) for r in msgs.collect())
        return got, armed["n"], armed["fired"]

    baseline, n_calls, _ = run(str(tmp_path / "base"), None)
    assert n_calls >= 6, f"too few crash points to be a real sweep ({n_calls})"
    for k in range(n_calls):
        got, _, fired = run(str(tmp_path / f"crash{k}"), k)
        assert fired, f"crash point {k} never armed"
        assert got == baseline, f"crash at boundary {k} corrupted the feed"


def test_relay_chain_store_to_wire_to_store(spark, tmp_path):
    """envelope_from_egress closes the consumer half of the relay: a
    second route applies the first route's published wire messages
    through the normal decode→merge path and converges to the same
    live rows — deletes don't resurrect, multi-publication updates
    resolve in feed order, and a re-apply of the same feed is a no-op
    (LWW idempotence)."""
    from qin_cdc_spark.streaming.cdc_stream import envelope_from_egress

    route, env = _route(spark, tmp_path)
    route.apply_batch(env.filter(F.col("seq") <= 2), batch_id=0)
    route.apply_batch(env.filter(F.col("seq") > 2), batch_id=1)

    wire_env = envelope_from_egress(route.read_egress())
    schema = _ev(spark, B1).drop("op", "seq").schema
    consumer = CdcStreamRoute(
        spark, db="src", table="t", schema=schema, keys=["k"],
        target_path=str(tmp_path / "b"), n_buckets=4,
    )
    consumer.apply_batch(wire_env, batch_id=0)
    want = {(r.k, r.v) for r in route.bind_target().read().collect()}
    got = {(r.k, r.v) for r in consumer.target.read().collect()}
    assert got == want == {(1, "a2"), (3, "c")}  # k=2 deleted, not resurrected
    # re-applying the same feed is a fixed point
    consumer.apply_batch(wire_env)
    assert {(r.k, r.v) for r in consumer.target.read().collect()} == want
    # db/table re-routing override (the reference's target-table mapping)
    renamed = envelope_from_egress(route.read_egress(), db="dst", table="t2")
    assert renamed.select("db", "table").distinct().collect()[0][:] == ("dst", "t2")


def test_relay_chain_canal_format(spark, tmp_path):
    """The canal sibling of the relay chain: a canal-egress route's
    published messages re-enter through envelope_from_canal_egress —
    stringified numerics decode typed (parse_row), DELETE resolves, and
    the consumer converges to the producer's live rows."""
    from qin_cdc_spark.streaming.cdc_stream import envelope_from_canal_egress

    route, env = _route(spark, tmp_path, egress_format="canal")
    route.apply_batch(env.filter(F.col("seq") <= 2), batch_id=0)
    route.apply_batch(env.filter(F.col("seq") > 2), batch_id=1)

    wire_env = envelope_from_canal_egress(route.read_egress())
    schema = _ev(spark, B1).drop("op", "seq").schema  # k is LONG
    consumer = CdcStreamRoute(
        spark, db="src", table="t", schema=schema, keys=["k"],
        target_path=str(tmp_path / "b"), n_buckets=4,
    )
    consumer.apply_batch(wire_env, batch_id=0)
    want = {(r.k, r.v) for r in route.bind_target().read().collect()}
    assert {(r.k, r.v) for r in consumer.target.read().collect()} == want
    assert want == {(1, "a2"), (3, "c")}


def test_scd2_history_replicates_over_the_wire(spark, tmp_path):
    """The dimension HISTORY is itself a versioned store (identity
    (key, valid_from), bucketed by the business key), so wire egress
    generalizes to it: emit the SCD2 store's CDF per batch, rebuild the
    history DOWNSTREAM from the messages alone, and the rebuilt rows
    equal read_history() — including (a) closes that rewrite a stored
    row (update messages with the shortened interval) and (b) a
    RETROACTIVE insert_versions rewrite, which crosses the wire as the
    late version's insert plus the split row's update.  A consumer
    holding only the feed can then serve point-in-time joins without
    ever reading the store."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from qin_cdc_spark.streaming.cdc_stream import (
        emit_store_egress,
        read_store_egress,
        replay_egress_state,
    )
    from qin_cdc_spark.streaming.scd2 import ScdType2Table, temporal_join

    scd = ScdType2Table(spark, str(tmp_path / "h"), keys=["k"], n_buckets=4)
    eg = str(tmp_path / "eg")

    def emit():
        emit_store_egress(
            scd.store, eg, database="src", table_name="dim_history"
        )

    scd.apply_batch(_ev(spark, B1), batch_id=0)      # opens (1,1) (2,2)
    emit()
    scd.apply_batch(_ev(spark, B2), batch_id=1)      # closes both, opens (1,3) (3,5)
    emit()
    # a genuinely LATE event (below k=1's hwm of 3): update@2 splits
    # the CLOSED [1, 3) into [1, 2) + [2, 3) — the rewrite of the
    # stored row and the new mid version both cross the wire
    scd.insert_versions(_ev(spark, [("update", 2, 1, "a_mid")]))
    emit()

    msgs = read_store_egress(spark, eg)
    hist = replay_egress_state(
        msgs,
        StructType(
            [
                StructField("k", LongType()),
                StructField("valid_from", LongType()),
                StructField("valid_to", LongType()),
                StructField("v", StringType()),
            ]
        ),
        ["k", "valid_from"],
    )
    got = {
        (r.k, r.valid_from): (r.valid_to, r.v)
        for r in hist.collect()
        if r.valid_to is None or r.valid_to != r.valid_from
    }
    # in-order fold of B1 + B2 + the late update
    assert got == {
        (1, 1): (2, "a"),
        (1, 2): (3, "a_mid"),
        (1, 3): (None, "a2"),
        (2, 2): (4, "b"),
        (3, 5): (None, "c"),
    }
    # and the store agrees with its own wire feed
    store_side = {
        (r.k, r.valid_from): (r.valid_to, r.v)
        for r in scd.read_history().collect()
        if r.valid_to is None or r.valid_to != r.valid_from
    }
    assert got == store_side
    # downstream PIT enrichment over the REBUILT history
    facts = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 9), (3, 4)], "k long, asof long"
    )
    out = {
        (r.k, r.asof): r.v
        for r in temporal_join(facts, hist, ["k"], "asof").collect()
    }
    assert out == {(1, 2): "a_mid", (1, 3): "a2", (2, 9): None, (3, 4): None}


def test_history_expiry_propagates_over_the_wire(spark, tmp_path):
    """expire_history composes with wire egress: the expiry's LWW
    deletes cross the wire as delete messages (CDF detects them from
    row absence even after the tombstone GC), so a downstream replica
    folding the feed drops the expired versions and converges to the
    retained history — replicas follow retention with no side
    channel."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from qin_cdc_spark.streaming.cdc_stream import (
        emit_store_egress,
        read_store_egress,
        replay_egress_state,
    )
    from qin_cdc_spark.streaming.scd2 import ScdType2Table

    scd = ScdType2Table(spark, str(tmp_path / "h"), keys=["k"], n_buckets=4)
    eg = str(tmp_path / "eg")

    def emit():
        emit_store_egress(scd.store, eg, database="src", table_name="dim_history")

    scd.apply_batch(_ev(spark, B1), batch_id=0)
    scd.apply_batch(_ev(spark, B2), batch_id=1)
    emit()
    scd.expire_history(before=4)  # drops (1, [1,3)) and (2, [2,4))
    emit()

    hist = replay_egress_state(
        read_store_egress(spark, eg),
        StructType(
            [
                StructField("k", LongType()),
                StructField("valid_from", LongType()),
                StructField("valid_to", LongType()),
                StructField("v", StringType()),
            ]
        ),
        ["k", "valid_from"],
    )
    got = {(r.k, r.valid_from): (r.valid_to, r.v) for r in hist.collect()}
    assert got == {(1, 3): (None, "a2"), (3, 5): (None, "c")}
    # identical to the store's own retained history
    assert got == {
        (r.k, r.valid_from): (r.valid_to, r.v)
        for r in scd.read_history().collect()
    }

# ---------------------------------------------------------------------------
# DDL over the wire: mid-chain schema evolution propagates store → wire →
# store (VERDICT r7 #1).  The reference carries DDL as first-class events
# (core/msg.go:24-28) but its kafka formatter drops them (isDdl hard-false,
# outputs/kafka/kafka_utils.go:112); the engine emits a DDL control message
# whenever the emitted schema changed, and the relay consumers turn it into
# an op='ddl' envelope row for the registry.
# ---------------------------------------------------------------------------


def _evolved(spark, rows):
    return spark.createDataFrame(
        rows, "op string, seq long, k long, v string, v2 string"
    )


def _ddl_chain(spark, tmp_path, fmt):
    """Route A applies a 2-col batch, evolves to 3 cols (the upstream
    ALTER), applies a 3-col batch; each batch emits.  Returns (route_a,
    evolved_schema)."""
    changes1 = _ev(spark, B1)
    schema1 = changes1.drop("op", "seq").schema
    route_a = CdcStreamRoute(
        spark, db="src", table="t", schema=schema1, keys=["k"],
        target_path=str(tmp_path / "a"), n_buckets=4, versioned=True,
        egress_format=fmt,
    )
    route_a.apply_batch(
        envelope_from_typed(changes1, db="src", table="t"), batch_id=0
    )
    changes2 = _evolved(
        spark, [("update", 3, 1, "a2", "x"), ("insert", 5, 3, "c", "y")]
    )
    schema2 = changes2.drop("op", "seq").schema
    route_a.schema = schema2  # upstream DDL: registry refreshed the route
    route_a.apply_batch(
        envelope_from_typed(changes2, db="src", table="t"), batch_id=1
    )
    return route_a, schema2


def _consume_chain(spark, tmp_path, route_a, base_schema, env_fn):
    """Relay-consume route A's feed with a registry seeded at the BASE
    schema: handle_ddl_rows evolves it from the wire, route B applies."""
    from qin_cdc_spark.cdc.registry import SchemaRegistry
    from qin_cdc_spark.streaming.cdc_stream import handle_ddl_rows

    reg = SchemaRegistry()
    reg.add("src", "t", base_schema)
    wire_env = env_fn(route_a.read_egress())
    dml = handle_ddl_rows(wire_env, reg)
    evolved = reg.get("src", "t")
    route_b = CdcStreamRoute(
        spark, db="src", table="t", schema=evolved, keys=["k"],
        target_path=str(tmp_path / "b"), n_buckets=4,
    )
    route_b.apply_batch(dml, batch_id=0)
    return route_b, evolved


def test_ddl_over_the_wire_default_format(spark, tmp_path):
    from qin_cdc_spark.streaming.cdc_stream import envelope_from_egress

    route_a, schema2 = _ddl_chain(spark, tmp_path, "default")
    # the second publication leads with exactly one DDL control message
    msgs = [json.loads(r.value) for r in route_a.read_egress().collect()]
    ddl = [m for m in msgs if m["type"] == "ddl"]
    assert len(ddl) == 1
    assert ddl[0]["data"]["sql"] == "ALTER TABLE `src`.`t` ADD COLUMN `v2` varchar(255)"
    route_b, evolved = _consume_chain(
        spark, tmp_path, route_a, _ev(spark, B1).drop("op", "seq").schema,
        envelope_from_egress,
    )
    # the registry evolved from the wire alone
    assert [f.name for f in evolved.fields] == ["k", "v", "v2"]
    got = {(r.k): (r.v, r.v2) for r in route_b.bind_target().read().collect()}
    # post-DDL rows carry the column; the pre-DDL row reads as typed null
    assert got == {1: ("a2", "x"), 2: ("b", None), 3: ("c", "y")}
    # relay fixed point: B == A
    assert got == {
        (r.k): (r.v, r.v2) for r in route_a.bind_target().read().collect()
    }


def test_ddl_over_the_wire_canal_format(spark, tmp_path):
    from qin_cdc_spark.streaming.cdc_stream import envelope_from_canal_egress

    route_a, _ = _ddl_chain(spark, tmp_path, "canal")
    msgs = [json.loads(r.value) for r in route_a.read_egress().collect()]
    ddl = [m for m in msgs if m["isDdl"]]
    assert len(ddl) == 1
    assert ddl[0]["type"] == "ALTER"
    assert ddl[0]["sql"] == "ALTER TABLE `src`.`t` ADD COLUMN `v2` varchar(255)"
    assert ddl[0]["data"] is None and ddl[0]["old"] is None
    # DML messages still stamp isDdl false (reference wire contract)
    dml = [m for m in msgs if m["isDdl"] is False]
    assert len(dml) == 4 and {m["type"] for m in dml} == {"INSERT", "UPDATE"}
    route_b, evolved = _consume_chain(
        spark, tmp_path, route_a, _ev(spark, B1).drop("op", "seq").schema,
        envelope_from_canal_egress,
    )
    assert [f.name for f in evolved.fields] == ["k", "v", "v2"]
    got = {(r.k): (r.v, r.v2) for r in route_b.bind_target().read().collect()}
    assert got == {1: ("a2", "x"), 2: ("b", None), 3: ("c", "y")}


def test_ddl_emission_is_schema_diff_gated(spark, tmp_path):
    """No schema change → no DDL message; compaction carries the newest
    sidecar so a post-compaction emission still diffs correctly."""
    from qin_cdc_spark.streaming.cdc_stream import (
        EGRESS_SCHEMA_NAME,
        compact_egress,
        envelope_from_egress,
    )

    route_a, schema2 = _ddl_chain(spark, tmp_path, "default")
    # an unevolved third batch emits no DDL
    b3 = _evolved(spark, [("update", 7, 2, "b2", "z")])
    route_a.apply_batch(envelope_from_typed(b3, db="src", table="t"), batch_id=2)
    msgs = [json.loads(r.value) for r in route_a.read_egress().collect()]
    assert len([m for m in msgs if m["type"] == "ddl"]) == 1
    # compaction: the combined publication keeps the newest schema
    compact_egress(spark, route_a.egress_dir)
    dirs = [d for d in os.listdir(route_a.egress_dir) if d.startswith("v")]
    assert dirs == ["v0-3"]
    assert os.path.exists(
        os.path.join(route_a.egress_dir, "v0-3", EGRESS_SCHEMA_NAME)
    )
    # DDL control rows survive compaction as ordinary feed rows
    msgs = [json.loads(r.value) for r in route_a.read_egress().collect()]
    assert len([m for m in msgs if m["type"] == "ddl"]) == 1
    # a post-compaction batch with an unchanged schema emits no new DDL
    b4 = _evolved(spark, [("insert", 9, 4, "d", "w")])
    route_a.apply_batch(envelope_from_typed(b4, db="src", table="t"), batch_id=3)
    msgs = [json.loads(r.value) for r in route_a.read_egress().collect()]
    assert len([m for m in msgs if m["type"] == "ddl"]) == 1


def test_schema_change_ddl_round_trips_through_parser(spark):
    """The synthesized ALTER is the engine's own dialect: parsing it
    back yields the exact Spark types (add + modify + drop in one
    statement, applied atomically in seq order)."""
    from pyspark.sql.types import (
        DoubleType, IntegerType, LongType, StringType, StructField, StructType,
    )

    from qin_cdc_spark.cdc.ddl_parse import apply_raw_ddl
    from qin_cdc_spark.cdc.registry import SchemaRegistry
    from qin_cdc_spark.sinks.kafka import schema_change_ddl

    prev = [["k", "bigint"], ["v", "string"], ["gone", "int"]]
    cur = [["k", "bigint"], ["v", "double"], ["n", "bigint"]]
    sql = schema_change_ddl("db1", "t1", prev, cur)
    assert sql == (
        "ALTER TABLE `db1`.`t1` MODIFY COLUMN `v` double, "
        "ADD COLUMN `n` bigint, DROP COLUMN `gone`"
    )
    reg = SchemaRegistry()
    reg.add("db1", "t1", StructType([
        StructField("k", LongType()), StructField("v", StringType()),
        StructField("gone", IntegerType()),
    ]))
    apply_raw_ddl(reg, sql, "db1")
    got = reg.get("db1", "t1")
    assert [(f.name, f.dataType) for f in got.fields] == [
        ("k", LongType()), ("v", DoubleType()), ("n", LongType()),
    ]
    assert schema_change_ddl("db1", "t1", cur, cur) is None


def test_mysql_type_of_lossy_edges_and_complex_refusal():
    """ADVICE r8: the synthesized-DDL type map must keep VALUES alive
    across the wire even where the type widens, and refuse non-atomic
    types instead of silently degrading the consumer to varchar."""
    import pytest as _pytest

    from qin_cdc_spark.cdc.ddl_parse import mysql_type_to_spark
    from qin_cdc_spark.sinks.kafka import mysql_type_of

    # byte: widens to the parser's tinyint→short (values survive a cast)
    assert mysql_type_of("byte") == "tinyint"
    assert mysql_type_to_spark(mysql_type_of("byte")).simpleString() == "smallint"
    # boolean: the wire stringifies true/false, which cast-to-short
    # nulls — string keeps values verbatim at the cost of the type
    assert mysql_type_of("boolean") == "varchar(255)"
    assert mysql_type_to_spark(mysql_type_of("boolean")).simpleString() == "string"
    # complex types: loud failure, never silent varchar divergence
    for t in ("array<bigint>", "struct<a:int>", "map<string,int>"):
        with _pytest.raises(ValueError, match="complex type"):
            mysql_type_of(t)


def test_ddl_relay_through_structured_streaming(spark, tmp_path):
    """The wire DDL path through the REAL streaming machinery: the
    producer's egress feed (re-enveloped) replays as a file stream,
    one publication per micro-batch; start_cdc_stream's registry leg
    applies the op='ddl' row at the second batch's start and refreshes
    the consumer route's schema BEFORE its DML decodes — the binlog
    source's mid-stream add-column path, now fed from the wire."""
    import os

    from qin_cdc_spark.cdc.registry import SchemaRegistry
    from qin_cdc_spark.streaming.cdc_stream import (
        envelope_from_canal_egress,
        read_store_egress_until,
        start_cdc_stream,
    )

    route_a, schema2 = _ddl_chain(spark, tmp_path, "canal")
    # one envelope parquet FILE per publication → one micro-batch each
    env_dir = str(tmp_path / "env")
    os.makedirs(env_dir)
    for i, v_to in enumerate((1, 2)):
        pub = read_store_egress_until(spark, route_a.egress_dir, v_to)
        if i == 1:
            # publication 2 alone (feed minus what batch 1 carried)
            pub = pub.join(
                read_store_egress_until(spark, route_a.egress_dir, 1),
                ["key", "value"],
                "left_anti",
            )
        envelope_from_canal_egress(pub).coalesce(1).write.parquet(
            f"{env_dir}/b{i}", mode="overwrite"
        )
        os.rename(
            next(
                f"{env_dir}/b{i}/{f}"
                for f in os.listdir(f"{env_dir}/b{i}")
                if f.endswith(".parquet")
            ),
            f"{env_dir}/f{i}.parquet",
        )
    import shutil

    shutil.rmtree(f"{env_dir}/b0")
    shutil.rmtree(f"{env_dir}/b1")

    from qin_cdc_spark.cdc.envelope import ENVELOPE_SCHEMA

    stream = (
        spark.readStream.schema(ENVELOPE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(env_dir)
    )
    reg = SchemaRegistry()
    reg.add("src", "t", _ev(spark, B1).drop("op", "seq").schema)
    route_b = CdcStreamRoute(
        spark, db="src", table="t", schema=reg.get("src", "t"), keys=["k"],
        target_path=str(tmp_path / "sb"), n_buckets=4,
    )
    q = start_cdc_stream(
        spark, stream, [route_b],
        checkpoint_dir=str(tmp_path / "ckpt"), registry=reg,
    )
    q.awaitTermination()
    # the registry evolved mid-stream from the wire DDL alone
    assert [f.name for f in reg.get("src", "t").fields] == ["k", "v", "v2"]
    got = {(r.k): (r.v, r.v2) for r in route_b.bind_target().read().collect()}
    assert got == {1: ("a2", "x"), 2: ("b", None), 3: ("c", "y")}

def test_ddl_over_the_wire_modify_column(spark, tmp_path):
    """MODIFY COLUMN through the chain: a string → double widening
    propagates store → wire → store (consumer decode casts; the
    type-evolution full-rewrite keeps every manifest type-uniform).
    A column the upstream feed stops carrying is NOT a wire DROP —
    the store's union-by-name evolution retains it (old rows keep
    their values, new rows read null), and the emitted schema is the
    STORE's, so the relay honestly mirrors that; `schema_change_ddl`'s
    DROP spec exists for stores that physically shed a column (unit
    round-trip test covers it)."""
    from qin_cdc_spark.cdc.registry import SchemaRegistry
    from qin_cdc_spark.streaming.cdc_stream import (
        envelope_from_egress,
        handle_ddl_rows,
    )

    c1 = spark.createDataFrame(
        [("insert", 1, 1, "1.5", "x"), ("insert", 2, 2, "2.5", "y")],
        "op string, seq long, k long, amt string, gone string",
    )
    s1 = c1.drop("op", "seq").schema
    route_a = CdcStreamRoute(
        spark, db="src", table="t", schema=s1, keys=["k"],
        target_path=str(tmp_path / "a"), n_buckets=4, versioned=True,
        egress_format="default",
    )
    route_a.apply_batch(envelope_from_typed(c1, db="src", table="t"), batch_id=0)
    # upstream MODIFY amt -> double, DROP gone
    c2 = spark.createDataFrame(
        [("update", 3, 1, 9.25), ("insert", 4, 3, 3.5)],
        "op string, seq long, k long, amt double",
    )
    route_a.schema = c2.drop("op", "seq").schema
    route_a.apply_batch(envelope_from_typed(c2, db="src", table="t"), batch_id=1)
    msgs = [json.loads(r.value) for r in route_a.read_egress().collect()]
    ddl = [m for m in msgs if m["type"] == "ddl"]
    assert len(ddl) == 1
    assert ddl[0]["data"]["sql"] == (
        "ALTER TABLE `src`.`t` MODIFY COLUMN `amt` double"
    )
    reg = SchemaRegistry()
    reg.add("src", "t", s1)
    dml = handle_ddl_rows(envelope_from_egress(route_a.read_egress()), reg)
    evolved = reg.get("src", "t")
    assert [(f.name, f.dataType.simpleString()) for f in evolved.fields] == [
        ("k", "bigint"), ("amt", "double"), ("gone", "string"),
    ]
    route_b = CdcStreamRoute(
        spark, db="src", table="t", schema=evolved, keys=["k"],
        target_path=str(tmp_path / "b"), n_buckets=4,
    )
    route_b.apply_batch(dml, batch_id=0)
    got = {
        (r.k): (r.amt, r.gone)
        for r in route_b.bind_target().read().collect()
    }
    # pre-DDL rows decode their stringified amt under the widened type;
    # the retained column keeps old rows' values, new rows read null —
    # exactly the upstream store's state (relay fixed point)
    assert got == {1: (9.25, None), 2: (2.5, "y"), 3: (3.5, None)}
    assert got == {
        (r.k): (r.amt, r.gone)
        for r in route_a.bind_target().read().collect()
    }
