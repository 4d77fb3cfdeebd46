"""Transport integrations: Kafka CDC decoders (Debezium/Canal →
envelope), StarRocks stream-load protocol against a canned HTTP server,
Prometheus /metrics exposition."""

from __future__ import annotations

import json
import threading
import urllib.request
from http.server import BaseHTTPRequestHandler, HTTPServer

import pyspark.sql.functions as F
import pytest

from qin_cdc_spark.sources.kafka_source import (
    decode_canal_envelope,
    decode_debezium_envelope,
)

# --------------------------------------------------------------------------
# Kafka CDC decoders (format contract on batch DataFrames — no broker here)
# --------------------------------------------------------------------------


def _values_df(spark, values: list[str]):
    return spark.createDataFrame([(v,) for v in values], "value string")


DBZ_INSERT = json.dumps(
    {
        "payload": {
            "before": None,
            "after": {"id": 1, "name": "a"},
            "source": {"db": "shop", "table": "orders", "ts_ms": 1700000000000, "pos": 501},
            "op": "c",
            "ts_ms": 1700000000100,
        }
    }
)
DBZ_UPDATE_FLAT = json.dumps(  # schemas.enable=false style (no payload wrapper)
    {
        "before": {"id": 1, "name": "a"},
        "after": {"id": 1, "name": "a2"},
        "source": {"db": "shop", "table": "orders", "ts_ms": 1700000001000, "pos": 502},
        "op": "u",
    }
)
DBZ_DELETE = json.dumps(
    {
        "payload": {
            "before": {"id": 1, "name": "a2"},
            "after": None,
            "source": {"db": "shop", "table": "orders", "ts_ms": 1700000002000, "pos": 503},
            "op": "d",
        }
    }
)


def test_debezium_decoder_maps_ops_and_images(spark):
    env = decode_debezium_envelope(
        spark.createDataFrame(
            # trailing None: a log-compaction tombstone record — must be
            # dropped, not decoded into a null-db row
            [(DBZ_INSERT,), (DBZ_UPDATE_FLAT,), (DBZ_DELETE,), (None,)],
            "value string",
        )
    )
    assert env.count() == 3
    rows = {r.seq: r for r in env.collect()}
    assert rows[501].op == "insert" and rows[501].db == "shop"
    assert json.loads(rows[501].data) == {"id": 1, "name": "a"}
    assert rows[501].old is None
    # flat (unwrapped) records decode identically
    assert rows[502].op == "update"
    assert json.loads(rows[502].data) == {"id": 1, "name": "a2"}
    assert json.loads(rows[502].old) == {"id": 1, "name": "a"}
    # deletes carry the before-image as data (after is null)
    assert rows[503].op == "delete"
    assert json.loads(rows[503].data) == {"id": 1, "name": "a2"}
    assert rows[503].ts is not None


CANAL_MULTI = json.dumps(
    {
        "id": 7,
        "database": "shop",
        "table": "orders",
        "type": "UPDATE",
        "isDdl": False,
        "es": 1700000003000,
        "ts": 1700000003500,
        "data": [{"id": "1", "name": "x2"}, {"id": "2", "name": "y2"}],
        "old": [{"name": "x"}, {"name": "y"}],
    }
)
CANAL_DDL = json.dumps(
    {
        "id": 8,
        "database": "shop",
        "table": "orders",
        "type": "ALTER",
        "isDdl": True,
        "es": 1700000004000,
        "sql": "ALTER TABLE orders ADD note varchar(20)",
        "data": None,
        "old": None,
    }
)


def test_canal_decoder_explodes_rows_and_ddl(spark):
    env = decode_canal_envelope(_values_df(spark, [CANAL_MULTI, CANAL_DDL]))
    rows = sorted(env.collect(), key=lambda r: r.seq)
    # two DML rows, index-paired with their old images, seq strictly ordered
    assert [r.op for r in rows] == ["update", "update", "ddl"]
    assert rows[0].seq == 7_000_000 and rows[1].seq == 7_000_001
    assert json.loads(rows[0].data) == {"id": "1", "name": "x2"}
    assert json.loads(rows[0].old) == {"name": "x"}
    assert json.loads(rows[1].old) == {"name": "y"}
    # DDL control row carries the raw SQL (handle_ddl_rows contract)
    assert rows[2].op == "ddl" and "ADD note" in rows[2].data


def test_canal_envelope_feeds_cdc_apply(spark):
    """End-to-end: canal JSON → envelope → registry DDL + typed decode."""
    from qin_cdc_spark.cdc.registry import SchemaRegistry
    from qin_cdc_spark.streaming.cdc_stream import handle_ddl_rows
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    reg = SchemaRegistry()
    reg.add("shop", "orders", StructType([
        StructField("id", LongType(), False), StructField("name", StringType(), True),
    ]))
    env = decode_canal_envelope(_values_df(spark, [CANAL_MULTI, CANAL_DDL]))
    out = handle_ddl_rows(env, reg, batch_id=0)
    assert out.filter(F.col("op") == "ddl").count() == 0
    assert reg.get("shop", "orders").fieldNames() == ["id", "name", "note"]
    # redelivered batch id: DDL not re-applied
    handle_ddl_rows(env, reg, batch_id=0)
    assert reg.current_version("shop", "orders") == 2


def test_kafka_stream_builder_requires_connector(spark):
    """No broker/connector in this container: the builder must fail with
    an actionable message (or succeed where a connector is present)."""
    from qin_cdc_spark.sources.kafka_source import kafka_envelope_stream

    try:
        df = kafka_envelope_stream(
            spark, bootstrap_servers="localhost:9092", topics="t", format="canal"
        )
    except RuntimeError as e:
        assert "spark-sql-kafka" in str(e)
    else:  # pragma: no cover - only on clusters with the connector jar
        assert df.isStreaming


def test_envelope_source_from_config_dispatch(spark, tmp_path):
    from qin_cdc_spark.cdc.envelope import ENVELOPE_SCHEMA
    from qin_cdc_spark.plans.config import parse_config
    from qin_cdc_spark.plans.pipeline import envelope_source_from_config

    cfg = parse_config(
        """
name = "k"
[input]
type = "kafka"
[input.config]
bootstrap-servers = "localhost:9092"
topics = "cdc"
format = "canal"
[output]
type = "starrocks"
"""
    )
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        envelope_source_from_config(spark, cfg)

    # mysql input type falls back to the file envelope stand-in
    cfg2 = parse_config(
        'name = "m"\n[input]\ntype = "mysql"\n[output]\ntype = "starrocks"\n'
    )
    spark.createDataFrame([], ENVELOPE_SCHEMA).write.parquet(str(tmp_path / "env"))
    src = envelope_source_from_config(spark, cfg2, envelope_dir=str(tmp_path / "env"))
    assert src.isStreaming
    # file sources relax nullability; names/types must match the envelope
    assert [(f.name, f.dataType) for f in src.schema.fields] == [
        (f.name, f.dataType) for f in ENVELOPE_SCHEMA.fields
    ]


# --------------------------------------------------------------------------
# StarRocks stream-load protocol (canned HTTP server)
# --------------------------------------------------------------------------


class _CannedStreamLoad:
    """Local HTTP server scripted with a sequence of responses."""

    def __init__(self, responses: list[dict]):
        self.responses = list(responses)
        self.requests: list[dict] = []
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_PUT(self):
                n = int(self.headers.get("Content-Length", 0))
                outer.requests.append(
                    {
                        "path": self.path,
                        "headers": dict(self.headers),
                        "body": self.rfile.read(n).decode(),
                    }
                )
                resp = outer.responses.pop(0) if outer.responses else {"Status": "Success"}
                body = json.dumps(resp).encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *args):
                pass

        self.server = HTTPServer(("127.0.0.1", 0), Handler)
        self.port = self.server.server_address[1]
        threading.Thread(target=self.server.serve_forever, daemon=True).start()

    def stop(self):
        self.server.shutdown()


def _loader(port, **kw):
    from qin_cdc_spark.sinks.starrocks import StarRocksStreamLoad

    return StarRocksStreamLoad(
        host="127.0.0.1",
        load_port=port,
        database="dw",
        table="ods_orders",
        username="root",
        password="secret",
        columns=["id", "name"],
        retry_interval_s=0.0,
        sleep=lambda s: None,
        **kw,
    )


def test_streamload_contract_headers_body_and_delete_sign(spark):
    """The wire contract of outputs/starrocks/starrocks.go:162-183:
    URL, auth, json headers, columns header with __op mapping, outer
    JSON array body, _delete_sign_ 0/1 per op."""
    from qin_cdc_spark.sinks.starrocks import streamload_rows

    srv = _CannedStreamLoad([{"Status": "Success", "NumberLoadedRows": 3}])
    try:
        changes = spark.createDataFrame(
            [(1, "a", "insert", 1), (2, "b", "update", 2), (3, "c", "delete", 3)],
            "id long, name string, op string, seq long",
        )
        rows = [r.value for r in streamload_rows(changes).collect()]
        _loader(srv.port).send(rows)
        [req] = srv.requests
        assert req["path"] == "/api/dw/ods_orders/_stream_load"
        # HTTP header names are case-insensitive (urllib title-cases them)
        h = {k.lower(): v for k, v in req["headers"].items()}
        assert h["format"] == "json" and h["strip_outer_array"] == "true"
        assert h["strict_mode"] == "true"
        assert h["columns"] == "id,name,_delete_sign_, __op = _delete_sign_"
        assert h["authorization"].startswith("Basic ")
        sent = json.loads(req["body"])
        assert [r["_delete_sign_"] for r in sent] == [0, 0, 1]
        assert sent[2]["id"] == 3
    finally:
        srv.stop()


def test_doris_streamload_merge_headers_no_op_mapping(spark):
    """The Doris dialect's wire contract (outputs/doris/doris.go:177-186,
    doris_utils.go:22): merge_type MERGE + delete predicate headers,
    columns header WITHOUT the StarRocks __op mapping; shared envelope
    otherwise (URL shape, auth, json array body, _delete_sign_ 0/1)."""
    from qin_cdc_spark.sinks.starrocks import DorisStreamLoad, streamload_rows

    srv = _CannedStreamLoad([{"Status": "Success", "NumberLoadedRows": 3}])
    try:
        changes = spark.createDataFrame(
            [(1, "a", "insert", 1), (2, "b", "update", 2), (3, "c", "delete", 3)],
            "id long, name string, op string, seq long",
        )
        rows = [r.value for r in streamload_rows(changes).collect()]
        DorisStreamLoad(
            host="127.0.0.1",
            load_port=srv.port,
            database="dw",
            table="ods_orders",
            username="root",
            password="secret",
            columns=["id", "name"],
            retry_interval_s=0.0,
            sleep=lambda s: None,
        ).send(rows)
        [req] = srv.requests
        assert req["path"] == "/api/dw/ods_orders/_stream_load"
        h = {k.lower(): v for k, v in req["headers"].items()}
        assert h["merge_type"] == "MERGE"
        assert h["delete"] == "_delete_sign_=1"
        assert h["columns"] == "id,name,_delete_sign_"  # no __op mapping
        assert h["format"] == "json" and h["strip_outer_array"] == "true"
        assert h["strict_mode"] == "true"
        assert h["authorization"].startswith("Basic ")
        sent = json.loads(req["body"])
        assert [r["_delete_sign_"] for r in sent] == [0, 0, 1]
    finally:
        srv.stop()


def test_streamload_dialect_validation():
    from qin_cdc_spark.sinks.starrocks import DorisStreamLoad, StarRocksStreamLoad

    with pytest.raises(ValueError, match="dialect"):
        StarRocksStreamLoad(
            host="h", load_port=1, database="d", table="t",
            columns=["a"], dialect="clickhouse",
        )
    with pytest.raises(ValueError, match="doris"):
        DorisStreamLoad(
            host="h", load_port=1, database="d", table="t",
            columns=["a"], dialect="starrocks",
        )


def test_streamload_retries_then_succeeds_and_raises_after_exhaustion(spark):
    from qin_cdc_spark.sinks.starrocks import StreamLoadError

    srv = _CannedStreamLoad(
        [
            {"Status": "Fail", "Message": "intentional", "ErrorURL": "http://e/1"},
            {"Status": "Success", "NumberLoadedRows": 1},
        ]
    )
    try:
        result = _loader(srv.port).send(['{"id":1,"_delete_sign_":0}'])
        assert result["Status"] == "Success"
        assert len(srv.requests) == 2  # failed once, retried, succeeded
    finally:
        srv.stop()

    srv2 = _CannedStreamLoad(
        [{"Status": "Fail", "Message": "perma", "ErrorURL": "u"}] * 3
    )
    try:
        with pytest.raises(StreamLoadError, match="perma"):
            _loader(srv2.port).send(['{"id":1,"_delete_sign_":0}'])
        assert len(srv2.requests) == 3  # RetryCount attempts
    finally:
        srv2.stop()


def test_streamload_load_batch_posts_from_partitions(spark):
    srv = _CannedStreamLoad([])  # default every response to Success
    try:
        changes = spark.createDataFrame(
            [(i, f"n{i}", "insert", i) for i in range(10)],
            "id long, name string, op string, seq long",
        ).repartition(3)
        _loader(srv.port).load_batch(changes, batch_id=0)
        total = sum(len(json.loads(r["body"])) for r in srv.requests)
        assert total == 10
        assert 1 <= len(srv.requests) <= 3  # ≤ one PUT per non-empty partition
    finally:
        srv.stop()


def test_pipeline_toml_to_streamload_end_to_end(spark, tmp_path):
    """Reference sample-config parity end to end: a starrocks output with
    [output.config.target] host/load-port routes every batch over the
    stream-load wire protocol instead of materializing locally."""
    from qin_cdc_spark.cdc.envelope import envelope_from_typed
    from qin_cdc_spark.plans.pipeline import compile_pipeline

    srv = _CannedStreamLoad([])
    try:
        cfg = f"""
name = "mysql2starrocks"
[input]
type = "mysql"
[output]
type = "starrocks"
[output.config.target]
host = "127.0.0.1"
port = 9030
load-port = {srv.port}
username = "root"
password = "secret"
[output.config.target.options]
batch-size = 1000
[[output.config.routers]]
source-schema = "src"
source-table = "accounts"
target-schema = "dw"
target-table = "ods_accounts"
"""
        rows = spark.createDataFrame(
            [(1, "a", "insert", 1), (2, "b", "insert", 2), (2, "b", "delete", 3)],
            "id long, name string, op string, seq long",
        )
        schema = rows.drop("op", "seq").schema
        pipe = compile_pipeline(
            spark,
            cfg,
            schemas={("src", "accounts"): schema},
            primary_keys={("src", "accounts"): ["id"]},
            target_root=str(tmp_path / "targets"),
        )
        pipe.run_batch(envelope_from_typed(rows, db="src", table="accounts"))
        assert srv.requests, "no stream-load PUTs received"
        assert all(
            r["path"] == "/api/dw/ods_accounts/_stream_load" for r in srv.requests
        )
        sent = [row for r in srv.requests for row in json.loads(r["body"])]
        # the batch is LWW-reduced before posting (A27): id=2's
        # insert+delete collapse to the final delete — keys are disjoint
        # across posted rows, so partition posting order can't misorder
        by_id = {r["id"]: r for r in sent}
        assert len(sent) == 2 and set(by_id) == {1, 2}
        assert by_id[1]["_delete_sign_"] == 0
        assert by_id[2]["_delete_sign_"] == 1
        # nothing materialized locally for a stream-load route
        assert not (tmp_path / "targets" / "dw" / "ods_accounts").exists()
    finally:
        srv.stop()


# --------------------------------------------------------------------------
# Prometheus /metrics exposition
# --------------------------------------------------------------------------


def test_prometheus_endpoint_serves_reference_metric_names():
    from qin_cdc_spark.streaming.metrics import (
        REFERENCE_METRIC_NAMES,
        PipelineMetrics,
        start_metrics_http,
    )

    m = PipelineMetrics()
    with m._lock:
        m._rows_total = 1234
        m._batches_total = 5
        m._by_query["q1"] = {
            "name": "q1", "rows": 1234, "batches": 5,
            "last_batch_ms": 250, "last_rows_per_s": 100.0, "active": True,
        }
    server = start_metrics_http(m, port=0)
    try:
        port = server.server_address[1]
        body = urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics").read().decode()
        for name in REFERENCE_METRIC_NAMES:
            assert f"\n{name} " in body or body.startswith(f"{name} "), name
        assert "qin_cdc_read_processed_ops_total 1234" in body
        assert "qin_cdc_write_delay_time_seconds 0.25" in body
        # non-metrics paths 404
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(f"http://127.0.0.1:{port}/other")
    finally:
        server.shutdown()


def test_streamload_deterministic_labels_on_replay(spark):
    """With label_prefix set, every chunk carries a deterministic
    {prefix}_{batch}_{partition}_{chunk} label and a replayed batch
    regenerates EXACTLY the same label set — the FE-side dedup key that
    turns at-least-once delivery into effectively-once ingestion
    (the reference ships this header commented out, starrocks.go:173)."""
    srv = _CannedStreamLoad([])
    try:
        loader = _loader(srv.port, label_prefix="dw_orders", batch_size=4)
        changes = spark.createDataFrame(
            [(i, f"n{i}", "insert", i) for i in range(10)],
            "id long, name string, op string, seq long",
        ).repartition(2)
        loader.load_batch(changes, batch_id=7)
        labels1 = sorted(
            {k.lower(): v for k, v in r["headers"].items()}["label"]
            for r in srv.requests
        )
        assert labels1 and all(lb.startswith("dw_orders_7_") for lb in labels1)
        assert len(set(labels1)) == len(labels1)  # unique per chunk

        srv.requests.clear()
        loader.load_batch(changes, batch_id=7)  # replay of the same batch
        labels2 = sorted(
            {k.lower(): v for k, v in r["headers"].items()}["label"]
            for r in srv.requests
        )
        assert labels2 == labels1  # FE would dedup every one of these
    finally:
        srv.stop()


def test_streamload_no_label_header_by_default(spark):
    srv = _CannedStreamLoad([])
    try:
        _loader(srv.port).send(['{"id":1,"_delete_sign_":0}'])
        h = {k.lower() for k in srv.requests[0]["headers"]}
        assert "label" not in h  # reference's shipped behavior
    finally:
        srv.stop()


def test_streamload_datasource_sink_end_to_end(spark, tmp_path):
    """writeStream.format('qin_streamload'): a streaming change feed
    lands on the canned FE via the DSv2 Python sink — executor-side
    POSTs, JVM-side row formatting, correct envelope and delete signs."""
    from qin_cdc_spark.sinks.starrocks import streamload_rows
    from qin_cdc_spark.sinks.streamload_sink import register

    register(spark)
    srv = _CannedStreamLoad([])
    try:
        src = str(tmp_path / "src")
        changes = spark.createDataFrame(
            [(1, "a", "insert", 1), (2, "b", "insert", 2), (2, None, "delete", 3)],
            "id long, name string, op string, seq long",
        )
        changes.coalesce(1).write.parquet(src)
        stream = spark.readStream.schema(
            "id long, name string, op string, seq long"
        ).parquet(src)
        q = (
            streamload_rows(stream)
            .writeStream.format("qin_streamload")
            .option("host", "127.0.0.1")
            .option("load-port", srv.port)
            .option("database", "dw")
            .option("table", "ods_orders")
            .option("columns", "id,name")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        sent = [r for req in srv.requests for r in json.loads(req["body"])]
        assert {(r["id"], r["_delete_sign_"]) for r in sent} == {
            (1, 0),
            (2, 0),
            (2, 1),
        }
        assert all(
            req["path"] == "/api/dw/ods_orders/_stream_load" for req in srv.requests
        )
    finally:
        srv.stop()


def test_streamload_datasource_requires_options(spark):
    from qin_cdc_spark.sinks.streamload_sink import StreamLoadStreamWriter

    import pytest as _pytest

    with _pytest.raises(ValueError, match="missing options"):
        StreamLoadStreamWriter({"host": "h"})


def test_canal_stringified_values_decode_typed(spark):
    """Regression: canal stringifies EVERY value ("id": "1") — the
    reference's own canal output and real Aliyun DTS feeds do — and a
    bare typed from_json NULLS those fields, which would null the PK
    and quarantine the whole feed.  decode_envelope's schema-tolerant
    parse (parse_row) must recover the typed values."""
    from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

    from qin_cdc_spark.cdc.apply import decode_envelope

    canal = json.dumps({
        "database": "shop", "table": "orders", "type": "INSERT",
        "es": 0, "ts": 0,
        "data": [{"id": "7", "name": "x", "price": "4.50"}],
        "old": None, "sqlType": {"id": 8}, "mysqlType": {"id": "bigint"},
        "serverId": "", "sql": "", "pkNames": ["id"], "isDdl": False,
        "id": 3, "gtid": None,
    })
    env = decode_canal_envelope(_values_df(spark, [canal]))
    schema = StructType([
        StructField("id", LongType()), StructField("name", StringType()),
        StructField("price", DoubleType()),
    ])
    rows = decode_envelope(env, schema, db="shop", table="orders", keys=["id"]).collect()
    assert [(r.id, r.name, r.price) for r in rows] == [(7, "x", 4.5)]
