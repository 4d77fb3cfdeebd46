"""CdcController + control HTTP endpoints (A36 made real — the
reference's api/api.go handlers are empty stubs)."""

from __future__ import annotations

import json
import urllib.request

import pyspark.sql.functions as F

from qin_cdc_spark.cdc.envelope import envelope_from_typed
from qin_cdc_spark.streaming.cdc_stream import CdcStreamRoute, file_envelope_stream
from qin_cdc_spark.streaming.control import CdcController, start_control_http


def _typed(spark, table, rows):
    return spark.createDataFrame(rows, "id long, val string, op string, seq long")


def _write_env(spark, env_dir, table, rows):
    envelope_from_typed(
        _typed(spark, table, rows), db="src", table=table
    ).coalesce(1).write.mode("append").parquet(env_dir)


def _route(spark, tmp_path, table):
    from pyspark.sql.types import _parse_datatype_string

    return CdcStreamRoute(
        spark,
        db="src",
        table=table,
        schema=_parse_datatype_string("id long, val string"),
        keys=["id"],
        target_path=str(tmp_path / f"tbl_{table}"),
    )


def test_controller_live_route_add_pause_resume(spark, tmp_path):
    env_dir = str(tmp_path / "env")
    _write_env(spark, env_dir, "a", [(1, "a1", "insert", 1), (2, "a2", "insert", 2)])

    ctrl = CdcController(
        spark,
        lambda: file_envelope_stream(spark, env_dir),
        [_route(spark, tmp_path, "a")],
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    ctrl.start()
    ctrl.await_drained()
    assert ctrl.routes[0].target.read().count() == 2

    # pause (availableNow already terminated → stopped=False is fine),
    # add route b LIVE, write data for both tables, resume from the SAME
    # checkpoint: only the new file is processed, both routes apply it
    ctrl.pause()
    ctrl.add_router(_route(spark, tmp_path, "b"))
    _write_env(spark, env_dir, "a", [(3, "a3", "insert", 3)])
    _write_env(spark, env_dir, "b", [(10, "b1", "insert", 4), (11, "b2", "insert", 5)])
    ctrl.resume()
    ctrl.await_drained()
    got_a = {r.id for r in ctrl.routes[0].target.read().collect()}
    got_b = {r.id for r in ctrl.routes[1].target.read().collect()}
    assert got_a == {1, 2, 3}
    assert got_b == {10, 11}
    assert ctrl.status()["n_routes"] == 2

    # del_router: route removed; its target stays on disk
    assert ctrl.del_router("src", "b") is True
    assert ctrl.status()["n_routes"] == 1
    assert ctrl.del_router("src", "nope") is False


def test_control_http_reference_paths(spark, tmp_path):
    env_dir = str(tmp_path / "env")
    _write_env(spark, env_dir, "a", [(1, "a1", "insert", 1)])
    ctrl = CdcController(
        spark,
        lambda: file_envelope_stream(spark, env_dir),
        [_route(spark, tmp_path, "a")],
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    srv = start_control_http(ctrl)
    port = srv.server_address[1]
    base = f"http://127.0.0.1:{port}"

    def call(path, body=None):
        if body is None:
            req = urllib.request.Request(base + path)
        else:
            req = urllib.request.Request(
                base + path, data=json.dumps(body).encode(), method="POST"
            )
        try:
            with urllib.request.urlopen(req) as r:
                return r.status, json.loads(r.read().decode())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read().decode())

    import urllib.error

    code, got = call("/api/getRule")
    assert code == 200 and [r["table"] for r in got["rules"]] == ["a"]

    code, got = call(
        "/api/addRouter",
        {
            "db": "src",
            "table": "b",
            "keys": ["id"],
            "target_path": str(tmp_path / "tbl_b"),
            "schema_ddl": "id long, val string",
        },
    )
    assert code == 200 and got["ok"]
    code, got = call("/api/getRule")
    assert [r["table"] for r in got["rules"]] == ["a", "b"]

    # duplicate add rejected
    code, got = call(
        "/api/addRouter",
        {
            "db": "src",
            "table": "b",
            "keys": ["id"],
            "target_path": str(tmp_path / "tbl_b"),
            "schema_ddl": "id long, val string",
        },
    )
    assert code == 400

    code, got = call("/api/delRule", {"db": "src", "table": "b"})
    assert code == 200 and got["ok"]
    code, got = call("/api/delRule", {"db": "src", "table": "b"})
    assert code == 404

    # pause/resume drive the real pipeline
    code, got = call("/api/resume", {})
    assert code == 200
    ctrl.await_drained()
    assert ctrl.routes[0].target.read().count() == 1
    code, got = call("/api/pause", {})
    assert code == 200
    srv.shutdown()


def test_live_route_add_mid_query_processing_time(spark, tmp_path):
    """Route add takes effect on the NEXT micro-batch of a RUNNING
    query (processingTime trigger, no stop/restart) — the live
    semantics the foreachBatch shared-list design promises."""
    import time

    env_dir = str(tmp_path / "env")
    _write_env(spark, env_dir, "a", [(1, "a1", "insert", 1)])

    ctrl = CdcController(
        spark,
        lambda: file_envelope_stream(spark, env_dir),
        [_route(spark, tmp_path, "a")],
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger={"processingTime": "1 seconds"},
    )
    ctrl.start()
    try:
        deadline = time.time() + 180  # generous: CI hosts run this suite under heavy concurrent load
        while time.time() < deadline:
            t = ctrl.routes[0].target
            if t is not None and t.exists() and t.read().count() == 1:
                break
            time.sleep(0.5)
        else:
            raise AssertionError("route a never applied")

        # add route b while the query keeps running
        ctrl.add_router(_route(spark, tmp_path, "b"))
        _write_env(spark, env_dir, "b", [(10, "b1", "insert", 2)])
        deadline = time.time() + 180  # generous: CI hosts run this suite under heavy concurrent load
        while time.time() < deadline:
            t = ctrl.routes[1].target
            if t is not None and t.exists() and t.read().count() == 1:
                break
            time.sleep(0.5)
        else:
            raise AssertionError("live-added route b never applied")
    finally:
        ctrl.pause()
