"""Python-DataSource binlog-dir source: explicit offset semantics over
an append-only envelope directory (A1/A5-A6 on the public API)."""

from __future__ import annotations

import pyspark.sql.functions as F

from qin_cdc_spark.cdc.envelope import envelope_from_typed
from qin_cdc_spark.sources.binlog_dir import register
from qin_cdc_spark.streaming.cdc_stream import CdcStreamRoute, start_cdc_stream


def _append(spark, env_dir, rows):
    typed = spark.createDataFrame(rows, "id long, val string, op string, seq long")
    envelope_from_typed(typed, db="src", table="t").coalesce(1).write.mode(
        "append"
    ).parquet(env_dir)


def _route(spark, tmp_path):
    from pyspark.sql.types import _parse_datatype_string

    return CdcStreamRoute(
        spark,
        db="src",
        table="t",
        schema=_parse_datatype_string("id long, val string"),
        keys=["id"],
        target_path=str(tmp_path / "tbl"),
    )


def test_binlog_dir_source_applies_and_resumes(spark, tmp_path):
    """Full CDC apply through the custom source, then a checkpoint
    resume that processes ONLY the appended tail (offset = file index,
    the binlog-position analog)."""
    register(spark)
    env_dir = str(tmp_path / "env")
    _append(spark, env_dir, [(1, "a", "insert", 1), (2, "b", "insert", 2)])
    _append(spark, env_dir, [(1, "a2", "update", 3), (3, "c", "insert", 4)])

    stream = spark.readStream.format("qin_binlog_dir").option("path", env_dir).load()
    route = _route(spark, tmp_path)
    q = start_cdc_stream(
        spark, stream, [route], checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(300)
    got = {(r.id, r.val) for r in route.target.read().collect()}
    assert got == {(1, "a2"), (2, "b"), (3, "c")}

    # tail append + resume from the SAME checkpoint: only the new file
    # is read (a re-read of file 1 would resurrect (1, 'a') — it can't,
    # but more directly: a delete applied now must not be undone by any
    # replayed old insert)
    _append(spark, env_dir, [(2, None, "delete", 5), (4, "d", "insert", 6)])
    stream2 = spark.readStream.format("qin_binlog_dir").option("path", env_dir).load()
    q2 = start_cdc_stream(
        spark, stream2, [route], checkpoint_dir=str(tmp_path / "ckpt")
    )
    q2.awaitTermination(300)
    got2 = {(r.id, r.val) for r in route.target.read().collect()}
    assert got2 == {(1, "a2"), (3, "c"), (4, "d")}


def test_binlog_dir_source_matches_file_envelope_stream(spark, tmp_path):
    """Same directory through the custom source and the built-in file
    source → identical applied state (the source is a drop-in)."""
    from qin_cdc_spark.streaming.cdc_stream import file_envelope_stream

    register(spark)
    env_dir = str(tmp_path / "env")
    _append(spark, env_dir, [(i, f"v{i}", "insert", i) for i in range(1, 30)])
    _append(spark, env_dir, [(i, f"w{i}", "update", 100 + i) for i in range(1, 15)])
    _append(spark, env_dir, [(i, None, "delete", 200 + i) for i in range(25, 30)])

    r1, r2 = _route(spark, tmp_path / "a"), _route(spark, tmp_path / "b")
    q1 = start_cdc_stream(
        spark,
        spark.readStream.format("qin_binlog_dir").option("path", env_dir).load(),
        [r1],
        checkpoint_dir=str(tmp_path / "ck1"),
    )
    q1.awaitTermination(300)
    q2 = start_cdc_stream(
        spark,
        file_envelope_stream(spark, env_dir),
        [r2],
        checkpoint_dir=str(tmp_path / "ck2"),
    )
    q2.awaitTermination(300)
    a = sorted((r.id, r.val) for r in r1.target.read().collect())
    b = sorted((r.id, r.val) for r in r2.target.read().collect())
    assert a == b and len(a) == 24
