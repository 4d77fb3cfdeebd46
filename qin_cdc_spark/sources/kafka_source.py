"""Kafka CDC source: Debezium / Canal JSON records → the engine envelope.

Reference parity: the reference tails MySQL directly
(inputs/mysql/mysql_replication.go:38-65 — GTID tail, rotate/rows/XID
dispatch); no MySQL server exists in this container, so the streaming
transport analog is Kafka carrying the same change events in the two
dominant wire formats (Debezium, Canal).  The decoders below map either
format onto ``ENVELOPE_SCHEMA`` — everything downstream (transform
chain, LWW apply, DDL handling) is source-agnostic, exactly like the
reference's core.Msg boundary.

Decoders are pure column expressions (``get_json_object`` /
``from_json`` — JVM-side, whole-stage-codegen) and are format contracts
testable on batch DataFrames; ``kafka_envelope_stream`` wires them to
``readStream.format("kafka")`` when the Kafka connector jar is on the
classpath (skip-if-absent in this container).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from qin_cdc_spark.cdc.envelope import ENVELOPE_SCHEMA  # noqa: F401  (contract)


def _dbz(value: F.Column | str, field: str) -> F.Column:
    """Debezium field access tolerant of both envelope styles: payload-
    wrapped (converter schemas.enable=true) and flat (=false)."""
    v = F.col(value) if isinstance(value, str) else value
    return F.coalesce(
        F.get_json_object(v, f"$.payload.{field}"),
        F.get_json_object(v, f"$.{field}"),
    )


def decode_debezium_envelope(df: DataFrame, *, value_col: str = "value") -> DataFrame:
    """Debezium change-event JSON → ENVELOPE_SCHEMA rows.

    op mapping: c/r (create/snapshot-read) → insert, u → update,
    d → delete.  ``seq`` is the binlog file-position when present (the
    total-order the engine's LWW apply keys on), falling back to the
    source ts_ms; ``data`` is ``after`` (``before`` for deletes, whose
    after is null), ``old`` is ``before`` on updates only.
    """
    # Kafka log-compaction tombstones (null value after a delete) carry
    # no change event — drop them before decoding.
    df = df.filter(F.col(value_col).isNotNull())
    v = F.col(value_col).cast("string")
    op_raw = _dbz(v, "op")
    op = (
        F.when(op_raw.isin("c", "r"), F.lit("insert"))
        .when(op_raw == "u", F.lit("update"))
        .when(op_raw == "d", F.lit("delete"))
        .otherwise(op_raw)
    )
    ts_ms = F.coalesce(_dbz(v, "source.ts_ms"), _dbz(v, "ts_ms")).cast("long")
    seq = F.coalesce(_dbz(v, "source.pos").cast("long"), ts_ms)
    return df.select(
        _dbz(v, "source.db").alias("db"),
        _dbz(v, "source.table").alias("table"),
        op.alias("op"),
        seq.cast("long").alias("seq"),
        F.to_timestamp(ts_ms / F.lit(1000.0)).alias("ts"),
        F.lit(None).cast("int").alias("schema_version"),
        F.coalesce(_dbz(v, "after"), _dbz(v, "before")).alias("data"),
        F.when(op == "update", _dbz(v, "before")).alias("old"),
    )


def decode_canal_envelope(df: DataFrame, *, value_col: str = "value") -> DataFrame:
    """Canal / aliyun-DTS JSON → ENVELOPE_SCHEMA rows.

    One canal record carries an ARRAY of row images (``data``/``old``);
    posexplode keeps each row paired with its ``old`` image by index.
    ``seq`` = canal batch id · 1e6 + row index — strictly increasing per
    source as long as ids are (canal's contract), preserving intra-batch
    order.  ``isDdl`` records become ``op='ddl'`` control rows with the
    raw SQL in ``data`` (what ``handle_ddl_rows`` consumes).
    """
    v = F.col(value_col).cast("string")
    base = df.select(
        F.get_json_object(v, "$.database").alias("db"),
        F.get_json_object(v, "$.table").alias("table"),
        F.lower(F.get_json_object(v, "$.type")).alias("canal_type"),
        F.get_json_object(v, "$.id").cast("long").alias("canal_id"),
        F.coalesce(
            F.get_json_object(v, "$.es"), F.get_json_object(v, "$.ts")
        ).cast("long").alias("ts_ms"),
        F.get_json_object(v, "$.isDdl").cast("boolean").alias("is_ddl"),
        F.get_json_object(v, "$.sql").alias("sql"),
        F.from_json(F.get_json_object(v, "$.data"), "array<string>").alias("data_arr"),
        F.from_json(F.get_json_object(v, "$.old"), "array<string>").alias("old_arr"),
    )
    ddl = base.filter(F.col("is_ddl")).select(
        "db",
        "table",
        F.lit("ddl").alias("op"),
        (F.col("canal_id") * 1_000_000).cast("long").alias("seq"),
        F.to_timestamp(F.col("ts_ms") / F.lit(1000.0)).alias("ts"),
        F.lit(None).cast("int").alias("schema_version"),
        F.col("sql").alias("data"),
        F.lit(None).cast("string").alias("old"),
    )
    op = (
        F.when(F.col("canal_type") == "insert", "insert")
        .when(F.col("canal_type") == "update", "update")
        .when(F.col("canal_type") == "delete", "delete")
        .otherwise(F.col("canal_type"))
    )
    dml = (
        base.filter(~F.coalesce(F.col("is_ddl"), F.lit(False)))
        .select(
            "db", "table", "canal_id", "ts_ms", "old_arr",
            op.alias("op"),
            F.posexplode("data_arr").alias("idx", "row_json"),
        )
        .select(
            "db",
            "table",
            "op",
            (F.col("canal_id") * 1_000_000 + F.col("idx")).cast("long").alias("seq"),
            F.to_timestamp(F.col("ts_ms") / F.lit(1000.0)).alias("ts"),
            F.lit(None).cast("int").alias("schema_version"),
            F.col("row_json").alias("data"),
            F.when(
                F.col("op") == "update", F.element_at("old_arr", F.col("idx") + 1)
            ).alias("old"),
        )
    )
    return dml.unionByName(ddl)


DECODERS = {
    "debezium": decode_debezium_envelope,
    "canal": decode_canal_envelope,
    "aliyun_dts_canal": decode_canal_envelope,
}


def kafka_envelope_stream(
    spark: SparkSession,
    *,
    bootstrap_servers: str,
    topics: str,
    format: str = "debezium",
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """readStream from Kafka, decoded to the envelope.

    ``max_offsets_per_trigger`` is the reference's ``batch-size`` rate
    limit (A20) on a Kafka transport.  Requires the spark-sql-kafka
    connector on the classpath; raises a clear error when absent (this
    container ships no broker or connector — tests skip).
    """
    if format not in DECODERS:
        raise ValueError(f"unknown kafka CDC format {format!r}; have {sorted(DECODERS)}")
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    try:
        raw = reader.load()
    except Exception as e:  # connector jar absent
        raise RuntimeError(
            "spark-sql-kafka connector not available; add "
            "org.apache.spark:spark-sql-kafka-0-10 to spark.jars.packages"
        ) from e
    return DECODERS[format](raw)
