"""Kafka sink formatting + partitioning — SURVEY §2.A A28-A30.

Reference parity:
- default JSON format `{database, table, type, ts, data, old}`:
  outputs/kafka/kafka_utils.go:73-94
- aliyun_dts_canal format (canal-style envelope with stringified
  values, sqlType/mysqlType maps, pkNames, seq id):
  outputs/kafka/kafka_utils.go:96-256
- key/partition = hash of primary-key map:
  outputs/kafka/kafka.go:161-177, kafka_utils.go:258-276

Everything is column expressions producing the (key, value) pair that
``df.writeStream.format("kafka")`` expects — formatting is JVM-side
``to_json`` over structs, so the formatter itself adds no Python cost
at any scale.  The broker write is exercised in tests against the
format contract (no broker in this container); wiring is
``write_kafka_stream`` below.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# JDBC type codes used by the canal format's sqlType map
# (outputs/kafka/kafka_utils.go maps qin-cdc types → java.sql.Types).
_JDBC_TYPE_CODES = {
    "long": -5,  # BIGINT
    "bigint": -5,
    "int": 4,  # INTEGER
    "double": 8,  # DOUBLE
    "float": 6,
    "string": 12,  # VARCHAR
    "timestamp": 93,
    "date": 91,
    "boolean": 16,
    "binary": 2004,
}


def kafka_key(pk_cols: list[str]) -> Column:
    """Message key = concatenated PK values; partition assignment is
    hash(key) % partitions, done by the Kafka producer itself — same
    placement contract as the reference's manual partition computation."""
    return F.concat_ws("\x01", *[F.col(c).cast("string") for c in pk_cols])


def default_json_value(
    df: DataFrame, *, database: str, table: str, pk_cols: list[str]
) -> DataFrame:
    """Default JSON format: {database, table, type, ts, data, old}."""
    payload = [c for c in df.columns if c not in {"op", "seq", "ts"}]
    return df.select(
        kafka_key(pk_cols).alias("key"),
        F.to_json(
            F.struct(
                F.lit(database).alias("database"),
                F.lit(table).alias("table"),
                F.col("op").alias("type"),
                F.unix_timestamp(F.coalesce(F.col("ts"), F.current_timestamp())).alias("ts"),
                F.struct(*[F.col(c) for c in payload]).alias("data"),
                F.lit(None).cast("string").alias("old"),
            ),
            {"ignoreNullFields": "false"},  # reference format always carries old
        ).alias("value"),
    )


def canal_json_value(
    df: DataFrame, *, database: str, table: str, pk_cols: list[str], raw_types: dict[str, str] | None = None
) -> DataFrame:
    """aliyun_dts_canal format: data/old are 1-element arrays of
    STRINGIFIED values; sqlType (JDBC codes) and mysqlType maps come
    from the schema; pkNames from the route; id = seq."""
    payload = [c for c in df.columns if c not in {"op", "seq", "ts"}]
    dtypes = dict(df.dtypes)
    raw_types = raw_types or {}
    sql_type = F.create_map(
        *[
            x
            for c in payload
            for x in (F.lit(c), F.lit(_JDBC_TYPE_CODES.get(dtypes[c], 12)))
        ]
    )
    mysql_type = F.create_map(
        *[
            x
            for c in payload
            for x in (F.lit(c), F.lit(raw_types.get(c, dtypes[c])))
        ]
    )
    data_map = F.create_map(
        *[x for c in payload for x in (F.lit(c), F.col(c).cast("string"))]
    )
    canal_op = (
        F.when(F.col("op") == "insert", "INSERT")
        .when(F.col("op") == "replace", "INSERT")
        .when(F.col("op") == "update", "UPDATE")
        .otherwise("DELETE")
    )
    return df.select(
        kafka_key(pk_cols).alias("key"),
        F.to_json(
            F.struct(
                F.col("seq").alias("id"),
                F.lit(database).alias("database"),
                F.lit(table).alias("table"),
                F.array(*[F.lit(c) for c in pk_cols]).alias("pkNames"),
                canal_op.alias("type"),
                F.lit(False).alias("isDdl"),
                sql_type.alias("sqlType"),
                mysql_type.alias("mysqlType"),
                F.array(data_map).alias("data"),
                F.lit(None).cast("array<map<string,string>>").alias("old"),
                F.unix_timestamp(F.coalesce(F.col("ts"), F.current_timestamp())).alias("es"),
            )
        ).alias("value"),
    )


def cdf_json_messages(
    table,
    v_from: int,
    v_to: int,
    *,
    database: str,
    table_name: str,
    ts_epoch: int = 0,
) -> DataFrame:
    """CDF EGRESS: re-emit a versioned table's change feed between two
    snapshots as reference-format Kafka messages — the CDC-relay loop
    closed engine-side.  The reference's one job is MySQL→Kafka
    (outputs/kafka/kafka.go:154-208); here any maintained table (a
    synced target, an MV's bucketed state, a partitioned fact) replays
    its own changes downstream in the same default JSON wire format
    ``{database, table, type, ts, data, old}``
    (outputs/kafka/kafka_utils.go:73-94), faithfully:

    * insert → data = postimage, old = null
    * update → data = postimage, old = PREIMAGE (the reference carries
      the old row image on updates — the preimage CDF provides it)
    * delete → data = preimage (a delete message names the row it
      removes, not nulls), old = null

    ``ts_epoch`` stamps the envelope ts (the relay's emission time in
    production; a deterministic literal here so the wire bytes are
    oracle-checkable).  Everything is JVM-side ``to_json`` — O(|CDF|)
    with no Python in the path."""
    cdf = table.changes_between(v_from, v_to, include_preimage=True)
    keys = list(table.keys)
    value_cols = [
        c
        for c in cdf.columns
        if c not in {*keys, "_change"} and not c.startswith("_pre_")
    ]
    is_del = F.col("_change") == "delete"
    is_upd = F.col("_change") == "update"
    data = F.struct(
        *[F.col(k).alias(k) for k in keys],
        *[
            F.when(is_del, F.col(f"_pre_{c}")).otherwise(F.col(c)).alias(c)
            for c in value_cols
        ],
    )
    old = F.when(
        is_upd,
        F.struct(
            *[F.col(k).alias(k) for k in keys],
            *[F.col(f"_pre_{c}").alias(c) for c in value_cols],
        ),
    )
    return cdf.select(
        kafka_key(keys).alias("key"),
        F.to_json(
            F.struct(
                F.lit(database).alias("database"),
                F.lit(table_name).alias("table"),
                F.col("_change").alias("type"),
                F.lit(ts_epoch).cast("long").alias("ts"),
                data.alias("data"),
                old.alias("old"),
            ),
            {"ignoreNullFields": "false"},
        ).alias("value"),
    )


def write_kafka_stream(
    formatted: DataFrame,
    *,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
    trigger: dict | None = None,
):
    """Wire a formatted (key, value) stream to a Kafka broker.  Not
    runnable in this container (no broker / kafka connector jar) — the
    formatting contract is what tests cover."""
    writer = (
        formatted.selectExpr("CAST(key AS STRING)", "CAST(value AS STRING)")
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
