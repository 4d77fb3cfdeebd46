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

# The canal format's sqlType codes are the reference's OWN mapping
# (outputs/kafka/kafka_utils.go:134-227 — MySQL wire column types, not
# java.sql.Types): keyed by the MySQL raw-type PREFIX when declared,
# else derived from the Spark dtype.  mysqlType carries the matched
# BASE name ("varchar", "bigint"), mirroring the same switch.
_CANAL_RAW_PREFIXES = [
    # (raw-type prefix, sqlType code, mysqlType base name)
    ("smallint", 2, "smallint"),
    ("tinyint", 1, "tinyint"),
    ("mediumint", 9, "mediumint"),
    ("bigint", 8, "bigint"),
    ("year", None, "year"),  # reference sets no sqlType for year
    # TypeNumber else-branch (kafka_utils.go:154-157): any remaining
    # numeric raw type — int(11), integer — is sqlType 3 / "int".
    # MUST follow the longer *int prefixes above.
    ("int", 3, "int"),
    ("float", 4, "float"),
    ("double", 5, "double"),
    ("enum", 247, "enum"),
    ("set", 248, "set"),
    ("char", 254, "char"),
    ("datetime", 12, "datetime"),
    ("timestamp", 7, "timestamp"),
    ("date", 10, "date"),
    ("time", 11, "time"),
    ("bit", 16, "bit"),
    ("json", 245, "json"),
    ("decimal", 246, "decimal"),
    ("binary", 252, "binary"),
    ("varchar", 253, "varchar"),
]

# Spark dtype fallback when no raw MySQL type is declared for a column.
_CANAL_DTYPE_CODES = {
    "long": (8, "bigint"),
    "bigint": (8, "bigint"),
    "int": (3, "int"),
    "smallint": (2, "smallint"),
    "tinyint": (1, "tinyint"),
    "double": (5, "double"),
    "float": (4, "float"),
    "string": (253, "varchar"),
    "timestamp": (7, "timestamp"),
    "date": (10, "date"),
    "boolean": (16, "bit"),
    "binary": (252, "blob"),
}


def _canal_type(col: str, dtype: str, raw_types: dict[str, str]):
    """(sqlType code, mysqlType name) per the reference's switch."""
    raw = raw_types.get(col)
    if raw:
        low = raw.lower()
        if low.endswith("text"):
            return 15, "text"
        # TypeBinary (kafka_utils.go:219-226): sqlType 252 for the whole
        # family; mysqlType "binary" only for the binary(N) prefix, every
        # other member (blob/tinyblob/mediumblob/longblob/varbinary) is
        # carried as "blob".
        if low.endswith("blob") or low.startswith("varbinary"):
            return 252, "blob"
        for prefix, code, name in _CANAL_RAW_PREFIXES:
            if low.startswith(prefix):
                return code, name
        return None, raw  # default branch: raw type carried verbatim
    base = dtype.split("(")[0]
    code, name = _CANAL_DTYPE_CODES.get(base, (253, base))
    return code, name


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
    df: DataFrame,
    *,
    database: str,
    table: str,
    pk_cols: list[str],
    raw_types: dict[str, str] | None = None,
    old_cols: dict[str, str] | None = None,
    emit_ts_ms: int | None = None,
) -> DataFrame:
    """aliyun_dts_canal format, field-for-field the reference's struct
    in its declaration (= marshal) order — database, table, type, es,
    ts, data, old, sqlType, mysqlType, serverId, sql, pkNames, isDdl,
    id, gtid (outputs/kafka/kafka_utils.go:98-114):

    * data/old are 1-element arrays of STRINGIFIED row maps; ``old`` is
      null unless ``old_cols`` maps payload columns to their preimage
      columns (the reference carries ``DmlMsg.Old`` when present,
      kafka_utils.go:119-124);
    * es = the event timestamp in MILLIS (UnixMilli, :249), ts = the
      emit time in millis (time.Now, :250) — ``emit_ts_ms`` pins it for
      deterministic tests, None uses the current time;
    * sqlType/mysqlType follow the reference's own raw-type switch
      (:134-227 — MySQL wire codes, base-name mysqlType), NOT
      java.sql.Types; serverId/sql are empty strings and gtid is null
      exactly as shipped (:258-264); id = seq (the reference's
      inputSequence counter analog)."""
    meta_cols = {"op", "seq", "ts"}
    # columns that exist ONLY as preimage carriers (e.g. _pre_*) are
    # not payload; a column mapping to itself (keys in the old image)
    # stays payload
    pre_only = (set(old_cols.values()) - set(old_cols)) if old_cols else set()
    payload = [c for c in df.columns if c not in meta_cols and c not in pre_only]
    dtypes = dict(df.dtypes)
    raw_types = raw_types or {}
    sql_pairs, mysql_pairs = [], []
    for c in payload:
        code, name = _canal_type(c, dtypes[c], raw_types)
        if code is not None:
            sql_pairs += [F.lit(c), F.lit(code)]
        mysql_pairs += [F.lit(c), F.lit(name)]
    data_map = F.create_map(
        *[x for c in payload for x in (F.lit(c), F.col(c).cast("string"))]
    )
    if old_cols:
        old_map = F.create_map(
            *[
                x
                for c in payload
                if c in old_cols
                for x in (F.lit(c), F.col(old_cols[c]).cast("string"))
            ]
        )
        old_arr = F.when(
            F.col("op") == "update", F.array(old_map)
        )  # null (not []) otherwise — Go marshals the nil slice as null
    else:
        old_arr = F.lit(None).cast("array<map<string,string>>")
    canal_op = (
        F.when(F.col("op") == "insert", "INSERT")
        .when(F.col("op") == "replace", "INSERT")
        .when(F.col("op") == "update", "UPDATE")
        .otherwise("DELETE")
    )
    emit_ts = (
        F.lit(emit_ts_ms).cast("long")
        if emit_ts_ms is not None
        else F.unix_millis(F.current_timestamp())
    )
    return df.select(
        kafka_key(pk_cols).alias("key"),
        F.to_json(
            F.struct(
                F.lit(database).alias("database"),
                F.lit(table).alias("table"),
                canal_op.alias("type"),
                F.unix_millis(
                    F.coalesce(F.col("ts"), F.current_timestamp())
                ).alias("es"),
                emit_ts.alias("ts"),
                F.array(data_map).alias("data"),
                old_arr.alias("old"),
                F.create_map(*sql_pairs).alias("sqlType"),
                F.create_map(*mysql_pairs).alias("mysqlType"),
                F.lit("").alias("serverId"),
                F.lit("").alias("sql"),
                F.array(*[F.lit(c) for c in pk_cols]).alias("pkNames"),
                F.lit(False).alias("isDdl"),
                F.col("seq").alias("id"),
                F.lit(None).cast("string").alias("gtid"),
            ),
            {"ignoreNullFields": "false"},
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
    cdf: DataFrame | None = None,
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
    with no Python in the path.  ``cdf`` lets the caller pass the
    prebuilt change feed (emit_store_egress derives the schema sidecar
    from the same frame — one schema inference, not two)."""
    if cdf is None:
        cdf = table.changes_between(v_from, v_to, include_preimage=True)
    keys = list(table.keys)
    value_cols = [
        c
        for c in cdf.columns
        if c not in {*keys, "_change"} and not c.startswith("_pre_")
    ]
    typed = {f.name: f.dataType for f in cdf.schema.fields}

    def _pre(c):
        # a column ADDed between v_from and v_to has no preimage side —
        # its pre-DDL value is a typed null (schema evolution over CDF)
        if f"_pre_{c}" in cdf.columns:
            return F.col(f"_pre_{c}")
        return F.lit(None).cast(typed[c])

    is_del = F.col("_change") == "delete"
    is_upd = F.col("_change") == "update"
    data = F.struct(
        *[F.col(k).alias(k) for k in keys],
        *[
            F.when(is_del, _pre(c)).otherwise(F.col(c)).alias(c)
            for c in value_cols
        ],
    )
    old = F.when(
        is_upd,
        F.struct(
            *[F.col(k).alias(k) for k in keys],
            *[_pre(c).alias(c) for c in value_cols],
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


def cdf_canal_messages(
    table,
    v_from: int,
    v_to: int,
    *,
    database: str,
    table_name: str,
    raw_types: dict[str, str] | None = None,
    event_ts_ms: int = 0,
    emit_ts_ms: int = 0,
    cdf: DataFrame | None = None,
) -> DataFrame:
    """CDF egress in the aliyun_dts_canal wire format — the canal
    sibling of :func:`cdf_json_messages`: a versioned table's change
    feed re-emitted as reference-exact canal messages, with the UPDATE
    messages carrying the full PREIMAGE row in the ``old`` array
    (kafka_utils.go:119-124) and DELETE messages naming the removed row
    as ``data``.  Timestamps are pinned (the snapshot diff has no
    binlog event time; a live relay stamps real ones) and ``id`` is 0
    for the same reason — the stream position is the (v_from, v_to)
    snapshot pair.  ``cdf``: see :func:`cdf_json_messages`."""
    if cdf is None:
        cdf = table.changes_between(v_from, v_to, include_preimage=True)
    keys = list(table.keys)
    value_cols = [
        c
        for c in cdf.columns
        if c not in {*keys, "_change"} and not c.startswith("_pre_")
    ]
    typed = {f.name: f.dataType for f in cdf.schema.fields}

    def _pre(c):
        # missing preimage column = ADDed since v_from (typed null)
        if f"_pre_{c}" in cdf.columns:
            return F.col(f"_pre_{c}")
        return F.lit(None).cast(typed[c])

    is_del = F.col("_change") == "delete"
    changes = cdf.select(
        F.col("_change").alias("op"),
        F.lit(0).cast("long").alias("seq"),
        F.timestamp_millis(F.lit(event_ts_ms)).alias("ts"),
        *[F.col(k) for k in keys],
        *[
            F.when(is_del, _pre(c)).otherwise(F.col(c)).alias(c)
            for c in value_cols
        ],
        *[_pre(c).alias(f"_pre_{c}") for c in value_cols],
    )
    old_cols = {k: k for k in keys}
    old_cols.update({c: f"_pre_{c}" for c in value_cols})
    return canal_json_value(
        changes,
        database=database,
        table=table_name,
        pk_cols=keys,
        raw_types=raw_types,
        old_cols=old_cols,
        emit_ts_ms=emit_ts_ms,
    )


# Spark simpleString dtype → the MySQL column type emitted into
# synthesized DDL.  Inverse of cdc/ddl_parse.py::mysql_type_to_spark on
# the types the engine round-trips (decimal(p,s) passes through
# verbatim).  Two documented LOSSY-TYPE edges (ADVICE r8) — both chosen
# so VALUES survive the wire even where the type widens:
# * byte → tinyint, which the parser reads back as ShortType (the
#   reference's own tinyint mapping) — byte values cast to short
#   losslessly; the consumer's column is one width wider.
# * boolean → varchar(255): MySQL has no boolean, and the old
#   boolean→tinyint mapping NULLED every value downstream (the wire
#   stringifies booleans as "true"/"false", which cast-to-short drops)
#   — string keeps the values verbatim at the cost of the type.
_SPARK_TO_MYSQL = {
    "bigint": "bigint",
    "long": "bigint",
    "int": "int",
    "integer": "int",
    "smallint": "smallint",
    "short": "smallint",
    "tinyint": "tinyint",
    "byte": "tinyint",
    "float": "float",
    "double": "double",
    "date": "date",
    "timestamp": "datetime",
    "binary": "blob",
    "string": "varchar(255)",
    "boolean": "varchar(255)",
}


def mysql_type_of(dtype_simple: str) -> str:
    if dtype_simple.startswith("decimal"):
        return dtype_simple
    # complex types cannot round-trip through MySQL DDL: emitting
    # varchar(255) would silently evolve a relay consumer's registry to
    # string while the producer keeps array/struct/map — schema
    # divergence a hash check only catches much later.  Fail at the
    # point of synthesis instead (ADVICE r8).
    if dtype_simple.startswith(("array<", "struct<", "map<")):
        raise ValueError(
            f"cannot synthesize MySQL DDL for complex type {dtype_simple!r} "
            "— a schema change adding/retyping a non-atomic column is not "
            "expressible on the reference wire format"
        )
    return _SPARK_TO_MYSQL.get(dtype_simple, "varchar(255)")


def render_alter_ops(database: str, table_name: str, ops: list) -> str | None:
    """Render parsed column-level ``DdlOp``s back into ONE canonical
    ALTER statement in the engine's own round-trip dialect — the
    verbatim-forwarding half of DDL-over-the-wire (VERDICT r8 #1):
    where ``schema_change_ddl`` re-DERIVES a name-based diff (renames
    degrade to DROP+ADD), this re-renders the upstream statement's
    intent, so RENAME/CHANGE COLUMN cross the wire as renames and the
    consumer's historical values survive.  Canonical form also lets the
    egress emitter re-qualify the table name when a route re-routes
    (``ALTER TABLE `db`.`t` <specs>`` — a fixed prefix).  FIRST/AFTER
    positions are dropped (consumers union by name; same rule as the
    diff path).  Returns None when no op is renderable."""
    specs = []
    for op in ops:
        if op.action == "add-column":
            specs.append(
                f"ADD COLUMN `{op.column}` {mysql_type_of(op.dtype.simpleString())}"
            )
        elif op.action == "modify-column":
            specs.append(
                f"MODIFY COLUMN `{op.column}` {mysql_type_of(op.dtype.simpleString())}"
            )
        elif op.action == "drop-column":
            specs.append(f"DROP COLUMN `{op.column}`")
        elif op.action == "rename-column":
            specs.append(f"RENAME COLUMN `{op.column}` TO `{op.new_name}`")
        elif op.action == "change-column":
            specs.append(
                f"CHANGE COLUMN `{op.column}` `{op.new_name}` "
                f"{mysql_type_of(op.dtype.simpleString())}"
            )
    if not specs:
        return None
    return f"ALTER TABLE `{database}`.`{table_name}` " + ", ".join(specs)


def requalify_alter(sql: str, database: str, table_name: str) -> str:
    """Swap a canonical ALTER's table qualifier for the egress names —
    a producer route may publish under a re-routed (database, table),
    and the forwarded DDL must name what the DML messages name."""
    import re

    m = re.match(r"^ALTER TABLE `[^`]*`\.`[^`]*` (.*)$", sql, re.S)
    specs = m.group(1) if m else sql
    return f"ALTER TABLE `{database}`.`{table_name}` {specs}"


def schema_change_ddl(
    database: str,
    table_name: str,
    prev_cols: list,
    cur_cols: list,
) -> str | None:
    """One ALTER TABLE statement describing the column diff between two
    emitted schemas (``[[name, spark_simpleString], …]`` lists), or
    None when they agree.  The statement is the engine's OWN DDL
    dialect round-trip: ``cdc/ddl_parse.py`` parses it back to the
    exact Spark types, so a relay consumer's registry evolves to the
    producer's schema from the wire alone — the reference carries DDL
    as first-class events for the same reason (core/msg.go:24-28);
    its kafka output drops them (isDdl hard-false, kafka_utils.go:112)
    and this closes that gap.  Name-based diff: ADD for new columns
    (appended — consumers union by name, position is immaterial),
    MODIFY for a changed type, DROP for removed ones; specs join into
    ONE statement so the consumer applies the whole change atomically
    in seq order.

    USER-FACING CONTRACT: this diff is the RESIDUAL/FALLBACK path.
    Upstream DDL rows forward verbatim via ``render_alter_ops`` + the
    store's ddl ledger (emit_store_egress), which preserves renames; a
    rename reaching THIS function (no verbatim statement recorded —
    e.g. the schema moved through a manual route.schema assignment, or
    the statement was lost to a crash before ledger-attach) renders as
    DROP+ADD and nulls the renamed column's history downstream.  If a
    consumer needs rename fidelity, the upstream change must arrive as
    an ``op='ddl'`` envelope row (the binlog-dir and Kafka sources
    carry them)."""
    prev = dict(prev_cols)
    cur = dict(cur_cols)
    specs = []
    for name, dt in cur_cols:
        if name not in prev:
            specs.append(f"ADD COLUMN `{name}` {mysql_type_of(dt)}")
        elif prev[name] != dt:
            specs.append(f"MODIFY COLUMN `{name}` {mysql_type_of(dt)}")
    for name, _dt in prev_cols:
        if name not in cur:
            specs.append(f"DROP COLUMN `{name}`")
    if not specs:
        return None
    return f"ALTER TABLE `{database}`.`{table_name}` " + ", ".join(specs)


def ddl_json_message(
    spark, *, database: str, table: str, sql: str, ts_epoch: int = 0
) -> DataFrame:
    """One default-format DDL control message: ``type='ddl'`` with the
    statement under ``data.sql`` (the default format has no sql field —
    an engine extension; the reference's default format never carries
    DDL at all).  Key is empty: DDL is table-scoped control, not a row."""
    return spark.range(1).select(
        F.lit("").alias("key"),
        F.to_json(
            F.struct(
                F.lit(database).alias("database"),
                F.lit(table).alias("table"),
                F.lit("ddl").alias("type"),
                F.lit(ts_epoch).cast("long").alias("ts"),
                F.struct(F.lit(sql).alias("sql")).alias("data"),
                F.lit(None).cast("string").alias("old"),
            ),
            {"ignoreNullFields": "false"},
        ).alias("value"),
    )


def ddl_canal_message(
    spark,
    *,
    database: str,
    table: str,
    sql: str,
    event_ts_ms: int = 0,
    emit_ts_ms: int = 0,
) -> DataFrame:
    """One canal-format DDL control message: ``isDdl: true`` with the
    raw statement in ``sql`` and null data/old — the canal-JSON DDL
    convention (type = the statement's leading keyword, e.g. ALTER),
    which the reference's canal formatter never produces (isDdl
    hard-false, outputs/kafka/kafka_utils.go:112).  Field order matches
    the reference's struct declaration exactly, so DML and DDL messages
    diff cleanly on the wire."""
    kind = (sql.split(None, 1)[0] if sql.strip() else "DDL").upper()
    return spark.range(1).select(
        F.lit("").alias("key"),
        F.to_json(
            F.struct(
                F.lit(database).alias("database"),
                F.lit(table).alias("table"),
                F.lit(kind).alias("type"),
                F.lit(event_ts_ms).cast("long").alias("es"),
                F.lit(emit_ts_ms).cast("long").alias("ts"),
                F.lit(None).cast("array<map<string,string>>").alias("data"),
                F.lit(None).cast("array<map<string,string>>").alias("old"),
                F.lit(None).cast("map<string,int>").alias("sqlType"),
                F.lit(None).cast("map<string,string>").alias("mysqlType"),
                F.lit("").alias("serverId"),
                F.lit(sql).alias("sql"),
                F.lit(None).cast("array<string>").alias("pkNames"),
                F.lit(True).alias("isDdl"),
                F.lit(0).cast("long").alias("id"),
                F.lit(None).cast("string").alias("gtid"),
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
