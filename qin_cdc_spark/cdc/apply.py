"""CDC apply: decode + last-writer-wins merge.

Reference parity: this is the Spark re-expression of the reference's
whole sink path — per-table micro-batch buffering
(outputs/starrocks/starrocks.go:64-104), ordered apply via run-splitting
(outputs/mysql/mysql.go:172-202 ``splitMsgs``), bulk upsert
(outputs/mysql/mysql_utils.go:45-88) and bulk delete
(outputs/mysql/mysql_utils.go:114-134).  Instead of splitting a batch
into consecutive delete/upsert runs and replaying them in order, we
reduce each batch to its LAST event per primary key (``max_by(event,
seq)``) and apply once — order-safe and one aggregation instead of N
statements (SURVEY §2.A A27 mapping).

Scale notes:
- ``latest_by_key`` uses ``groupBy(pk).agg(max_by(...))`` rather than a
  window ``row_number``: partial (map-side) aggregation means the
  shuffle carries at most one row per key per input partition, vs the
  window's full-data shuffle + sort.  At 100 TB of events this is the
  difference between shuffling |keys| and shuffling |events|.
- The merge with the existing target is a full-outer-style union-reduce
  keyed on pk.  On a real deployment the target would be a Delta/Iceberg
  table with ``MERGE INTO`` (file-skipping on pk ranges); the parquet
  implementation here rewrites the table, which is the correct
  semantics and the honest local stand-in.
- Idempotence (at-least-once replay, reference position semantics
  inputs/mysql/mysql_position.go:150-170): re-applying any suffix of the
  stream is a no-op because max-seq wins and seq is stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from qin_cdc_spark.cdc.envelope import OP_DELETE


def parse_row(col, schema: StructType):
    """Schema-tolerant JSON row parse: one ``from_json`` with atomic
    fields read as strings, then one struct cast to the declared types.

    Why: canal-format JSON — including the reference's own canal output
    (outputs/kafka/kafka_utils.go:98-114) and Aliyun DTS feeds —
    stringifies EVERY value (``"id": "1"``, ``"price": "4.50"``), and a
    bare typed ``from_json`` silently NULLS those fields (Spark does
    not coerce JSON strings to numerics).  Without tolerance, any
    numeric-PK table fed from a canal source decodes to null keys and
    the whole feed lands in the DLQ.  Atomic fields therefore parse as
    strings and CAST to their declared types — one JVM-side columnar
    parse covers typed JSON (from_json coerces proper scalars into
    string fields) and stringified JSON alike; only complex/binary
    fields add a typed parse (see inline rationale)."""
    from pyspark.sql.types import ArrayType, BinaryType, MapType, StringType, StructField

    # ONE from_json evaluation, ONE struct cast: the parse schema keeps
    # every atomic field as StringType (accepting both the quoted canal
    # rendering and the string form of a proper JSON scalar — from_json
    # coerces numbers/booleans into StringType fields) while complex
    # fields (string→array/map/struct casts don't exist — canal only
    # stringifies scalars anyway) and binary (typed from_json
    # base64-decodes; a string cast would keep the utf8 bytes of the
    # base64 TEXT) parse typed; the struct-to-struct cast then converts
    # each atomic field to its declared type in one expression.
    #
    # Shape matters for PERFORMANCE, not just correctness: an earlier
    # version built the row as struct(per-field getField(from_json…))
    # under a when() — conditional branches defeat codegen's
    # subexpression elimination, so the JSON re-parsed once PER FIELD
    # (measured 4.6 s vs 1.6 s for this single-parse shape on the sf0.1
    # orders envelope; the plain intolerant parse is 1.3 s).
    def _string_routed(dt) -> bool:
        return not isinstance(dt, (ArrayType, MapType, StructType, BinaryType))

    def _nullable(dt):
        # cast target must be fully nullable: a parsed string field is
        # nullable by construction, and casting it to a NOT NULL field
        # is an analysis error — the decode's output was always
        # nullable (a malformed row yields nulls), so nullability is
        # semantics here, not a loss
        if isinstance(dt, StructType):
            return StructType(
                [StructField(f.name, _nullable(f.dataType), True) for f in dt.fields]
            )
        if isinstance(dt, ArrayType):
            return ArrayType(_nullable(dt.elementType), True)
        if isinstance(dt, MapType):
            return MapType(dt.keyType, _nullable(dt.valueType), True)
        return dt

    mixed = StructType(
        [
            StructField(
                f.name,
                StringType() if _string_routed(f.dataType) else _nullable(f.dataType),
                True,
            )
            for f in schema.fields
        ]
    )
    return F.from_json(col, mixed).cast(_nullable(schema))


def decode_envelope(
    env: DataFrame,
    schema: StructType,
    *,
    db: str,
    table: str,
    keys: list[str] | None = None,
) -> DataFrame:
    """Route + decode: filter one table's events out of the envelope
    stream and parse ``data`` into typed columns (A2-A4/A7 analog).

    The filter on (db, table) is the router predicate (A17/A18,
    metas/routers.go:34-75) — Catalyst pushes it down before the JSON
    parse, so only the routed table's rows pay the parse cost.

    When ``keys`` is given, PK-CHANGING updates are handled (SURVEY
    §4.3.4 — the reference's ON-DUPLICATE-KEY upsert would insert the
    new key and leak the old row; we fix by intent): an update whose
    ``old`` image carries a different primary key expands into a delete
    of the old key (same seq) plus the update at the new key.
    """
    # op='ddl' control rows carry raw SQL in `data`, not a row image —
    # they are registry metadata (handle_ddl_rows applies them upstream);
    # decoding one here would parse the SQL text as a malformed row and
    # fold a null-key event into the merge
    routed = env.filter(
        (F.col("db") == db) & (F.col("table") == table) & (F.col("op") != "ddl")
    )
    decoded = routed.withColumn("_row", parse_row(F.col("data"), schema))
    if not keys:
        return decoded.select("op", "seq", "_row.*")

    # PK-move expansion parses each envelope row ONCE (OPTIMIZATION_r10).
    # The earlier normal.unionByName(moves) shape scanned the source per
    # branch, so `data` parsed twice and `old` once over EVERY row
    # (~2.5 full JSON parses; measured 2× slower than this shape on the
    # sf0.1 orders envelope).  A when()-guarded array would not help:
    # conditional branches defeat codegen's subexpression elimination
    # (the parse_row lesson above), re-running the parse per branch.
    # Instead the parses land in one projection BELOW a constant-array
    # Generate — computed once per input row, carried as struct columns
    # through the explode — and the move expansion is a filter/select
    # over the duplicated rows: copy 0 is the event itself, copy 1
    # survives only for PK-moving updates and re-emits the old image as
    # a same-seq delete.
    dec = routed.select(
        "op",
        "seq",
        parse_row(F.col("data"), schema).alias("_row"),
        parse_row(F.col("old"), schema).alias("_old"),
    )
    pk_moved = F.col("_old").isNotNull() & _any_of(
        [F.col(f"_old.{k}") != F.col(f"_row.{k}") for k in keys]
    )
    is_move = (F.col("op") == "update") & pk_moved
    ex = dec.select(
        "op", "seq", "_row", "_old",
        F.explode(F.array(F.lit(0), F.lit(1))).alias("_i"),
    )
    return (
        ex.filter((F.col("_i") == 0) | is_move)
        .select(
            F.when(F.col("_i") == 1, F.lit("delete"))
            .otherwise(F.col("op"))
            .alias("op"),
            "seq",
            F.when(F.col("_i") == 1, F.col("_old"))
            .otherwise(F.col("_row"))
            .alias("_r"),
        )
        .select("op", "seq", "_r.*")
    )


def _any_of(conds):
    out = conds[0]
    for c in conds[1:]:
        out = out | c
    return out


def latest_by_key(df: DataFrame, keys: list[str], *, seq_col: str = "seq") -> DataFrame:
    """Reduce an event set to the latest event per primary key.

    max_by over a struct keeps the whole row of the winning event; ties
    on seq cannot happen for a well-formed stream (seq is the total
    order), matching the reference's binlog-order guarantee.
    """
    payload = [c for c in df.columns if c not in keys]
    agg = df.groupBy(*keys).agg(
        F.max_by(F.struct(*[F.col(c) for c in payload]), F.col(seq_col)).alias("_last"),
        F.max(seq_col).alias("_max_seq"),
    )
    return agg.select(*keys, "_last.*").drop("_max_seq")


def apply_changes(
    target: DataFrame | None,
    changes: DataFrame,
    keys: list[str],
    *,
    op_col: str = "op",
    seq_col: str = "seq",
) -> DataFrame:
    """Last-writer-wins merge of a change batch into a target snapshot.

    Semantics (SURVEY §2.A delivery invariants 1-4):
    - last event per key wins (binlog order via seq);
    - a last event of ``delete`` tombstones the row;
    - update/insert/replace all apply the full new image (the reference
      applies updates as full-row upserts, outputs/mysql/mysql_utils.go:45-88);
    - replaying any suffix is idempotent.
    """
    value_cols = [c for c in changes.columns if c not in {op_col, seq_col, *keys}]
    if target is not None:
        # Existing rows act as op=insert at seq=-1 (anything in the
        # change stream beats them; absent keys survive unchanged).
        base = target.select(
            F.lit("insert").alias(op_col),
            F.lit(-1).cast("long").alias(seq_col),
            *[F.col(c) for c in keys],
            *[F.col(c) for c in value_cols],
        )
        changes = base.unionByName(changes.select(base.columns))
    last = latest_by_key(changes, keys, seq_col=seq_col)
    return last.filter(F.col(op_col) != OP_DELETE).select(*keys, *value_cols)
