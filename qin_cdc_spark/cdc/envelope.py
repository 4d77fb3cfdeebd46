"""The CDC event envelope — Spark form of the reference's ``core.Msg``.

Reference parity (/root/reference/core/msg.go:31-53, SURVEY §1.1): one
binlog event = one row.  ``data``/``old`` are JSON strings (the
reference carries ``map[string]interface{}``; JSON is the schema-fluid
equivalent that lets one streaming DataFrame carry every table — rows
are cast to their versioned typed schema only at apply time, mirroring
the reference's version-stamped decode at outputs/kafka/kafka.go:135-141).

``seq`` is the total order (the GTID/binlog-position analog,
core/msg.go InputContext.Pos): strictly increasing per source, and the
tie-break for last-writer-wins apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

OP_INSERT = "insert"
OP_UPDATE = "update"
OP_DELETE = "delete"
OP_REPLACE = "replace"  # reference core/msg.go:22

ENVELOPE_SCHEMA = StructType(
    [
        StructField("db", StringType(), False),
        StructField("table", StringType(), False),
        StructField("op", StringType(), False),
        StructField("seq", LongType(), False),
        StructField("ts", TimestampType(), True),
        StructField("schema_version", IntegerType(), True),
        StructField("data", StringType(), True),  # JSON object
        StructField("old", StringType(), True),  # JSON object (updates)
    ]
)


def envelope_from_typed(
    df: DataFrame,
    *,
    db: str,
    table: str,
    op_col: str = "op",
    seq_col: str = "seq",
    ts_col: str | None = None,
    version: int = 1,
) -> DataFrame:
    """Wrap a typed DataFrame (one column per source column + op/seq)
    into the generic envelope: payload columns serialized with to_json.

    This is the inverse of the apply-side decode (A2-A4 analog) and what
    a real binlog connector would emit after row decode.
    """
    payload_cols = [c for c in df.columns if c not in {op_col, seq_col, ts_col}]
    ts_expr = F.col(ts_col) if ts_col else F.lit(None).cast("timestamp")
    return df.select(
        F.lit(db).alias("db"),
        F.lit(table).alias("table"),
        F.col(op_col).alias("op"),
        F.col(seq_col).cast("long").alias("seq"),
        ts_expr.alias("ts"),
        F.lit(version).cast("int").alias("schema_version"),
        F.when(
            F.col(op_col) != OP_DELETE, F.to_json(F.struct(*[F.col(c) for c in payload_cols]))
        ).otherwise(
            # deletes carry only the key image in `data`, like the
            # reference's delete msgs (inputs/mysql/msg.go:56-74 carry the
            # full old row; the key subset is what apply needs)
            F.to_json(F.struct(*[F.col(c) for c in payload_cols]))
        ).alias("data"),
        F.lit(None).cast("string").alias("old"),
    )
