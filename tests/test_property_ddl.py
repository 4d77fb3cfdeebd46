"""Property-based hardening of the DDL parser: column attributes in any
order and count must parse to the same structured op (the round-1 bug
class: a fixed-order attribute regex silently dropped legal ALTERs)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql.types import IntegerType, StringType, TimestampType

from qin_cdc_spark.cdc.ddl_parse import parse_ddl

# attribute snippets that may follow a column type, in any order
_ATTRS = [
    "NOT NULL",
    "NULL",
    "DEFAULT 0",
    "DEFAULT 'x y'",
    'DEFAULT "z"',
    "DEFAULT CURRENT_TIMESTAMP",
    "ON UPDATE CURRENT_TIMESTAMP",
    "AUTO_INCREMENT",
    "COMMENT 'why, indeed'",
    "UNSIGNED",
    "COLLATE utf8mb4_bin",
    "UNIQUE KEY",
]

_TYPES = [
    ("int", IntegerType),
    ("varchar(32)", StringType),
    ("datetime(6)", TimestampType),
]


@settings(max_examples=50, deadline=None)
@given(
    dtype=st.sampled_from(_TYPES),
    attrs=st.lists(st.sampled_from(_ATTRS), max_size=4, unique=True),
    use_after=st.booleans(),
)
def test_add_column_parses_under_any_attribute_order(dtype, attrs, use_after):
    raw_type, spark_type = dtype
    spec = f"ADD COLUMN c1 {raw_type} {' '.join(attrs)}"
    if use_after:
        spec += " AFTER id"
    [p] = parse_ddl(f"ALTER TABLE t {spec}", "db")
    [op] = p.ops
    assert op.action == "add-column" and op.column == "c1"
    assert isinstance(op.dtype, spark_type)
    assert op.position == ("after:id" if use_after else None)


@settings(max_examples=30, deadline=None)
@given(
    attrs=st.lists(st.sampled_from(_ATTRS), max_size=3, unique=True),
    col=st.sampled_from(["a", "`weird col`", "B2"]),
)
def test_modify_column_parses_under_any_attribute_order(attrs, col):
    [p] = parse_ddl(
        f"ALTER TABLE t MODIFY {col} varchar(10) {' '.join(attrs)}", "db"
    )
    [op] = p.ops
    assert op.action == "modify-column"
    assert op.column == col.strip("`")
    assert isinstance(op.dtype, StringType)
