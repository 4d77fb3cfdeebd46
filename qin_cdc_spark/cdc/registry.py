"""Versioned schema registry + DDL-driven schema evolution.

Reference parity (SURVEY §2.A A10-A13):
- versioned registry keyed (db, table) → {version: schema}:
  inputs/mysql/mysql_meta.go:75-133 (`tables` + `tablesVersion` maps,
  Add/Update(+1)/Delete/GetVersion)
- DDL apply (add/drop/modify/rename column with FIRST/AFTER position,
  rename/drop/truncate table): metas/mysql_ddl_parse.go:99-376
- online-DDL shadow-table detection (gh-ost / Aliyun DMS):
  inputs/mysql/mysql_replication.go:160-185
- DML msgs carry the producing-time version so in-flight rows are
  decoded with the right schema (core/msg.go:46, kafka.go:135-141) —
  here: ``schema_for(db, table, version)`` at apply time.

DDL arrives either as a structured op (the shape a Debezium-style feed
provides) or as raw MySQL DDL text parsed by ``cdc/ddl_parse.py``
(reference TableDdlParser analog, metas/mysql_ddl_parse.go:378-505).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql.types import StructField, StructType

# gh-ost and Aliyun DMS shadow/ghost table patterns, as recognized by the
# reference (inputs/mysql/mysql_replication.go:160-185).
ONLINE_DDL_SHADOW_PATTERNS = [
    re.compile(r"^_(.+)_gho$"),
    re.compile(r"^_(.+)_ghc$"),
    re.compile(r"^_(.+)_del$"),
    re.compile(r"^tp_\d+_(?:ogt|del|ogl)_t.*$"),
    re.compile(r"^tpa_[a-z0-9]+_t.*$"),
]


def is_online_ddl_shadow(table: str) -> bool:
    return any(p.match(table) for p in ONLINE_DDL_SHADOW_PATTERNS)


@dataclass
class DdlOp:
    """Structured DDL operation (A11's parsed form)."""

    action: str  # add-column | drop-column | rename-column | modify-column
    #            | rename-table | create-table | drop-table | truncate-table
    column: str | None = None
    new_name: str | None = None
    dtype: object | None = None  # pyspark DataType for add/modify
    position: str | None = None  # None | "first" | "after:<col>"
    new_table: str | None = None
    schema: StructType | None = None  # for create-table


class SchemaRegistry:
    """(db, table) → ordered {version: StructType}; every DDL bumps the
    version and keeps history (A10)."""

    def __init__(self) -> None:
        self._tables: dict[tuple[str, str], dict[int, StructType]] = {}
        self._current: dict[tuple[str, str], int] = {}

    # -- A10 surface -------------------------------------------------------
    def add(self, db: str, table: str, schema: StructType, *, version: int = 1) -> None:
        self._tables[(db, table)] = {version: schema}
        self._current[(db, table)] = version

    def get(self, db: str, table: str) -> StructType:
        return self._tables[(db, table)][self._current[(db, table)]]

    def current_version(self, db: str, table: str) -> int:
        return self._current[(db, table)]

    def get_version(self, db: str, table: str, version: int) -> StructType:
        """Decode-time lookup with the producing-time schema (A10/A30)."""
        return self._tables[(db, table)][version]

    def delete(self, db: str, table: str) -> None:
        self._tables.pop((db, table), None)
        self._current.pop((db, table), None)

    def tables(self) -> list[tuple[str, str]]:
        return sorted(self._tables)

    def _bump(self, db: str, table: str, schema: StructType) -> int:
        v = self._current[(db, table)] + 1
        self._tables[(db, table)][v] = schema
        self._current[(db, table)] = v
        return v

    # -- A12 DDL apply -----------------------------------------------------
    def apply_ddl(self, db: str, table: str, op: DdlOp) -> int | None:
        """Apply a DDL op; returns the new version (None for drops).

        Shadow tables of online-DDL tools are ignored, mirroring the
        reference's routing guard (A13) — their DDL churn must not
        version the real table's schema.
        """
        if is_online_ddl_shadow(table):
            return None
        if op.action == "create-table":
            if op.schema is None:
                raise ValueError("create-table needs a schema")
            self.add(db, table, op.schema)
            return 1
        if op.action == "drop-table":
            self.delete(db, table)
            return None
        if op.action == "truncate-table":
            # schema unchanged; data path truncates the target
            return self._current[(db, table)]
        if op.action == "rename-table":
            if not op.new_table:
                raise ValueError("rename-table needs new_table")
            versions = self._tables.pop((db, table))
            cur = self._current.pop((db, table))
            self._tables[(db, op.new_table)] = versions
            self._current[(db, op.new_table)] = cur
            return cur

        cur = self.get(db, table)
        fields = list(cur.fields)
        if op.action == "add-column":
            if op.column is None or op.dtype is None:
                raise ValueError("add-column needs column and dtype")
            new_field = StructField(op.column, op.dtype, True)
            fields = _insert_at(fields, new_field, op.position)
        elif op.action == "drop-column":
            fields = [f for f in fields if f.name != op.column]
        elif op.action == "rename-column":
            fields = [
                StructField(op.new_name, f.dataType, f.nullable) if f.name == op.column else f
                for f in fields
            ]
        elif op.action == "modify-column":
            fields = [
                StructField(f.name, op.dtype, f.nullable) if f.name == op.column else f
                for f in fields
            ]
            if op.position is not None:
                moved = next(f for f in fields if f.name == op.column)
                fields = _insert_at([f for f in fields if f.name != op.column], moved, op.position)
        else:
            raise ValueError(f"unknown DDL action {op.action!r}")
        return self._bump(db, table, StructType(fields))


def _insert_at(
    fields: list[StructField], new_field: StructField, position: str | None
) -> list[StructField]:
    """Column placement with FIRST/AFTER semantics
    (metas/mysql_ddl_parse.go FIRST/AFTER handling)."""
    if position is None:
        return [*fields, new_field]
    if position == "first":
        return [new_field, *fields]
    if position.startswith("after:"):
        anchor = position.split(":", 1)[1]
        out: list[StructField] = []
        placed = False
        for f in fields:
            out.append(f)
            if f.name == anchor:
                out.append(new_field)
                placed = True
        if not placed:
            raise ValueError(f"AFTER column {anchor!r} not found")
        return out
    raise ValueError(f"bad position {position!r}")
