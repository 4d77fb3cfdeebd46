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
        # breadcrumbs for online-DDL cutovers: real tables renamed ONTO a
        # shadow name (gh-ost step 1, `t -> _t_del`) keep their history
        # here so step 2 (`_t_gho -> t`) continues the version sequence
        self._retired: dict[tuple[str, str], tuple[dict[int, StructType], int]] = {}

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
        """Apply a DDL op; returns the new version (None for drops or
        untracked tables).

        Shadow tables of online-DDL tools are TRACKED, not ignored — the
        reference applies DDL to both synced and online-DDL tables
        (isSyncTable || isOnlineDdlTable, mysql_replication.go:187-226),
        because a gh-ost run ALTERs the `_t_gho` shadow and then lands it
        under the real name via the cutover
        ``RENAME TABLE t TO _t_del, _t_gho TO t``; dropping the shadow's
        DDL would lose the evolved schema at cutover.  DDL for a table
        this registry has never seen (neither synced nor shadow) is a
        no-op, mirroring the reference's routing guard.
        """
        if op.action == "create-table":
            if op.schema is None:
                raise ValueError("create-table needs a schema")
            self.add(db, table, op.schema)
            return 1
        if (db, table) not in self._tables:
            return None  # untracked table: not synced, not a known shadow
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
            src_shadow = is_online_ddl_shadow(table)
            dst_shadow = is_online_ddl_shadow(op.new_table)
            if dst_shadow and not src_shadow:
                # cutover step 1 (`t -> _t_del`): retire the real table but
                # keep a breadcrumb under the REAL name so step 2 can
                # continue its version history
                self._retired[(db, table)] = (dict(versions), cur)
            if src_shadow and not dst_shadow:
                # cutover step 2 (`_t_gho -> t`): the shadow's evolved
                # schema lands under the real name as the retired
                # table's next version — in-flight DML rows stamped with
                # pre-cutover versions still decode (history retained)
                retired = self._retired.pop((db, op.new_table), None)
                if retired is not None:
                    r_versions, r_cur = retired
                    merged = dict(r_versions)
                    new_v = r_cur + 1
                    merged[new_v] = versions[cur]
                    self._tables[(db, op.new_table)] = merged
                    self._current[(db, op.new_table)] = new_v
                    return new_v
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
