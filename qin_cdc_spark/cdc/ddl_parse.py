"""Raw MySQL DDL → structured ``DdlOp`` list (reference A11 parity).

The reference parses DDL statements from the binlog with the TiDB SQL
parser (metas/mysql_ddl_parse.go:378-505) and applies column-level
mutations (:99-376).  Here the same statement surface is covered by a
deliberately small recursive-regex parser — the engine only ever sees
the DDL grammar MySQL writes into the binlog, not arbitrary SQL:

- ``ALTER TABLE t ADD [COLUMN] c <type> [FIRST | AFTER x]``
- ``ALTER TABLE t DROP [COLUMN] c``
- ``ALTER TABLE t MODIFY [COLUMN] c <type> [FIRST | AFTER x]``
- ``ALTER TABLE t CHANGE [COLUMN] old new <type> [FIRST | AFTER x]``
- ``ALTER TABLE t RENAME COLUMN a TO b``
- ``ALTER TABLE t RENAME [TO|AS] t2``   (and comma-separated multi-spec)
- ``RENAME TABLE a TO b``
- ``CREATE TABLE [IF NOT EXISTS] t (<col defs>)``
- ``DROP TABLE [IF EXISTS] t`` / ``TRUNCATE [TABLE] t``

Type mapping mirrors the reference's 13-type enum (metas/table.go:5-21,
mysql_ddl_parse.go:29-60) onto Spark types per SURVEY §1.2.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql.types import (
    BinaryType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from qin_cdc_spark.cdc.registry import DdlOp


def _ident(s: str) -> str:
    return s.strip().strip("`").strip('"')


def _split_qualified(name: str, default_db: str) -> tuple[str, str]:
    parts = [_ident(p) for p in name.split(".")]
    if len(parts) == 2:
        return parts[0], parts[1]
    return default_db, parts[0]


# MySQL type name → Spark type (reference: metas/mysql_ddl_parse.go:29-60)
def mysql_type_to_spark(raw: str) -> DataType:
    t = raw.strip().lower()
    m = re.match(r"^(\w+)\s*(?:\(([^)]*)\))?", t)
    base, args = (m.group(1), m.group(2)) if m else (t, None)
    if base in ("tinyint", "smallint"):
        return ShortType()
    if base in ("mediumint", "int", "integer", "year"):
        return IntegerType()
    if base in ("bigint",):
        return LongType()
    if base == "float":
        return FloatType()
    if base in ("double", "real"):
        return DoubleType()
    if base in ("decimal", "numeric"):
        if args:
            ps = [int(x) for x in args.split(",")]
            return DecimalType(ps[0], ps[1] if len(ps) > 1 else 0)
        return DecimalType(10, 0)
    if base in ("datetime", "timestamp"):
        return TimestampType()
    if base == "date":
        return DateType()
    if base in ("blob", "tinyblob", "mediumblob", "longblob", "binary", "varbinary", "bit"):
        return BinaryType()
    # varchar/char/text family, enum, set, time, json → string
    return StringType()


# Column attributes may appear in ANY order after the type (MySQL accepts
# `INT DEFAULT 0 NOT NULL` as readily as `INT NOT NULL DEFAULT 0`) — round
# 1's fixed-order chain silently dropped legal specs, diverging the
# registry from the stream.  One alternation, starred.
_ATTR_RE = (
    r"(?:\s+(?:"
    r"unsigned|zerofill|"
    r"character\s+set\s+\S+|charset\s+\S+|collate\s+\S+|"
    r"(?:not\s+)?null|"
    r"default\s+(?:'[^']*'|\"[^\"]*\"|\([^)]*\)|[\w.+-]+(?:\(\d*\))?)|"
    r"on\s+update\s+\w+(?:\(\d*\))?|"
    r"auto_increment|"
    r"comment\s+(?:'[^']*'|\"[^\"]*\")|"
    r"(?:primary\s+)?key|unique(?:\s+key)?|"
    r"references\s+\S+\s*\([^)]*\)(?:\s+on\s+(?:delete|update)\s+\w+(?:\s+\w+)?)*|"
    r"column_format\s+\w+|storage\s+\w+|invisible|visible|srid\s+\d+|"
    r"(?:generated\s+always\s+)?as\s+\([^)]*\)(?:\s+(?:virtual|stored))?"
    r"))*"
)
_TYPE_RE = r"(?P<dtype>\w+(?:\s*\([^)]*\))?" + _ATTR_RE + r")"
# Quoted identifiers (`weird col`, "x y") may contain spaces — \S+ alone
# drops them (found by tests/test_property_ddl.py).
_IDENT = r"(?:`[^`]+`|\"[^\"]+\"|\S+)"
_POS_RE = rf"(?:\s+(?P<first>first)|\s+after\s+(?P<after>{_IDENT}))?"


def _position(m: re.Match) -> str | None:
    if m.groupdict().get("first"):
        return "first"
    if m.groupdict().get("after"):
        return f"after:{_ident(m.group('after'))}"
    return None


def _base_dtype(m: re.Match) -> DataType:
    return mysql_type_to_spark(m.group("dtype"))


_ALTER_SKIP = re.compile(
    r"^(add\s+(index|key|unique|fulltext|spatial|constraint|primary\s+key|foreign\s+key|"
    r"check|partition)|"
    r"drop\s+(index|key|primary\s+key|foreign\s+key|constraint|check|partition)|"
    r"(truncate|reorganize|coalesce|analyze|optimize|rebuild|repair|exchange|discard|"
    r"import)\s+partition|"
    r"alter\s+(column\s+)?\S+\s+(set|drop)\s+default|"
    r"alter\s+(index|check)\s+|"
    r"(enable|disable)\s+keys|engine\s*=|auto_increment\s*=|comment\s*=|"
    r"convert\s+to|character\s+set|collate|order\s+by|algorithm\s*=|lock\s*=|"
    r"force\s*$|(with|without)\s+validation)",
    re.I,
)


def _parse_alter_spec(spec: str) -> list[DdlOp]:
    """Parse one ALTER spec into zero or more ops.

    Returns ``[]`` only for KNOWN schema-neutral spec classes (index /
    constraint / table-option churn).  A spec that starts like a
    column-changing op but fails to parse RAISES — the reference
    hard-fails on DDL parse errors (mysql_replication.go:140), and a
    silently dropped ALTER leaves the registry diverged from the stream,
    corrupting every subsequent row decode.
    """
    s = spec.strip()
    low = s.lower()
    if _ALTER_SKIP.match(low):
        return []
    # parenthesized multi-add: ADD [COLUMN] (a INT, b INT NOT NULL)
    m = re.match(r"^add\s+(?:column\s+)?\((?P<body>.+)\)\s*$", low, re.S)
    if m:
        schema = _parse_create_columns(s[m.start("body") : m.end("body")])
        return [
            DdlOp(action="add-column", column=f.name, dtype=f.dataType)
            for f in schema.fields
        ]
    m = re.match(
        rf"^add\s+(?:column\s+)?(?P<col>{_IDENT})\s+{_TYPE_RE}{_POS_RE}\s*$", low, re.S
    )
    if m:
        return [
            DdlOp(
                action="add-column",
                column=_ident(s[m.start("col") : m.end("col")]),
                dtype=_base_dtype(m),
                position=_position(m),
            )
        ]
    m = re.match(rf"^drop\s+(?:column\s+)?(?P<col>{_IDENT})\s*$", low)
    if m:
        return [DdlOp(action="drop-column", column=_ident(s[m.start("col") : m.end("col")]))]
    m = re.match(
        rf"^modify\s+(?:column\s+)?(?P<col>{_IDENT})\s+{_TYPE_RE}{_POS_RE}\s*$", low, re.S
    )
    if m:
        return [
            DdlOp(
                action="modify-column",
                column=_ident(s[m.start("col") : m.end("col")]),
                dtype=_base_dtype(m),
                position=_position(m),
            )
        ]
    m = re.match(
        rf"^change\s+(?:column\s+)?(?P<col>{_IDENT})\s+(?P<new>{_IDENT})\s+{_TYPE_RE}{_POS_RE}\s*$",
        low,
        re.S,
    )
    if m:
        return [
            DdlOp(
                action="change-column",
                column=_ident(s[m.start("col") : m.end("col")]),
                new_name=_ident(s[m.start("new") : m.end("new")]),
                dtype=_base_dtype(m),
                position=_position(m),
            )
        ]
    m = re.match(rf"^rename\s+column\s+(?P<a>{_IDENT})\s+to\s+(?P<b>{_IDENT})\s*$", low)
    if m:
        return [
            DdlOp(
                action="rename-column",
                column=_ident(s[m.start("a") : m.end("a")]),
                new_name=_ident(s[m.start("b") : m.end("b")]),
            )
        ]
    m = re.match(r"^rename\s+(?:index|key)\s+", low)
    if m:
        return []  # index rename: schema-neutral
    m = re.match(rf"^rename\s+(?:to\s+|as\s+)?(?P<t>{_IDENT})\s*$", low)
    if m:
        return [DdlOp(action="rename-table", new_table=_ident(s[m.start("t") : m.end("t")]))]
    if re.match(r"^(add|drop|modify|change)\b", low):
        raise ValueError(f"unparseable column-changing ALTER spec: {spec!r}")
    # anything else (engine/partition/tablespace noise) is schema-neutral
    return []


def _split_top_level(s: str, sep: str = ",") -> list[str]:
    out, depth, cur, quote = [], 0, [], None
    for ch in s:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in ("'", '"'):
            quote = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == sep and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


_COL_SKIP = re.compile(
    r"^\s*(primary\s+key|unique(\s+key|\s+index)?|key|index|constraint|foreign\s+key|"
    r"check)\b",
    re.I,
)


def _parse_create_columns(body: str) -> StructType:
    fields: list[StructField] = []
    for item in _split_top_level(body):
        item = item.strip()
        if not item or _COL_SKIP.match(item):
            continue
        m = re.match(rf"^(?P<col>{_IDENT})\s+{_TYPE_RE}\s*$", item.lower(), re.S)
        if not m:
            raise ValueError(f"unparseable column definition: {item!r}")
        name = _ident(item[m.start("col") : m.end("col")])
        nullable = "not null" not in m.group("dtype")
        fields.append(StructField(name, _base_dtype(m), nullable))
    return StructType(fields)


@dataclass
class ParsedDdl:
    db: str
    table: str
    ops: list[DdlOp] = field(default_factory=list)


def parse_ddl(sql: str, default_db: str) -> list[ParsedDdl]:
    """Parse one or more ``;``-separated MySQL DDL statements into
    per-table structured op lists (reference TableDdlParser analog;
    default-schema injection for unqualified table names)."""
    results: list[ParsedDdl] = []
    for stmt in _split_top_level(sql, ";"):
        stmt = stmt.strip().rstrip(";").strip()
        if not stmt or stmt.lower() == "begin":
            continue
        low = stmt.lower()

        m = re.match(rf"^alter\s+table\s+(?P<t>{_IDENT})\s+(?P<specs>.+)$", low, re.S)
        if m:
            db, table = _split_qualified(stmt[m.start("t") : m.end("t")], default_db)
            ops = []
            offset = m.start("specs")
            for raw_spec in _split_top_level(stmt[offset:]):
                ops.extend(_parse_alter_spec(raw_spec))
            results.append(ParsedDdl(db, table, ops))
            continue

        m = re.match(r"^rename\s+table\s+(?P<pairs>.+)$", low, re.S)
        if m:
            for pair in _split_top_level(stmt[m.start("pairs") :]):
                pm = re.match(rf"^\s*(?P<a>{_IDENT})\s+to\s+(?P<b>{_IDENT})\s*$", pair, re.I)
                if not pm:
                    raise ValueError(f"unparseable RENAME TABLE pair: {pair!r}")
                db, table = _split_qualified(pm.group("a"), default_db)
                _, new_t = _split_qualified(pm.group("b"), default_db)
                results.append(
                    ParsedDdl(db, table, [DdlOp(action="rename-table", new_table=new_t)])
                )
            continue

        m = re.match(
            rf"^create\s+table\s+(?:if\s+not\s+exists\s+)?(?P<t>{_IDENT})\s*\((?P<body>.*)\)\s*"
            r"(?:engine|default|comment|charset|character|collate|auto_increment|row_format|partition|\s*$).*",
            low,
            re.S,
        )
        if m:
            db, table = _split_qualified(stmt[m.start("t") : m.end("t")], default_db)
            body = stmt[m.start("body") : m.end("body")]
            results.append(
                ParsedDdl(
                    db,
                    table,
                    [DdlOp(action="create-table", schema=_parse_create_columns(body))],
                )
            )
            continue

        m = re.match(
            rf"^create\s+table\s+(?:if\s+not\s+exists\s+)?(?P<t>{_IDENT})\s+like\s+(?P<src>{_IDENT})\s*$",
            low,
            re.S,
        )
        if m:
            db, table = _split_qualified(stmt[m.start("t") : m.end("t")], default_db)
            sdb, stab = _split_qualified(stmt[m.start("src") : m.end("src")], default_db)
            results.append(
                ParsedDdl(
                    db, table, [DdlOp(action="create-table-like", new_table=f"{sdb}.{stab}")]
                )
            )
            continue

        m = re.match(r"^drop\s+table\s+(?:if\s+exists\s+)?(?P<t>[^;]+)$", low, re.S)
        if m:
            for t in _split_top_level(stmt[m.start("t") :]):
                db, table = _split_qualified(t.strip(), default_db)
                results.append(ParsedDdl(db, table, [DdlOp(action="drop-table")]))
            continue

        m = re.match(rf"^truncate\s+(?:table\s+)?(?P<t>{_IDENT})\s*$", low)
        if m:
            db, table = _split_qualified(stmt[m.start("t") : m.end("t")], default_db)
            results.append(ParsedDdl(db, table, [DdlOp(action="truncate-table")]))
            continue

        # non-table DDL (CREATE INDEX, analyze, grants, …): schema-neutral
    return results


def evolve_simple_cols(
    cols: list, sql: str, db: str, table: str
) -> list:
    """Apply a raw DDL statement to a ``[[name, spark simpleString]]``
    column list, TOLERANTLY (idempotent re-application is a no-op):
    the egress emitter evolves the previous publication's sidecar
    schema through the verbatim-forwarded statements to compute the
    RESIDUAL diff — any schema movement the forwarded DDL does not
    explain still emits as a synthesized ALTER, so the consumer's
    registry can never silently diverge from the producer store."""
    out = [list(c) for c in cols]

    def _idx(name: str) -> int | None:
        for i, (n, _dt) in enumerate(out):
            if n == name:
                return i
        return None

    for parsed in parse_ddl(sql, db):
        if (parsed.db, parsed.table) != (db, table):
            continue
        for op in parsed.ops:
            ops = (
                [
                    DdlOp(action="modify-column", column=op.column, dtype=op.dtype),
                    DdlOp(action="rename-column", column=op.column, new_name=op.new_name),
                ]
                if op.action == "change-column"
                else [op]
            )
            for o in ops:
                if o.action == "add-column":
                    if _idx(o.column) is None:
                        out.append([o.column, o.dtype.simpleString()])
                elif o.action == "drop-column":
                    i = _idx(o.column)
                    if i is not None:
                        out.pop(i)
                elif o.action == "modify-column":
                    i = _idx(o.column)
                    if i is not None:
                        out[i][1] = o.dtype.simpleString()
                elif o.action == "rename-column":
                    i = _idx(o.column)
                    if i is not None and _idx(o.new_name) is None:
                        out[i][0] = o.new_name
                elif o.action == "create-table" and o.schema is not None:
                    out = [
                        [f.name, f.dataType.simpleString()] for f in o.schema.fields
                    ]
                # table-level ops are schema-neutral for a column list
    return out


def apply_raw_ddl(registry, sql: str, default_db: str) -> list[tuple[str, str]]:
    """Parse raw DDL and apply every op to the registry; returns the
    (db, table) pairs touched.  ``change-column`` decomposes into
    rename + modify (the reference applies both in one pass,
    metas/mysql_ddl_parse.go:200-260); ``create-table-like`` copies the
    source table's current schema (reference :430-447)."""
    touched: list[tuple[str, str]] = []
    for parsed in parse_ddl(sql, default_db):
        for op in parsed.ops:
            if op.action == "change-column":
                registry.apply_ddl(
                    parsed.db,
                    parsed.table,
                    DdlOp(action="modify-column", column=op.column, dtype=op.dtype,
                          position=op.position),
                )
                registry.apply_ddl(
                    parsed.db,
                    parsed.table,
                    DdlOp(action="rename-column", column=op.column, new_name=op.new_name),
                )
            elif op.action == "create-table-like":
                sdb, stab = op.new_table.split(".")
                registry.apply_ddl(
                    parsed.db,
                    parsed.table,
                    DdlOp(action="create-table", schema=registry.get(sdb, stab)),
                )
            else:
                registry.apply_ddl(parsed.db, parsed.table, op)
        touched.append((parsed.db, parsed.table))
    return touched
