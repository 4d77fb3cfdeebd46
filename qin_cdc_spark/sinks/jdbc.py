"""Relational (JDBC/DB-API) upsert-apply sink — SURVEY §2.A A24-A27.

Reference parity:
- bulk multi-VALUES upsert `INSERT … ON DUPLICATE KEY UPDATE c=VALUES(c)`
  over non-PK columns: outputs/mysql/mysql_utils.go:45-88
- single-PK bulk delete `DELETE … WHERE pk IN (…)`:
  outputs/mysql/mysql_utils.go:114-134
- multi-PK per-row delete `DELETE … WHERE pk1=? AND pk2=?`:
  outputs/mysql/mysql_utils.go:90-112.  ⚠️ The reference binds the
  values from a nil map there (args always NULL — SURVEY §4.3.2); we
  bind from the row image, which is divergence-by-intent.
- ordered apply: instead of splitting the batch into consecutive
  delete/upsert runs (outputs/mysql/mysql.go:172-202), the batch is
  reduced to its last event per key first (latest_by_key), then applied
  as one delete-set + one upsert-set — order-safe and fewer statements.

Column order is deterministic (explicit list, the reference's
``MapMapperOrder`` fix for Go map-iteration nondeterminism,
core/meta.go:80-103 / SURVEY §4.3.1).

Scale: ``apply_batch_dbapi`` runs inside ``foreachBatch`` /
``foreachPartition`` — each executor partition opens one connection and
writes its slice; statements batch ``max_rows_per_stmt`` rows like the
reference's 10240-row flush (BASELINE.md).

Execution caveat: the MySQL-dialect SQL text is exact to the reference
(``ON DUPLICATE KEY UPDATE``/backtick quoting, verified in
tests/test_registry_sinks.py) but this container has no MySQL server —
the executed leg of the tests runs the sqlite dialect end-to-end over a
real DB-API connection.  On a deployment with MySQL, pass
``dialect="mysql"`` and a mysql-connector ``connect`` callable; the code
path is identical.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qin_cdc_spark.cdc.apply import latest_by_key


def quote_ident(name: str) -> str:
    return '`' + name.replace('`', '``') + '`'


def generate_bulk_upsert(
    table: str,
    columns: Sequence[str],
    pk_cols: Sequence[str],
    rows: Sequence[Sequence],
    *,
    dialect: str = "mysql",
) -> tuple[str, list]:
    """Multi-VALUES upsert updating non-PK columns on key conflict."""
    non_pk = [c for c in columns if c not in pk_cols]
    cols_sql = ", ".join(quote_ident(c) for c in columns)
    placeholders = "(" + ", ".join("?" for _ in columns) + ")"
    values_sql = ", ".join([placeholders] * len(rows))
    if dialect == "mysql":
        update = ", ".join(f"{quote_ident(c)}=VALUES({quote_ident(c)})" for c in non_pk)
        sql = (
            f"INSERT INTO {quote_ident(table)} ({cols_sql}) VALUES {values_sql} "
            f"ON DUPLICATE KEY UPDATE {update}"
        )
    elif dialect == "sqlite":
        pk_sql = ", ".join(quote_ident(c) for c in pk_cols)
        update = ", ".join(f"{quote_ident(c)}=excluded.{quote_ident(c)}" for c in non_pk)
        sql = (
            f"INSERT INTO {quote_ident(table)} ({cols_sql}) VALUES {values_sql} "
            f"ON CONFLICT({pk_sql}) DO UPDATE SET {update}"
        )
    else:
        raise ValueError(f"unknown dialect {dialect!r}")
    params = [v for row in rows for v in row]
    return sql, params


def generate_bulk_delete(
    table: str,
    pk_cols: Sequence[str],
    key_rows: Sequence[Sequence],
) -> tuple[str, list]:
    """Single-PK: one IN-list statement; multi-PK: OR of AND-equalities
    (one statement, values bound from the row image — the reference's
    per-row variant with its nil-bind bug fixed)."""
    if len(pk_cols) == 1:
        placeholders = ", ".join("?" for _ in key_rows)
        sql = (
            f"DELETE FROM {quote_ident(table)} "
            f"WHERE {quote_ident(pk_cols[0])} IN ({placeholders})"
        )
        return sql, [r[0] for r in key_rows]
    conj = "(" + " AND ".join(f"{quote_ident(c)} = ?" for c in pk_cols) + ")"
    sql = f"DELETE FROM {quote_ident(table)} WHERE " + " OR ".join([conj] * len(key_rows))
    return sql, [v for row in key_rows for v in row]


def apply_batch_dbapi(
    batch: DataFrame,
    *,
    table: str,
    pk_cols: list[str],
    connect: Callable[[], object],
    dialect: str = "sqlite",
    op_col: str = "op",
    seq_col: str = "seq",
    max_rows_per_stmt: int = 1024,
) -> None:
    """LWW-reduce a (op, seq, *cols) change batch, then apply deletes +
    upserts through a DB-API connection per partition.

    The per-key reduction makes one-statement-per-set ordering-safe
    (A27): after reduction there is at most one event per key, so
    deletes and upserts touch disjoint keys.
    """
    reduced = latest_by_key(batch, pk_cols, seq_col=seq_col)
    value_cols = [c for c in reduced.columns if c not in {op_col, seq_col}]

    def write_partition(rows_iter) -> None:
        conn = connect()
        try:
            cur = conn.cursor()
            dels: list[list] = []
            ups: list[list] = []
            for row in rows_iter:
                if row[op_col] == "delete":
                    dels.append([row[c] for c in pk_cols])
                else:
                    ups.append([row[c] for c in value_cols])
            for i in range(0, len(dels), max_rows_per_stmt):
                sql, params = generate_bulk_delete(table, pk_cols, dels[i : i + max_rows_per_stmt])
                cur.execute(sql, params)
            for i in range(0, len(ups), max_rows_per_stmt):
                sql, params = generate_bulk_upsert(
                    table, value_cols, pk_cols, ups[i : i + max_rows_per_stmt], dialect=dialect
                )
                cur.execute(sql, params)
            conn.commit()
        finally:
            conn.close()

    reduced.select(op_col, seq_col, *value_cols).foreachPartition(write_partition)
