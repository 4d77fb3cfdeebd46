"""Audit result-TYPE parity between every Spark gate query and its DuckDB oracle.

The driver's value-hash is type-sensitive in ways the local checker's
float-canonicalization hides (round-1 evidence: DuckDB ``sum(int)`` returns
HUGEINT / Arrow decimal128 where Spark returns bigint → hash-fail despite
value-equal rows).  This tool runs each pair at sf0.001 and prints any
column whose DuckDB logical type does not map onto the Spark type, so the
oracle (or query) can be cast until both sides agree.

Usage:  python tools/audit_types.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

from qin_cdc_spark.session import get_spark
from qin_cdc_spark.sources.tables import TABLES

# DuckDB type name (prefix) → acceptable Spark simpleString (prefix).
_OK = {
    "BIGINT": {"bigint"},
    "INTEGER": {"int"},
    "SMALLINT": {"smallint"},
    "TINYINT": {"tinyint"},
    "DOUBLE": {"double"},
    "FLOAT": {"float"},
    "VARCHAR": {"string"},
    "BOOLEAN": {"boolean"},
    "DATE": {"date"},
    "TIMESTAMP": {"timestamp"},
    "BLOB": {"binary"},
}


def _compat(duck_t: str, spark_t: str) -> bool:
    duck_t = duck_t.upper()
    if duck_t.startswith("DECIMAL"):
        return spark_t.startswith("decimal")
    if duck_t == "HUGEINT":
        return False  # Spark has no int128; always a mismatch
    if duck_t.endswith("[]"):
        return spark_t.startswith("array") and _compat(
            duck_t[:-2], spark_t[len("array<") : -1]
        )
    for prefix, sparks in _OK.items():
        if duck_t.startswith(prefix):
            return any(spark_t.startswith(s) for s in sparks)
    return False  # unknown duck type: flag it for a look


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    spark = get_spark("audit_types")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_bad = 0
    for name in qs:
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        try:
            df = qs[name](spark, sf_dir)
            spark_types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
            desc = con.execute(
                "DESCRIBE " + oracles[name]
            ).fetchall()  # (column_name, column_type, ...)
            duck_types = {d[0]: d[1] for d in desc}
        except Exception as e:  # noqa: BLE001 — audit keeps going
            print(f"ERR  {name}: {e}")
            n_bad += 1
            continue
        bad = []
        for col, dt in duck_types.items():
            st = spark_types.get(col)
            if st is None:
                bad.append(f"{col}: missing on spark side")
            elif not _compat(dt, st):
                bad.append(f"{col}: duck={dt} spark={st}")
        for col in spark_types:
            if col not in duck_types:
                bad.append(f"{col}: missing on duck side")
        if bad:
            n_bad += 1
            print(f"MISMATCH {name}: " + "; ".join(bad))
    print(f"\n{n_bad} queries with type mismatches")
    # the audit BUILDS every gate query (stores and all) — drop its
    # gate/session temp trees like every other harness
    from qin_cdc_spark.session import cleanup_session_tmp
    from qin_cdc_spark.testing import cleanup_gate_tmp

    cleanup_gate_tmp()
    cleanup_session_tmp()
    spark.stop()
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
