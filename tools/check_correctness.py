"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same parquet fixtures, then compares row count, column
names, and an order-insensitive canonical value-hash (floats rounded to
9 significant digits, timestamps ISO-formatted, rows sorted).

Usage:  python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time
from datetime import date, datetime
from decimal import Decimal
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

from qin_cdc_spark.session import get_spark
from qin_cdc_spark.sources.tables import TABLES


def canon_value(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            return "0"
        return f"{v:.9g}"
    if isinstance(v, Decimal):
        return canon_value(float(v))
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon_rows(cols: list[str], rows) -> tuple[int, str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(canon_value(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()
    return len(lines), h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    spark = get_spark("check_correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = n_rowsonly = 0
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            spark_cols = df.columns
            # Gate outputs must be scalar-only: the DRIVER's canonicalizer
            # sorts a pandas frame, and array/struct/map cells arrive as
            # numpy.ndarray/dict → "unhashable type" crash even when values
            # match (round-2 emb_quantize_int8 red row).  Reject here so the
            # local gate catches the class before the driver does.
            from pyspark.sql.types import ArrayType, MapType, StructType

            complex_cols = [
                f.name
                for f in df.schema.fields
                if isinstance(f.dataType, (ArrayType, MapType, StructType))
            ]
            if complex_cols:
                print(
                    f"FAIL {name}: complex-typed output columns {complex_cols} "
                    "(gate outputs must be scalar — array_join/flatten them)"
                )
                n_fail += 1
                failures.append(name)
                continue
            spark_rows = df.collect()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(spark_rows)} rows  ({time.time()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            cur = con.execute(oracles[name])
            duck_cols = [d[0] for d in cur.description]
            duck_rows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            failures.append(name)
            continue
        sc, sh = canon_rows(spark_cols, spark_rows)
        dc, dh = canon_rows(duck_cols, duck_rows)
        cols_match = sorted(spark_cols) == sorted(duck_cols)
        ok = cols_match and sc == dc and sh == dh
        if ok:
            n_pass += 1
            print(f"PASS {name}: {sc} rows  ({time.time()-t0:.1f}s)")
        else:
            n_fail += 1
            failures.append(name)
            print(
                f"FAIL {name}: rows {sc} vs {dc}; cols match={cols_match} "
                f"({sorted(spark_cols)} vs {sorted(duck_cols)}); hash {'=' if sh==dh else '!='}"
            )
            if sc == dc and cols_match:
                order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
                s_lines = sorted(
                    "\x01".join(canon_value(r[i]) for i in order) for r in spark_rows
                )
                dorder = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
                d_lines = sorted(
                    "\x01".join(canon_value(r[i]) for i in dorder) for r in duck_rows
                )
                shown = 0
                for a, b in zip(s_lines, d_lines):
                    if a != b:
                        print(f"   spark: {a[:200]}\n   duck : {b[:200]}")
                        shown += 1
                        if shown >= 3:
                            break
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    if failures:
        print("failures:", " ".join(failures))
    # gate temp-store hygiene: queries defer cleanup by one (gate_tmp);
    # drop the final query's trees AND this process's session caches
    # (landed streams, bucketed layouts, default checkpoints — VERDICT
    # r8 "what's wrong" #1), then assert nothing of ours remains.  The
    # leak glob now covers the session-cache prefixes too; leaks print
    # as WARN by default (a CONCURRENT harness legitimately owns live
    # trees) and fail the run under SPARK_GRAFT_STRICT_TMP=1 (the
    # single-process CI form of "net zero, asserted").
    from qin_cdc_spark.session import cleanup_session_tmp
    from qin_cdc_spark.testing import cleanup_gate_tmp

    cleanup_gate_tmp()
    cleanup_session_tmp()
    import glob as _glob
    import os as _os
    import tempfile as _tempfile

    leaked = [
        d
        for pat in ("*_gate_*", "*_scan_*", "zonemap_*", "zorder_*",
                    "dpp_*", "bloom_*", "rollup_gate*",
                    "land_*", "bucketed_*", "cdc_ckpt_*", "bench_cdc_*")
        for d in _glob.glob(str(Path(_tempfile.gettempdir()) / pat))
    ]
    print(f"temp_leak_count={len(leaked)}")
    if leaked:
        print(f"WARN: {len(leaked)} temp trees left under /tmp: "
              f"{leaked[:5]}")
        if _os.environ.get("SPARK_GRAFT_STRICT_TMP") == "1":
            spark.stop()
            return 1
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
