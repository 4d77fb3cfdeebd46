"""Schema-evolution cost vs STORE SIZE (VERDICT r9 #4): measure the
bucketed target's plain merge / ADD COLUMN / MODIFY paths — and the
SCD2 store's ``expire_history`` — at sf0.1 and at a ~10× synthesized
store, so the "ADD is O(delta), MODIFY is the one O(store) operation"
claim carries a measured constant at the next order of magnitude.

The 10× store unions the sf0.1 orders snapshot with 9 reseeded copies
(keys offset by i·max_key — distinct keys, same value distribution),
so both scales share bucket count, row shape, and host; only the table
bytes change.  Each mutation batch touches ONE key, so the delta cost
is constant and any growth in the timing is the store-size term.

Usage:  python3 tools/evolution_scale.py [sf_dir] [runs] [copies,copies,…]
Prints one JSON line per (scale, op) with the median of ``runs``.
Default scales 1,10; pass ``1,10,100`` for the ~15M-row point (the
100× store is where the O(store) term clearly dominates the constant).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

from qin_cdc_spark.session import get_spark, session_tmp
from qin_cdc_spark.sources.tables import load_table


def _snapshot_changes(spark, sf_dir: str, copies: int):
    """(op, seq, orders…) insert stream: the sf0.1 snapshot plus
    ``copies-1`` key-offset replicas."""
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority",
    )
    max_key = base.agg(F.max("o_orderkey")).collect()[0][0]
    parts = [
        base.withColumn(
            "o_orderkey", (F.col("o_orderkey") + F.lit(i * (max_key + 1))).cast("long")
        )
        for i in range(copies)
    ]
    full = parts[0]
    for p in parts[1:]:
        full = full.unionByName(p)
    return full.select(
        F.lit("insert").alias("op"),
        F.col("o_orderkey").alias("seq"),
        "*",
    )


def _one_key_batch(spark, key: int, seq: int, extra=None, retype=None):
    row = [(key, 1, "O", 100.0, "1-URGENT")]
    schema = (
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderpriority string"
    )
    df = spark.createDataFrame(row, schema).select(
        F.lit("update").alias("op"), F.lit(seq).cast("long").alias("seq"), "*"
    )
    if extra is not None:
        df = df.withColumn(extra, F.lit(7).cast("long"))
    if retype is not None:
        df = df.withColumn(retype, F.col(retype).cast("string"))
    return df


def measure(spark, sf_dir: str, copies: int, runs: int) -> dict:
    from qin_cdc_spark.streaming.cdc_stream import BucketedUpsertTable
    from qin_cdc_spark.streaming.scd2 import ScdType2Table

    label = f"{copies}x"
    base = session_tmp(f"evoscale_{label}_")
    tbl = BucketedUpsertTable(spark, base + "/t", ["o_orderkey"], n_buckets=32)
    changes = _snapshot_changes(spark, sf_dir, copies)
    t0 = time.monotonic()
    tbl.merge(changes)
    t_build = time.monotonic() - t0
    n_rows = tbl.read().count()

    out = {"scale": label, "rows": n_rows, "build_s": round(t_build, 2)}
    seq = 10_000_000

    def _med(fn, tag):
        ts = []
        for i in range(runs):
            t0 = time.monotonic()
            fn(i)
            ts.append(time.monotonic() - t0)
        out[tag] = round(statistics.median(ts), 2)

    _med(lambda i: tbl.merge(_one_key_batch(spark, 1, seq + i)), "merge_s")
    # each iteration ADDs a fresh column (the path is only O(delta) the
    # first time a given column appears)
    _med(
        lambda i: tbl.merge(
            _one_key_batch(spark, 2, seq + 100 + i, extra=f"x{i}")
        ),
        "add_column_s",
    )
    # each iteration retypes a DIFFERENT column (long→string widen for
    # the added x<i> columns — same full-rewrite path as any MODIFY)
    _med(
        lambda i: tbl.merge(
            _one_key_batch(spark, 3, seq + 200 + i).withColumn(
                f"x{i}", F.lit("s").cast("string")
            )
        ),
        "modify_s",
    )

    # SCD2 expire: history = the same insert stream + a second version
    # for every key (one update wave), floor at the update seq
    scd = ScdType2Table(spark, base + "/h", keys=["o_orderkey"], n_buckets=32)
    scd.apply_batch(changes, batch_id=0)
    wave = changes.select(
        F.lit("update").alias("op"),
        (F.col("seq") + F.lit(50_000_000)).alias("seq"),
        *[c for c in changes.columns if c not in ("op", "seq")],
    )
    scd.apply_batch(wave, batch_id=1)
    t0 = time.monotonic()
    scd.expire_history(50_000_000)
    out["scd2_expire_s"] = round(time.monotonic() - t0, 2)
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    scales = (
        [int(c) for c in sys.argv[3].split(",")]
        if len(sys.argv) > 3
        else [1, 10]
    )
    spark = get_spark()
    for copies in scales:
        print(json.dumps(measure(spark, sf_dir, copies, runs)), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
