"""CDF-pruning cost vs store size, with and without the auto-rebucket
policy (VERDICT r10 #4 "done" evidence): a ONE-KEY delta's
`changes_between` on a store grown by reseeded-copy union.  Without
rebucketing, the pruned CDF's residual growth is bucket size at fixed
n_buckets; with `auto_rebucket_bytes` set, the merge doubles the bucket
count as the table grows, so the pruned CDF's read stays ~flat.

Usage: python3 tools/cdf_scale.py [sf_dir] [copies,copies,...] [runs]
Prints one JSON line per (scale, policy).
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


def _stream(spark, sf_dir: str, copies: int):
    """The r10 curve's store: the lineitem table (deduped composite PK)
    plus copies-1 key-offset replicas."""
    base = load_table(spark, sf_dir, "lineitem").dropDuplicates(
        ["l_orderkey", "l_linenumber"]
    ).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_discount", "l_returnflag", "l_shipdate",
    )
    max_key = base.agg(F.max("l_orderkey")).collect()[0][0]
    parts = [
        base.withColumn(
            "l_orderkey",
            (F.col("l_orderkey") + F.lit(i * (max_key + 1))).cast("long"),
        )
        for i in range(copies)
    ]
    full = parts[0]
    for p in parts[1:]:
        full = full.unionByName(p)
    return full.select(
        F.lit("insert").alias("op"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("seq"),
        "*",
    )


def measure(spark, sf_dir: str, copies: int, runs: int, rebucket: bool) -> dict:
    from qin_cdc_spark.streaming.versioned import VersionedBucketedTable

    base = session_tmp(f"cdfscale_{copies}x_{'rb' if rebucket else 'fix'}_")
    tbl = VersionedBucketedTable(
        spark, base + "/t", ["l_orderkey", "l_linenumber"], n_buckets=32,
        # ~512 KB/bucket target: the 1x lineitem store (~9 MB parquet)
        # stays at 32 buckets, the grown ones rebucket
        auto_rebucket_bytes=(512 << 10) if rebucket else None,
    )
    tbl.merge(_stream(spark, sf_dir, copies), batch_id=0)
    man = tbl._meta()["versions"][str(tbl.current_version())]
    nb = tbl._manifest_n_buckets(man)
    v0 = tbl.current_version()
    # the r10 curve's one-key delta: every line row of ONE order —
    # derived from the stream itself so the types match the store
    # exactly (a literal batch with different types would trip the
    # MODIFY full rewrite and ruin the delta measurement)
    first_key = _stream(spark, sf_dir, 1).agg(F.min("l_orderkey")).collect()[0][0]
    one = (
        _stream(spark, sf_dir, 1)
        .filter(F.col("l_orderkey") == first_key)
        .withColumn("seq", (F.col("seq") + F.lit(1 << 40)).cast("long"))
        .withColumn("op", F.lit("update"))
    )
    tbl.merge(one, batch_id=1)
    v1 = tbl.current_version()
    ts = []
    files = None
    for _ in range(runs):
        spark.catalog.clearCache()
        cdf = tbl.changes_between(v0, v1, include_preimage=True)
        t0 = time.monotonic()
        cdf.write.format("noop").mode("overwrite").save()
        ts.append(time.monotonic() - t0)
        if files is None:
            files = len(cdf.inputFiles())
    total_bytes = 0
    for d in set(man["buckets"].values()):
        p = os.path.join(tbl.path, d)
        if os.path.isdir(p):
            total_bytes += sum(
                os.path.getsize(os.path.join(p, f))
                for f in os.listdir(p)
                if f.endswith(".parquet")
            )
    return {
        "scale": f"{copies}x",
        "policy": "auto_rebucket" if rebucket else "fixed_32",
        "n_buckets": nb,
        "store_bytes_mb": round(total_bytes / (1 << 20), 1),
        "cdf_files_opened": files,
        "cdf_noop_s": round(statistics.median(ts), 3),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    scales = (
        [int(c) for c in sys.argv[2].split(",")] if len(sys.argv) > 2 else [1, 4, 10]
    )
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    spark = get_spark("cdf_scale")
    spark.sparkContext.setLogLevel("ERROR")
    for copies in scales:
        for rebucket in (False, True):
            print(
                json.dumps(measure(spark, sf_dir, copies, runs, rebucket)),
                flush=True,
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
