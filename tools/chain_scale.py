"""Chain-family scale evidence (VERDICT r10 #7): at sf0.1 the store
chains are bounded by per-action driver fixed cost, not compute — the
8-core scaling block is uninformative (≈1 everywhere).  This tool
produces the direct evidence for the 100 TB claim instead: build the
cdc_partitioned_mv_chain state at 1× and ~10× store size (reseeded
key-offset copies, the evolution_scale.py method), then measure a
FIXED-DELTA refresh tick (one-key batch per partition → parent merge →
two MV refreshes → one egress emission) at each scale, recording wall
time, the SUM of Spark job durations inside the tick, and the job
count via the UI REST API.

Reading: if job-time-sum stays ~flat while the store grows 10×, the
tick is O(delta) as designed and the wall is action-bound (the fixed
cost the chain work amortizes at real scale); job-time-sum growing
~10× would mean an O(store) term hides in the refresh path.

Usage:  python3 tools/chain_scale.py [sf_dir] [copies,copies,...]
Prints one JSON line per scale.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

from qin_cdc_spark.session import get_spark, session_tmp
from qin_cdc_spark.sources.tables import load_table


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path) as r:
        return json.load(r)


def _jobs(spark):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    return _api(ui, f"/api/v1/applications/{app}/jobs?status=succeeded")


def _job_stats_since(spark, first_job_id: int) -> tuple[int, float]:
    js = [j for j in _jobs(spark) if j["jobId"] >= first_job_id]
    total = 0.0
    for j in js:
        t0 = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
        t1 = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
        ms0 = int(j["submissionTime"][20:23])
        ms1 = int(j["completionTime"][20:23])
        total += (time.mktime(t1) + ms1 / 1e3) - (time.mktime(t0) + ms0 / 1e3)
    return len(js), total


def _stream(spark, sf_dir: str, copies: int):
    """Insert stream: orders snapshot + (copies-1) key-offset replicas,
    with the mv_chain's o_year partition column."""
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        F.year("o_orderdate").alias("o_year"),
    )
    max_key = base.agg(F.max("o_orderkey")).collect()[0][0]
    parts = [
        base.withColumn(
            "o_orderkey",
            (F.col("o_orderkey") + F.lit(i * (max_key + 1))).cast("long"),
        )
        for i in range(copies)
    ]
    full = parts[0]
    for p in parts[1:]:
        full = full.unionByName(p)
    return full.select(
        F.lit("insert").alias("op"), F.col("o_orderkey").alias("seq"), "*"
    ), max_key


def measure(spark, sf_dir: str, copies: int, ticks: int = 3) -> dict:
    from qin_cdc_spark.streaming.cdc_stream import emit_store_egress
    from qin_cdc_spark.streaming.derived import DerivedKeyedAggTable
    from qin_cdc_spark.streaming.partitioned import PartitionedVersionedTable

    base = session_tmp(f"chainscale_{copies}x_")
    tbl = PartitionedVersionedTable(
        spark, base + "/t", ["o_orderkey"], partition_col="o_year", n_buckets=4
    )
    mv1 = DerivedKeyedAggTable(
        spark, base + "/lvl1", group_cols=["o_custkey"], sum_cols=[], n_buckets=8
    )
    mv2 = DerivedKeyedAggTable(
        spark, base + "/lvl2", group_cols=["cnt"], sum_cols=[], n_buckets=4,
        cnt_col="n_custs",
    )
    stream, max_key = _stream(spark, sf_dir, copies)
    t0 = time.monotonic()
    tbl.merge(stream, batch_id=0)
    mv1.refresh(tbl)
    mv2.refresh(mv1.store)
    eg = base + "/egress"
    emit_store_egress(tbl, eg, database="src", table_name="orders")
    build_s = time.monotonic() - t0
    rows = tbl.read().count()
    years = [int(p) for p in tbl.partitions()]

    out = {
        "scale": f"{copies}x", "rows": rows, "build_s": round(build_s, 2),
        "ticks": [],
    }
    # one real key per partition (the partition column is immutable per
    # key — the delta must update keys IN their own partitions); the
    # same keys exist at every scale, so the delta is scale-constant
    probe = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey"), F.year("o_orderdate").alias("o_year")
    )
    key_of = {
        r.o_year: r.o_orderkey
        for r in probe.groupBy("o_year").agg(F.min("o_orderkey").alias("o_orderkey"))
        .select("o_orderkey", "o_year").collect()
    }
    seq0 = 1 << 40
    for i in range(ticks):
        batch = spark.createDataFrame(
            [
                ("update", seq0 + i * 100 + y, int(key_of[y]), 1, "O", 42.0, y)
                for y in years
                if y in key_of
            ],
            "op string, seq long, o_orderkey long, o_custkey long, "
            "o_orderstatus string, o_totalprice double, o_year int",
        )
        first_job = max((j["jobId"] for j in _jobs(spark)), default=-1) + 1
        t0 = time.monotonic()
        tbl.merge(batch, batch_id=i + 1)
        mv1.refresh(tbl)
        mv2.refresh(mv1.store)
        emit_store_egress(tbl, eg, database="src", table_name="orders")
        wall = time.monotonic() - t0
        n_jobs, job_sum = _job_stats_since(spark, first_job)
        out["ticks"].append(
            {
                "wall_s": round(wall, 2),
                "jobs": n_jobs,
                "job_sum_s": round(job_sum, 2),
            }
        )
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    scales = (
        [int(c) for c in sys.argv[2].split(",")] if len(sys.argv) > 2 else [1, 10]
    )
    spark = get_spark("chain_scale", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    for copies in scales:
        print(json.dumps(measure(spark, sf_dir, copies)), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
