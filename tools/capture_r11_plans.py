"""Capture the r11 before/after plan evidence (run on a quiet host).

1. stream-merge current-side pruning: the old driver-probe form
   (literal isin PartitionFilter) vs the new broadcast-semi-join form
   (dynamicpruning PartitionFilter) over the SAME bucketed store —
   plans/r11/stream_merge_pruned_current_{before,after}.txt
2. the partitioned one-write-per-batch union plan —
   plans/r11/cdc_partitioned_merge_union_write_after.txt (the before
   shape was |partitions| separate per-slice write plans; the action
   counts are in the *_jobs_{before,after}.txt profiles).

Usage: python3 tools/capture_r11_plans.py
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

from qin_cdc_spark.session import get_spark

OUT = Path(__file__).resolve().parent.parent / "plans" / "r11"


def _plan(df) -> str:
    jqe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jqe.explainString(mode)


def main() -> int:
    from qin_cdc_spark.streaming.cdc_stream import BucketedUpsertTable

    spark = get_spark("capture_plans", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    d = tempfile.mkdtemp(prefix="plans_r11_")
    t = BucketedUpsertTable(spark, d + "/t", ["k"], n_buckets=8)
    t.merge(
        spark.createDataFrame(
            [("insert", i, i, f"v{i}") for i in range(64)],
            "op string, seq long, k long, val string",
        )
    )
    raw = spark.createDataFrame(
        [("src", "update", 100, 3, "x"), ("oth", "insert", 101, 7, "z")],
        "db string, op string, seq long, k long, val string",
    )
    ch = raw.filter(F.col("db") == "src").drop("db")
    inc = ch.select(
        "k", "val",
        F.col("seq").cast("long").alias("_seq"),
        (F.col("op") == "delete").alias("_deleted"),
    ).withColumn("_bucket", t._bucket_expr())

    # BEFORE: the r10 shape — driver probe collect (an extra Spark
    # action, paid here to build the literal), then isin pruning
    touched = [r[0] for r in inc.select("_bucket").distinct().collect()]
    before = t._read_full(t._stored_schema()).filter(
        F.col("_bucket").isin(touched)
    )
    (OUT / "stream_merge_pruned_current_before.txt").write_text(
        "# r10 shape: touched collected driver-side (1 extra action), "
        f"literal pruning isin({touched})\n" + _plan(before)
    )
    # AFTER: broadcast semi-join; DPP inserts the dynamicpruning filter
    after = t._pruned_current(t._stored_schema(), inc)
    (OUT / "stream_merge_pruned_current_after.txt").write_text(
        "# r11 shape: broadcast semi-join on the bucket partition "
        "column; no probe action\n" + _plan(after)
    )

    # Partitioned union write plan (the ONE action that replaced
    # |partitions| per-slice writes)
    from qin_cdc_spark.streaming.partitioned import PartitionedVersionedTable
    from qin_cdc_spark.streaming.versioned import _nullable_schema  # noqa: F401

    pt = PartitionedVersionedTable(
        spark, d + "/p", ["k"], partition_col="yr", n_buckets=4
    )
    sch = "op string, seq long, k long, yr int, val string"
    pt.merge(
        spark.createDataFrame(
            [("insert", i, i, 1990 + (i % 3), f"v{i}") for i in range(1, 25)],
            sch,
        ),
        batch_id=0,
    )
    # rebuild the union frame exactly as merge() does, for the plan dump
    changes = spark.createDataFrame(
        [("update", 100 + i, i, 1990 + (i % 3), f"w{i}") for i in range(1, 7)],
        sch,
    )
    pairs = changes.select(
        F.col("yr"),
        pt._sub("1990", pt._manifest()["1990"]["gen"])._bucket_expr(4).alias("_b"),
    ).distinct().collect()
    buckets_of: dict = {}
    for r in pairs:
        buckets_of.setdefault(r[0], []).append(r[1])
    tagged = []
    for pv, bks in sorted(buckets_of.items()):
        pstr = str(pv)
        ent = pt._manifest()[pstr]
        sub = pt._sub(pstr, ent["gen"])
        scur = sub._meta()["versions"][str(sub.current_version())]
        inc2 = sub._incoming_frame(
            changes.filter(F.col("yr") == F.lit(pv)), "op", "seq", 4
        )
        tb = sorted({str(int(b)) for b in bks}, key=int)
        merged = sub._merged_frame(inc2, scur, 4, tb)
        tagged.append(merged.withColumn("_part", F.lit(pstr)))
    union = tagged[0]
    for tg in tagged[1:]:
        union = union.unionByName(tg)
    union = union.repartition(6, F.col("_part"), F.col("_bucket"))
    (OUT / "cdc_partitioned_merge_union_write_after.txt").write_text(
        "# r11: ALL slices' merged frames land in one "
        "partitionBy(_part,_bucket) write (this plan); r10 ran one "
        "write action per slice\n" + _plan(union)
    )
    print("wrote", sorted(p.name for p in OUT.glob("*.txt")))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
