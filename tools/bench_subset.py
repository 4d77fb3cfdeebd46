"""Time a SUBSET of registered queries with bench.py's exact
methodology (median of N runs, noop sink, clearCache between samples,
same warmups) — the A/B loop for optimization work without paying the
full-bench wall clock.  Interleaves the bench's calibration workload
before/after so host drift is visible in the output.

Usage: python tools/bench_subset.py <query> [query ...] [--runs N] [--sf DIR]
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from qin_cdc_spark.plans.registry import all_queries
from qin_cdc_spark.session import get_spark


def main() -> int:
    args = sys.argv[1:]
    runs = 3
    sf_dir = "/root/testdata/sf0.1"
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    spark = get_spark("bench_subset")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # warmups, identical to bench.py
    queries["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(spark.sparkContext.defaultParallelism).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, schema="id long").write.format("noop").mode(
        "overwrite"
    ).save()

    import pyspark.sql.functions as F

    def cal() -> float:
        t0 = time.time()
        (
            spark.range(0, 20_000_000, 1, 32)
            .select((F.xxhash64("id") % 997).alias("k"), "id")
            .groupBy("k")
            .agg(F.sum("id").alias("s"), F.count(F.lit(1)).alias("c"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        return round(time.time() - t0, 3)

    cal_samples = [cal()]
    timings: dict[str, float] = {}
    for name in names:
        samples = []
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.time()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(time.time() - t0)
        timings[name] = round(statistics.median(samples), 3)
        print(
            f"  {name}: median {timings[name]} "
            f"(samples {[round(s, 3) for s in samples]})",
            file=sys.stderr,
        )
    cal_samples.append(cal())
    print(
        json.dumps(
            {
                "queries": timings,
                "calibration_samples": cal_samples,
                "runs": runs,
                "sf_dir": sf_dir,
            }
        )
    )
    from qin_cdc_spark.session import cleanup_session_tmp
    from qin_cdc_spark.testing import cleanup_gate_tmp

    cleanup_gate_tmp()
    cleanup_session_tmp()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
