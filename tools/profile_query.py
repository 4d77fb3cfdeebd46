"""Per-job profile of one registered query (guide §1: measure first).

Runs ``queries()[name]`` once with the noop sink on a UI-enabled session
and prints every Spark job's duration, description, and shuffle volume
pulled from the UI REST API — the local[32] stand-in for "open the
Stages tab".  Chain queries (store builders) run dozens of small jobs;
this shows which of them own the wall clock.

Usage: python tools/profile_query.py <query> [sf_dir] [--plan]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from qin_cdc_spark.plans.registry import all_queries
from qin_cdc_spark.session import get_spark


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path) as r:
        return json.load(r)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("profile", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # warmup (JVM codegen + python workers), same as bench.py
    queries["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(spark.sparkContext.defaultParallelism).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, schema="id long").write.format("noop").mode(
        "overwrite"
    ).save()

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"
    jobs_before = {j["jobId"] for j in _api(base, "/jobs")}

    spark.catalog.clearCache()
    t0 = time.time()
    df = queries[name](spark, sf_dir)
    t_build = time.time() - t0
    df.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0

    if "--plan" in sys.argv:
        jqe = df._jdf.queryExecution()
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        print(jqe.explainString(mode))

    jobs = [j for j in _api(base, "/jobs") if j["jobId"] not in jobs_before]
    jobs.sort(key=lambda j: j["jobId"])
    total_job = 0.0
    rows = []
    for j in jobs:
        try:
            t1 = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            t2 = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            dur = time.mktime(t2) - time.mktime(t1)
        except (KeyError, ValueError):
            dur = -1
        # millisecond precision from the GMT fields when present
        try:
            ms1 = float(j["submissionTime"][20:23] or 0) / 1000
            ms2 = float(j["completionTime"][20:23] or 0) / 1000
            dur = dur - ms1 + ms2
        except (ValueError, IndexError):
            pass
        total_job += max(dur, 0)
        rows.append((dur, j["jobId"], j.get("description") or j["name"], j))
    print(f"\n=== {name}: wall {wall:.2f}s (build {t_build:.2f}s), "
          f"{len(jobs)} jobs, sum(job durations) {total_job:.2f}s ===")
    for dur, jid, desc, j in rows:
        print(f"  job {jid:4d}  {dur:7.2f}s  tasks={j.get('numTasks', '?'):5}  "
              f"{desc[:140]}")
    # top stages by time with shuffle volumes
    stages = _api(base, "/stages?status=COMPLETE")
    stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
    print("\n--- top stages by executorRunTime ---")
    for s in stages[:15]:
        print(
            f"  stage {s['stageId']:4d}  run {s['executorRunTime']/1000.0:8.2f}s  "
            f"tasks={s['numCompleteTasks']:4d}  "
            f"in {s.get('inputBytes', 0)/1e6:8.1f}MB  "
            f"shW {s.get('shuffleWriteBytes', 0)/1e6:8.1f}MB  "
            f"shR {s.get('shuffleReadBytes', 0)/1e6:8.1f}MB  "
            f"{(s.get('description') or s['name'])[:100]}"
        )
    from qin_cdc_spark.session import cleanup_session_tmp
    from qin_cdc_spark.testing import cleanup_gate_tmp

    cleanup_gate_tmp()
    cleanup_session_tmp()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
