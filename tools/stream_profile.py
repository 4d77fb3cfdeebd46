"""Job/action profile of the streaming CDC bench path (stream_cdc_orders):
replicates bench.py::_bench_stream_cdc on a UI-enabled session and
prints wall time, total job count, and per-description job counts — the
actions/micro-batch evidence for VERDICT r10 #6.

Usage: python3 tools/stream_profile.py [sf_dir]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from qin_cdc_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("stream_profile", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")

    from qin_cdc_spark.cdc.changestream import orders_change_stream
    from qin_cdc_spark.cdc.envelope import envelope_from_typed
    from qin_cdc_spark.sources.tables import load_table
    from qin_cdc_spark.streaming.cdc_stream import (
        CdcStreamRoute,
        file_envelope_stream,
        start_cdc_stream,
    )

    tmp = tempfile.mkdtemp(prefix="stream_prof_")
    try:
        env_dir = f"{tmp}/envelope"
        envelope_from_typed(
            orders_change_stream(spark, sf_dir), db="src", table="orders"
        ).repartition(4).write.parquet(env_dir)
        route = CdcStreamRoute(
            spark, db="src", table="orders",
            schema=load_table(spark, sf_dir, "orders").schema,
            keys=["o_orderkey"], target_path=f"{tmp}/orders_tbl", n_buckets=32,
        )
        ui = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId

        def jobs():
            with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/jobs"
            ) as r:
                return json.load(r)

        j0 = max((j["jobId"] for j in jobs()), default=-1)
        t0 = time.time()
        q = start_cdc_stream(
            spark,
            file_envelope_stream(spark, env_dir, max_files_per_trigger=1),
            [route],
            checkpoint_dir=f"{tmp}/ckpt",
        )
        q.awaitTermination(600)
        route.target.read().write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        js = [j for j in jobs() if j["jobId"] > j0]
        by_desc: dict[str, int] = {}
        for j in js:
            d = (j.get("description") or j["name"]).split("\n")[0][:80]
            by_desc[d] = by_desc.get(d, 0) + 1
        print(
            json.dumps(
                {
                    "wall_s": round(wall, 2),
                    "n_jobs": len(js),
                    "by_description": by_desc,
                }
            )
        )
        return 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
