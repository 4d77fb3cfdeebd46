"""Headline benchmark: runs the flagship queries at $SPARK_GRAFT_SF_DIR
(default sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Execution sinks to the noop format (full pipeline runs, nothing
collected to the driver) so timings measure the engine, not py4j
transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from qin_cdc_spark.plans.registry import all_queries
from qin_cdc_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q10_returned_items",
    "q21_sole_late_shipper",
    "join_salted_skew",
    "text_tfidf_topk",
    "join_range_nonequi",
    "agg_distinct",
    "win_running_sum",
    "topk_per_group",
    "cdc_apply_orders",
    "cdc_apply_lineitem_multipk",
    "ev_tumbling_window",
    "ev_session_window",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "sim_cosine_topk",
    "text_quality_score",
    "mm_decode_meta",
]


def _bench_stream_cdc(spark, sf_dir: str) -> float:
    """Streaming CDC apply throughput: orders change stream → 4
    micro-batches → bucketed LWW target (the A1-A27 path end-to-end)."""
    import shutil
    import tempfile

    from qin_cdc_spark.cdc.changestream import orders_change_stream
    from qin_cdc_spark.cdc.envelope import envelope_from_typed
    from qin_cdc_spark.sources.tables import load_table
    from qin_cdc_spark.streaming.cdc_stream import (
        CdcStreamRoute,
        file_envelope_stream,
        start_cdc_stream,
    )

    tmp = tempfile.mkdtemp(prefix="bench_cdc_")
    try:
        env_dir = f"{tmp}/envelope"
        envelope_from_typed(
            orders_change_stream(spark, sf_dir), db="src", table="orders"
        ).repartition(4).write.parquet(env_dir)
        route = CdcStreamRoute(
            spark,
            db="src",
            table="orders",
            schema=load_table(spark, sf_dir, "orders").schema,
            keys=["o_orderkey"],
            target_path=f"{tmp}/orders_tbl",
            n_buckets=32,
        )
        t0 = time.time()
        q = start_cdc_stream(
            spark,
            file_envelope_stream(spark, env_dir, max_files_per_trigger=1),
            [route],
            checkpoint_dir=f"{tmp}/ckpt",
        )
        q.awaitTermination(600)
        route.target.read().write.format("noop").mode("overwrite").save()
        return time.time() - t0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # JVM/codegen warmup + Python-worker warmup (not counted): the first
    # mapInPandas call pays ~3 s of worker startup per executor slot.
    queries["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.range(spark.sparkContext.defaultParallelism).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, schema="id long").write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    timings["stream_cdc_orders"] = round(_bench_stream_cdc(spark, sf_dir), 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
