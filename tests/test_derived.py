"""DerivedAggTable (streaming/derived.py): incrementally-maintained
materialized view over a versioned CDC target — retraction semantics,
group-moving updates, idempotent refresh, crash-safe publish."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from qin_cdc_spark.streaming.derived import DerivedAggTable
from qin_cdc_spark.streaming.versioned import VersionedBucketedTable


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "op string, seq long, id long, grp string, amt long"
    )


def _recompute(tbl):
    return {
        (r.grp): (r.cnt, r.s)
        for r in tbl.read()
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("amt").alias("s"))
        .collect()
    }


def _view(mv):
    return {(r.grp): (r.cnt, r.sum_amt) for r in mv.read().collect()}


def test_derived_agg_tracks_source_through_mutations(spark, tmp_path):
    tbl = VersionedBucketedTable(spark, str(tmp_path / "src"), ["id"], n_buckets=4)
    mv = DerivedAggTable(
        spark, str(tmp_path / "mv"), group_cols=["grp"], sum_cols=["amt"]
    )
    # bootstrap refresh from the first snapshot
    tbl.merge(_changes(spark, [("insert", i, i, "g%d" % (i % 3), i * 10) for i in range(1, 10)]))
    assert mv.refresh(tbl) == 1
    assert _view(mv) == _recompute(tbl)

    # update (in place), update (group move), delete, insert — one batch
    tbl.merge(
        _changes(
            spark,
            [
                ("update", 100, 1, "g1", 999),
                ("update", 101, 2, "g0", 555),  # g2 → g0
                ("delete", 102, 3, "g0", 30),
                ("insert", 103, 11, "g2", 70),
            ],
        )
    )
    # a second batch on top before refreshing: net CDF across 2 versions
    tbl.merge(_changes(spark, [("update", 200, 11, "g0", 71)]))  # g2 → g0 again
    assert mv.refresh(tbl) == 3
    assert _view(mv) == _recompute(tbl)

    # idempotent: nothing new → no-op, same state
    before = _view(mv)
    assert mv.refresh(tbl) == 3
    assert _view(mv) == before


def test_derived_agg_drops_emptied_groups(spark, tmp_path):
    tbl = VersionedBucketedTable(spark, str(tmp_path / "src"), ["id"], n_buckets=4)
    mv = DerivedAggTable(
        spark, str(tmp_path / "mv"), group_cols=["grp"], sum_cols=["amt"]
    )
    tbl.merge(_changes(spark, [("insert", 1, 1, "solo", 5), ("insert", 2, 2, "dual", 7)]))
    mv.refresh(tbl)
    tbl.merge(_changes(spark, [("delete", 10, 1, "solo", 5)]))
    mv.refresh(tbl)
    got = _view(mv)
    assert "solo" not in got and got["dual"] == (1, 7)


def test_derived_agg_publish_is_crash_safe(spark, tmp_path):
    tbl = VersionedBucketedTable(spark, str(tmp_path / "src"), ["id"], n_buckets=4)
    mv = DerivedAggTable(
        spark, str(tmp_path / "mv"), group_cols=["grp"], sum_cols=["amt"]
    )
    tbl.merge(_changes(spark, [("insert", 1, 1, "g", 5)]))
    mv.refresh(tbl)
    # orphan data dir from a crashed refresh is GC'd on the next publish
    orphan = os.path.join(mv.path, "agg-deadbeef0000")
    os.makedirs(orphan)
    tbl.merge(_changes(spark, [("insert", 2, 2, "g", 6)]))
    mv.refresh(tbl)
    assert not os.path.exists(orphan)
    assert _view(mv) == {"g": (2, 11)}


def test_derived_mv_refreshes_inside_the_stream(spark, tmp_path):
    """post_batch hook: the MV refreshes within each micro-batch of a
    running CDC stream over a versioned route and ends equal to the
    full recompute."""
    from qin_cdc_spark.cdc.envelope import envelope_from_typed
    from qin_cdc_spark.streaming.cdc_stream import (
        CdcStreamRoute,
        file_envelope_stream,
        start_cdc_stream,
    )
    from pyspark.sql.types import _parse_datatype_string

    env_dir = str(tmp_path / "env")
    typed1 = _changes(spark, [("insert", i, i, "g%d" % (i % 2), i) for i in range(1, 7)])
    typed2 = _changes(spark, [("update", 10, 1, "g1", 100), ("delete", 11, 2, "g0", 2)])
    for t in (typed1, typed2):
        envelope_from_typed(t.select("id", "grp", "amt", "op", "seq"), db="src", table="t").coalesce(1).write.mode(
            "append"
        ).parquet(env_dir)

    route = CdcStreamRoute(
        spark,
        db="src",
        table="t",
        schema=_parse_datatype_string("id long, grp string, amt long"),
        keys=["id"],
        target_path=str(tmp_path / "tbl"),
        versioned=True,
    )
    mv = DerivedAggTable(
        spark, str(tmp_path / "mv"), group_cols=["grp"], sum_cols=["amt"]
    )

    def post_batch(batch_id):
        if route.target is not None and route.target.exists():
            mv.refresh(route.target)

    q = start_cdc_stream(
        spark,
        file_envelope_stream(spark, env_dir, max_files_per_trigger=1),
        [route],
        checkpoint_dir=str(tmp_path / "ckpt"),
        post_batch=post_batch,
    )
    q.awaitTermination(300)
    assert mv.applied_version() == route.target.current_version()
    assert _view(mv) == _recompute(route.target)
