"""Global secondary index (streaming/gsi.py): CDF-maintained covering
projection bucketed by the indexed column — exact one-bucket serving
for non-PK lookups, index-move correctness, replay guard, purge
composition."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from qin_cdc_spark.streaming.gsi import GlobalSecondaryIndex
from qin_cdc_spark.streaming.versioned import VersionedBucketedTable


def _ev(spark, rows):
    """rows: (op, seq, k, cat, v)"""
    return spark.createDataFrame(
        rows, "op string, seq long, k long, cat string, v long"
    )


def _mk(spark, tmp_path, include=("v",)):
    tbl = VersionedBucketedTable(spark, str(tmp_path / "t"), ["k"], n_buckets=4)
    gsi = GlobalSecondaryIndex(
        spark, str(tmp_path / "idx"), index_col="cat", pk_cols=["k"],
        include_cols=list(include), n_buckets=4,
    )
    return tbl, gsi


def _idx_rows(gsi):
    df = gsi.read()
    return set() if df is None else {(r.cat, r.k) for r in df.collect()}


BATCH1 = [
    ("insert", 1, 1, "a", 10),
    ("insert", 2, 2, "a", 20),
    ("insert", 3, 3, "b", 30),
    ("insert", 4, 4, None, 40),   # NULL index value: never indexed
]
BATCH2 = [
    ("update", 5, 1, "b", 11),    # index MOVE a -> b
    ("update", 6, 2, "a", 21),    # value change, index unchanged
    ("delete", 7, 3, "b", 30),    # delete drops the indexed row
    ("update", 8, 4, "c", 41),    # NULL -> value: starts being indexed
]


def test_maintained_equals_rebuild(spark, tmp_path):
    tbl, gsi = _mk(spark, tmp_path)
    tbl.merge(_ev(spark, BATCH1), batch_id=0)
    gsi.refresh(tbl)
    tbl.merge(_ev(spark, BATCH2), batch_id=1)
    gsi.refresh(tbl)
    assert _idx_rows(gsi) == {("b", 1), ("a", 2), ("c", 4)}
    # full agreement with a from-scratch projection of the final table
    expect = {
        (r.cat, r.k, r.v)
        for r in tbl.read().filter(F.col("cat").isNotNull()).collect()
    }
    got = {(r.cat, r.k, r.v) for r in gsi.read().collect()}
    assert got == expect


def test_index_move_leaves_no_stale_row(spark, tmp_path):
    tbl, gsi = _mk(spark, tmp_path)
    tbl.merge(_ev(spark, BATCH1), batch_id=0)
    gsi.refresh(tbl)
    tbl.merge(_ev(spark, [("update", 9, 1, "z", 10)]), batch_id=1)
    gsi.refresh(tbl)
    assert {r.k for r in gsi.lookup(["a"]).collect()} == {2}
    assert {r.k for r in gsi.lookup(["z"]).collect()} == {1}
    # value -> NULL stops being indexed
    tbl.merge(_ev(spark, [("update", 10, 1, None, 10)]), batch_id=2)
    gsi.refresh(tbl)
    assert gsi.lookup(["z"]).count() == 0


def test_lookup_is_bucket_pruned(spark, tmp_path):
    tbl, gsi = _mk(spark, tmp_path)
    tbl.merge(_ev(spark, BATCH1), batch_id=0)
    gsi.refresh(tbl)
    out = gsi.lookup(["a"])
    # exactly the buckets 'a' hashes into are opened — strictly fewer
    # dirs than the index holds overall
    man = gsi.store._meta()["versions"][str(gsi.store.current_version())]
    opened = {f.rsplit("/", 2)[-2] for f in out.inputFiles()}
    assert opened < set(man["buckets"].values())
    assert {r.k for r in out.collect()} == {1, 2}


def test_refresh_replay_is_noop(spark, tmp_path):
    tbl, gsi = _mk(spark, tmp_path)
    tbl.merge(_ev(spark, BATCH1), batch_id=0)
    gsi.refresh(tbl)
    v = gsi.store.current_version()
    assert gsi.refresh(tbl) == gsi.applied_version()
    assert gsi.store.current_version() == v  # no new index version


def test_purge_cascades_through_index(spark, tmp_path):
    from qin_cdc_spark.streaming.forget import purge_keys

    tbl, gsi = _mk(spark, tmp_path)
    tbl.merge(_ev(spark, BATCH1), batch_id=0)
    gsi.refresh(tbl)
    purge_keys(tbl, spark.createDataFrame([(2,)], "k long"), seq=100)
    gsi.refresh(tbl)
    assert _idx_rows(gsi) == {("a", 1), ("b", 3)}


def test_gsi_declared_in_mview_config(spark, tmp_path):
    """'gsi' as a [[materialized-views]] type: refreshed in-stream like
    any other declared view."""
    from qin_cdc_spark.streaming.mviews import build_materialized_view

    tbl = VersionedBucketedTable(spark, str(tmp_path / "t"), ["k"], n_buckets=4)
    gsi = build_materialized_view(
        spark, str(tmp_path / "idx"), "gsi",
        {"index-col": "cat", "pk-cols": ["k"], "include-cols": ["v"],
         "n-buckets": 4},
    )
    tbl.merge(_ev(spark, BATCH1), batch_id=0)
    gsi.refresh(tbl)
    assert {r.k for r in gsi.lookup(["a"]).collect()} == {1, 2}


def test_partitioned_point_lookup(spark, tmp_path):
    from qin_cdc_spark.streaming.partitioned import PartitionedVersionedTable

    tbl = PartitionedVersionedTable(
        spark, str(tmp_path / "pt"), ["k"], partition_col="cat", n_buckets=4
    )
    tbl.merge(_ev(spark, [r for r in BATCH1 if r[3] is not None]), batch_id=0)
    got = tbl.read_key("a", [2]).collect()
    assert [(r.k, r.v) for r in got] == [(2, 20)]
    assert tbl.read_key("zzz", [2]) is None


@pytest.mark.parametrize("seed", [11])
def test_random_rounds_match_projection(spark, tmp_path, seed):
    import random

    rng = random.Random(seed)
    tbl, gsi = _mk(spark, tmp_path)
    seq = 0
    live: set[int] = set()
    for rnd in range(4):
        batch = []
        for _ in range(20):
            seq += 1
            k = rng.randrange(10)
            if k in live:
                op = rng.choice(["update", "update", "delete"])
                if op == "delete":
                    live.discard(k)
            else:
                op = "insert"
                live.add(k)
            cat = rng.choice(["a", "b", "c", None])
            batch.append((op, seq, k, cat, seq * 10))
        tbl.merge(_ev(spark, batch), batch_id=rnd)
        gsi.refresh(tbl)
        expect = {
            (r.cat, r.k, r.v)
            for r in tbl.read().filter(F.col("cat").isNotNull()).collect()
        }
        got = {(r.cat, r.k, r.v) for r in gsi.read().collect()}
        assert got == expect
