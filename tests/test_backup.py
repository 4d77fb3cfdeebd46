"""Snapshot clone / backup-restore (streaming/backup.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from qin_cdc_spark.streaming.backup import clone_partitioned, clone_versioned
from qin_cdc_spark.streaming.fsck import fsck_path, ok
from qin_cdc_spark.streaming.partitioned import PartitionedVersionedTable
from qin_cdc_spark.streaming.versioned import VersionedBucketedTable


def _ev(spark, rows):
    return spark.createDataFrame(rows, "op string, seq long, k long, v string")


def _rows(tbl):
    df = tbl.read()
    return {} if df is None else {r.k: r.v for r in df.collect()}


def test_clone_equals_snapshot_and_fscks_clean(spark, tmp_path):
    tbl = VersionedBucketedTable(spark, str(tmp_path / "t"), ["k"], n_buckets=4)
    v1 = tbl.merge(_ev(spark, [("insert", 1, 1, "a"), ("insert", 2, 2, "b")]),
                   batch_id=0)
    tbl.merge(_ev(spark, [("update", 3, 1, "a2"), ("delete", 4, 2, "b")]),
              batch_id=1)
    cur = clone_versioned(tbl, str(tmp_path / "cur"))
    assert _rows(cur) == _rows(tbl) == {1: "a2"}
    assert ok(fsck_path(cur.path))
    # point-in-time clone of the OLDER retained snapshot
    old = clone_versioned(tbl, str(tmp_path / "old"), version=v1)
    assert _rows(old) == {1: "a", 2: "b"}
    # history is NOT cloned: exactly one retained version
    assert cur.versions() == [tbl.current_version()]


def test_restored_target_resumes_without_double_apply(spark, tmp_path):
    tbl = VersionedBucketedTable(spark, str(tmp_path / "t"), ["k"], n_buckets=4)
    tbl.merge(_ev(spark, [("insert", 1, 1, "a")]), batch_id=0)
    clone = clone_versioned(tbl, str(tmp_path / "restore"))
    assert clone.last_batch_id() == 0
    # a redelivered batch 0 no-ops on the restored guard...
    clone.merge(_ev(spark, [("insert", 1, 1, "DUP")]), batch_id=0)
    assert _rows(clone) == {1: "a"}
    # ...and the stream continues with batch 1
    clone.merge(_ev(spark, [("update", 2, 1, "a2")]), batch_id=1)
    assert _rows(clone) == {1: "a2"}
    # fresh-pipeline mode resets the guard instead
    fresh = clone_versioned(tbl, str(tmp_path / "fresh"), preserve_batch_id=False)
    assert fresh.last_batch_id() == -1


def test_clone_partitioned_skips_dropped_partitions(spark, tmp_path):
    tbl = PartitionedVersionedTable(
        spark, str(tmp_path / "pt"), ["k"], partition_col="yr", n_buckets=2
    )
    ev = spark.createDataFrame(
        [("insert", 1, 1, 1995, "a"), ("insert", 2, 2, 1996, "b"),
         ("insert", 3, 3, 1997, "c")],
        "op string, seq long, k long, yr int, v string",
    )
    tbl.merge(ev, batch_id=0)
    tbl.drop_partitions([1995])
    clone = clone_partitioned(tbl, str(tmp_path / "bk"))
    assert ok(fsck_path(clone.path))
    assert sorted(clone.partitions()) == ["1996", "1997"]
    got = {(r.k, r.yr, r.v) for r in clone.read().collect()}
    assert got == {(2, 1996, "b"), (3, 1997, "c")}
    # the dropped partition's bytes were not copied
    import os

    assert not os.path.isdir(os.path.join(clone.path, "p=1995"))
    # restored parent resumes its stream
    clone.merge(
        spark.createDataFrame(
            [("insert", 4, 4, 1996, "d")],
            "op string, seq long, k long, yr int, v string",
        ),
        batch_id=1,
    )
    assert (4, 1996, "d") in {(r.k, r.yr, r.v) for r in clone.read().collect()}


def test_clone_refuses_empty_and_unretained(spark, tmp_path):
    tbl = VersionedBucketedTable(spark, str(tmp_path / "t"), ["k"], n_buckets=2)
    with pytest.raises(ValueError, match="empty"):
        clone_versioned(tbl, str(tmp_path / "x"))
    tbl.merge(_ev(spark, [("insert", 1, 1, "a")]), batch_id=0)
    with pytest.raises(ValueError, match="not retained"):
        clone_versioned(tbl, str(tmp_path / "x"), version=99)
