"""VersionedBucketedTable (streaming/versioned.py): snapshot isolation,
file reuse across versions, retention GC, tombstone time travel."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F

from qin_cdc_spark.streaming.versioned import META_NAME, VersionedBucketedTable


def _changes(spark, rows):
    return spark.createDataFrame(rows, "op string, seq long, id long, val string")


def _manifest(tbl):
    with open(os.path.join(tbl.path, META_NAME)) as f:
        return json.load(f)


def test_snapshot_isolation_and_lww(spark, tmp_path):
    tbl = VersionedBucketedTable(spark, str(tmp_path / "t"), ["id"], n_buckets=4)
    v1 = tbl.merge(
        _changes(
            spark,
            [("insert", 1, 1, "a"), ("insert", 2, 2, "b"), ("insert", 3, 3, "c")],
        )
    )
    before = {(r.id, r.val) for r in tbl.read_at(v1).collect()}
    assert before == {(1, "a"), (2, "b"), (3, "c")}

    v2 = tbl.merge(
        _changes(spark, [("update", 4, 1, "a2"), ("delete", 5, 2, "b")])
    )
    # current reflects the second batch
    assert {(r.id, r.val) for r in tbl.read().collect()} == {(1, "a2"), (3, "c")}
    # v1 is UNCHANGED after the later merge — snapshot isolation
    assert {(r.id, r.val) for r in tbl.read_at(v1).collect()} == before
    assert tbl.versions() == [v1, v2]
    assert tbl.current_version() == v2


def test_untouched_buckets_share_data_dirs(spark, tmp_path):
    """A merge touching one key rewrites only that key's bucket: every
    other bucket's data dir is SHARED byte-for-byte between versions."""
    tbl = VersionedBucketedTable(spark, str(tmp_path / "t"), ["id"], n_buckets=8)
    tbl.merge(_changes(spark, [("insert", i, i, f"v{i}") for i in range(1, 17)]))
    man1 = _manifest(tbl)["versions"]["1"]["buckets"]
    tbl.merge(_changes(spark, [("update", 100, 1, "v1b")]))
    man2 = _manifest(tbl)["versions"]["2"]["buckets"]

    changed = [b for b in man1 if man1[b] != man2.get(b)]
    assert len(changed) == 1  # exactly the bucket of id=1
    shared = [b for b in man1 if man1[b] == man2.get(b)]
    assert shared  # everything else reuses the version-1 files


def test_gc_expires_versions_keeps_shared_dirs(spark, tmp_path):
    tbl = VersionedBucketedTable(spark, str(tmp_path / "t"), ["id"], n_buckets=4)
    tbl.merge(_changes(spark, [("insert", i, i, f"v{i}") for i in range(1, 9)]))
    tbl.merge(_changes(spark, [("update", 100, 1, "x")]))
    tbl.merge(_changes(spark, [("update", 101, 2, "y")]))
    expired = tbl.gc(keep_last=2)
    assert expired == [1]
    assert tbl.versions() == [2, 3]
    # expired version no longer readable
    try:
        tbl.read_at(1)
        raise AssertionError("expected ValueError for expired version")
    except ValueError:
        pass
    # retained versions still read correctly (shared dirs survived GC)
    assert {(r.id, r.val) for r in tbl.read_at(2).collect()} == {
        (1, "x"), *{(i, f"v{i}") for i in range(2, 9)}
    }
    # every dir on disk is referenced; every referenced dir exists
    meta = _manifest(tbl)
    live = {d for v in meta["versions"].values() for d in v["buckets"].values()}
    on_disk = {d for d in os.listdir(tbl.path) if d.startswith("d-")}
    assert on_disk == live


def test_orphan_dirs_from_crashed_publish_are_gcd(spark, tmp_path):
    tbl = VersionedBucketedTable(spark, str(tmp_path / "t"), ["id"], n_buckets=4)
    tbl.merge(_changes(spark, [("insert", 1, 1, "a")]))
    orphan = os.path.join(tbl.path, "d-deadbeef0000")
    os.makedirs(orphan)
    tbl.merge(_changes(spark, [("insert", 2, 2, "b")]))
    assert not os.path.exists(orphan)
    assert {(r.id, r.val) for r in tbl.read().collect()} == {(1, "a"), (2, "b")}


def test_batch_id_replay_noops(spark, tmp_path):
    tbl = VersionedBucketedTable(spark, str(tmp_path / "t"), ["id"], n_buckets=4)
    v1 = tbl.merge(_changes(spark, [("insert", 1, 1, "a")]), batch_id=0)
    v_again = tbl.merge(_changes(spark, [("insert", 1, 1, "a")]), batch_id=0)
    assert v_again == v1 and tbl.versions() == [v1]
    v2 = tbl.merge(_changes(spark, [("insert", 2, 2, "b")]), batch_id=1)
    assert tbl.versions() == [v1, v2]


def test_out_of_order_seq_across_versions(spark, tmp_path):
    """A later version fed OLDER seqs cannot regress rows (LWW holds
    across the version boundary, same contract as BucketedUpsertTable)."""
    tbl = VersionedBucketedTable(spark, str(tmp_path / "t"), ["id"], n_buckets=4)
    tbl.merge(_changes(spark, [("insert", 10, 1, "new")]))
    tbl.merge(_changes(spark, [("insert", 5, 1, "old")]))  # stale redelivery
    assert [(r.id, r.val) for r in tbl.read().collect()] == [(1, "new")]
    # and a delete time-travels: visible at v1, tombstoned at v3
    v3 = tbl.merge(_changes(spark, [("delete", 20, 1, "new")]))
    assert tbl.read_at(1).count() == 1
    assert tbl.read_at(v3).count() == 0
