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


def test_versioned_route_streaming_time_travel(spark, tmp_path):
    """CdcStreamRoute(versioned=True) end to end: each micro-batch mints
    a snapshot, the final version equals the LWW oracle, intermediate
    versions are stable, and a full redelivery from a fresh checkpoint
    mints NO duplicate versions (batch-id guard)."""
    import pyspark.sql.functions as F

    from qin_cdc_spark.cdc.changestream import orders_change_stream
    from qin_cdc_spark.cdc.envelope import envelope_from_typed
    from qin_cdc_spark.sources.tables import load_table
    from qin_cdc_spark.streaming.cdc_stream import (
        CdcStreamRoute,
        file_envelope_stream,
        start_cdc_stream,
    )

    SF = "/root/testdata/sf0.001"
    env = envelope_from_typed(
        orders_change_stream(spark, SF), db="src", table="orders"
    )
    env_dir = str(tmp_path / "envelope")
    # two explicit appends → two files → two micro-batches at
    # maxFilesPerTrigger=1, seq-ordered so per-version content is stable
    env.filter(F.col("seq") <= 3000).coalesce(1).write.mode("append").parquet(env_dir)
    env.filter(F.col("seq") > 3000).coalesce(1).write.mode("append").parquet(env_dir)
    route = CdcStreamRoute(
        spark,
        db="src",
        table="orders",
        schema=load_table(spark, SF, "orders").schema,
        keys=["o_orderkey"],
        target_path=str(tmp_path / "orders_tbl"),
        versioned=True,
    )
    q = start_cdc_stream(
        spark,
        file_envelope_stream(spark, env_dir, max_files_per_trigger=1),
        [route],
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)

    orders = load_table(spark, SF, "orders")
    n = orders.count()
    n_del = orders.filter((F.col("o_orderkey") % 10).isin(7, 9)).count()
    assert route.target.read().count() == n - n_del
    versions = route.target.versions()
    assert len(versions) >= 2  # one snapshot per non-empty micro-batch
    v1_rows = route.target.read_at(versions[0]).count()
    assert 0 < v1_rows <= n

    # fresh-checkpoint redelivery: batch ids restart at 0, every merge
    # no-ops on the guard — same final state, no duplicate versions
    q2 = start_cdc_stream(
        spark,
        file_envelope_stream(spark, env_dir),
        [route],
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    q2.awaitTermination(300)
    assert route.target.versions() == versions
    assert route.target.read().count() == n - n_del
    assert route.target.read_at(versions[0]).count() == v1_rows


def test_schema_evolution_across_versions(spark, tmp_path):
    """Mid-stream add-column: a later batch carries an extra column and
    touches only SOME buckets.  The current read must surface the new
    column (nulls for rows in untouched buckets — mergeSchema read),
    while read_at(v1) keeps the old shape."""
    tbl = VersionedBucketedTable(spark, str(tmp_path / "t"), ["id"], n_buckets=8)
    v1 = tbl.merge(_changes(spark, [("insert", i, i, f"v{i}") for i in range(1, 9)]))
    wide = spark.createDataFrame(
        [("update", 100, 1, "v1b", "extra1")],
        "op string, seq long, id long, val string, val2 string",
    )
    tbl.merge(wide)
    cur = tbl.read()
    assert "val2" in cur.columns
    got = {(r.id, r.val, r.val2) for r in cur.collect()}
    assert (1, "v1b", "extra1") in got
    assert (2, "v2", None) in got  # untouched bucket: new column is null
    assert "val2" not in tbl.read_at(v1).columns


def test_read_key_prunes_to_one_bucket(spark, tmp_path):
    tbl = VersionedBucketedTable(spark, str(tmp_path / "t"), ["id"], n_buckets=8)
    tbl.merge(_changes(spark, [("insert", i, i, f"v{i}") for i in range(1, 17)]))
    got = tbl.read_key([5]).collect()
    assert [(r.id, r.val) for r in got] == [(5, "v5")]
    # the lookup's plan reads ONE data dir, not the whole manifest
    df = tbl.read_key([5])
    scanned = [
        ln for ln in df._jdf.queryExecution().executedPlan().toString().split("\n")
        if "Location" in ln or "d-" in ln
    ]
    all_dirs = {d for d in os.listdir(tbl.path) if d.startswith("d-")}
    mentioned = {d for d in all_dirs if any(d in ln for ln in scanned)}
    assert len(mentioned) <= 1
    # missing key → empty, never an error
    assert tbl.read_key([999]).count() == 0


def test_changes_between_versions(spark, tmp_path):
    tbl = VersionedBucketedTable(spark, str(tmp_path / "t"), ["id"], n_buckets=4)
    v1 = tbl.merge(
        _changes(spark, [("insert", 1, 1, "a"), ("insert", 2, 2, "b"), ("insert", 3, 3, "c")])
    )
    v2 = tbl.merge(
        _changes(
            spark,
            [("update", 4, 1, "a2"), ("delete", 5, 2, "b"), ("insert", 6, 4, "d")],
        )
    )
    ch = {r.id: r._change for r in tbl.changes_between(v1, v2).collect()}
    assert ch == {1: "update", 2: "delete", 4: "insert"}  # 3 unchanged → absent
    # update/insert rows carry the v_to values
    vals = {r.id: r.val for r in tbl.changes_between(v1, v2).filter(
        F.col("_change") != "delete").collect()}
    assert vals == {1: "a2", 4: "d"}


def test_changes_between_prunes_unchanged_buckets(spark, tmp_path):
    """CDF cost is O(changed buckets): a bucket whose dir name is
    identical in both manifests is never opened (OPTIMIZATION_r10 —
    dirs are immutable, so same dname ⇒ same rows ⇒ no change).  The
    second merge touches ONE key; the diff must read only that key's
    bucket on each side, and its output must equal the unpruned
    full-snapshot diff semantics (the unchanged keys stay absent)."""
    tbl = VersionedBucketedTable(spark, str(tmp_path / "t"), ["id"], n_buckets=4)
    v1 = tbl.merge(
        _changes(
            spark,
            [("insert", i, i, "v%d" % i) for i in range(1, 9)],
        )
    )
    v2 = tbl.merge(_changes(spark, [("update", 100, 1, "v1b")]))
    man1, man2 = _manifest(tbl)["versions"][str(v1)], _manifest(tbl)["versions"][str(v2)]
    changed_dirs = {
        d for b, d in man1["buckets"].items() if man2["buckets"].get(b) != d
    } | {d for b, d in man2["buckets"].items() if man1["buckets"].get(b) != d}
    assert len(changed_dirs) == 2  # one bucket, two vintages

    cdf = tbl.changes_between(v1, v2, include_preimage=True)
    opened = {f.rsplit("/", 2)[-2] for f in cdf.inputFiles()}
    assert opened == changed_dirs  # manifest-level pruning, both sides
    rows = cdf.collect()
    assert {(r.id, r._change, r.val, r._pre_val) for r in rows} == {
        (1, "update", "v1b", "v1")
    }

    # degenerate range: identical manifests (restore) ⇒ empty CDF, no raise
    v3 = tbl.restore(v2)
    assert tbl.changes_between(v2, v3).count() == 0


def test_auto_rebucket_policy(spark, tmp_path):
    """maybe_rebucket (OPTIMIZATION_r11, VERDICT r10 #4): when mean
    bucket bytes crosses the threshold, the next merge doubles the
    bucket count (to the smallest power-of-two multiple that restores
    the target); rows are preserved, read_key hashes with the new
    count, and the CDF across the rebucket boundary falls back to the
    full diff exactly once (bucket ids aren't comparable across
    counts), then prunes again at the new granularity."""
    tbl = VersionedBucketedTable(
        spark, str(tmp_path / "t"), ["id"], n_buckets=2,
        auto_rebucket_bytes=1,  # any real file crosses 1 byte/bucket
    )
    v1 = tbl.merge(_changes(spark, [("insert", i, i, "v%d" % i) for i in range(1, 9)]))
    # the merge minted v1, then the policy fired and minted the
    # rebucketed layout as a further version
    assert tbl.current_version() > v1
    man = _manifest(tbl)["versions"][str(tbl.current_version())]
    assert tbl._manifest_n_buckets(man) > 2
    assert {(r.id, r.val) for r in tbl.read().collect()} == {
        (i, "v%d" % i) for i in range(1, 9)
    }
    assert [(r.id, r.val) for r in tbl.read_key([5]).collect()] == [(5, "v5")]

    # CDF across the boundary: full-diff fallback (every live dir of
    # both manifests opened), result still exactly the per-key net
    v2 = tbl.current_version()
    cdf = tbl.changes_between(v1, v2)
    assert cdf.count() == 0  # rebucket moves rows, changes nothing
    opened = {f.rsplit("/", 2)[-2] for f in cdf.inputFiles()}
    man1 = _manifest(tbl)["versions"][str(v1)]
    assert opened == set(man1["buckets"].values()) | set(man["buckets"].values())

    # …and the NEXT delta prunes again at the new granularity
    v3 = tbl.merge(_changes(spark, [("update", 100, 1, "v1b")]))
    cdf2 = tbl.changes_between(v2, v3)
    man3 = _manifest(tbl)["versions"][str(v3)]
    changed = {
        d for b, d in man["buckets"].items() if man3["buckets"].get(b) != d
    } | {d for b, d in man3["buckets"].items() if man["buckets"].get(b) != d}
    opened2 = {f.rsplit("/", 2)[-2] for f in cdf2.inputFiles()}
    assert opened2 == changed and len(changed) == 2
    assert {(r.id, r._change) for r in cdf2.collect()} == {(1, "update")}

    # below-threshold store: the policy is a driver-side no-op
    quiet = VersionedBucketedTable(
        spark, str(tmp_path / "q"), ["id"], n_buckets=2,
        auto_rebucket_bytes=1 << 40,
    )
    quiet.merge(_changes(spark, [("insert", 1, 1, "a")]))
    assert quiet.maybe_rebucket() is None
    assert quiet._manifest_n_buckets(
        _manifest(quiet)["versions"][str(quiet.current_version())]
    ) == 2


def test_cdf_preimage_incremental_aggregation(spark, tmp_path):
    """The CDF preimage/postimage shape supports RETRACTABLE incremental
    aggregation: maintain per-group (cnt, sum) from the delta alone and
    land exactly on the full recompute."""
    rows = spark.createDataFrame(
        [("insert", i, i, "g%d" % (i % 3), i * 10) for i in range(1, 10)],
        "op string, seq long, id long, grp string, amt long",
    )
    tbl = VersionedBucketedTable(spark, str(tmp_path / "t"), ["id"], n_buckets=4)
    v1 = tbl.merge(rows)
    v2 = tbl.merge(
        spark.createDataFrame(
            [
                ("update", 100, 1, "g1", 999),   # g1: 10 → 999
                ("update", 101, 2, "g0", 555),   # moves g2 → g0 (group change!)
                ("delete", 102, 3, "g0", 30),
                ("insert", 103, 11, "g2", 70),
            ],
            "op string, seq long, id long, grp string, amt long",
        )
    )
    base = {
        (r.grp): (r["count(1)"], r["sum(amt)"])
        for r in tbl.read_at(v1).groupBy("grp").agg(F.count(F.lit(1)), F.sum("amt")).collect()
    }
    cdf = tbl.changes_between(v1, v2, include_preimage=True).collect()
    inc = dict(base)
    for r in cdf:
        if r._change in ("update", "delete"):  # retract the preimage
            c, s = inc[r._pre_grp]
            inc[r._pre_grp] = (c - 1, s - r._pre_amt)
        if r._change in ("update", "insert"):  # add the postimage
            c, s = inc.get(r.grp, (0, 0))
            inc[r.grp] = (c + 1, s + r.amt)
    inc = {g: v for g, v in inc.items() if v[0] > 0}
    want = {
        (r.grp): (r["count(1)"], r["sum(amt)"])
        for r in tbl.read().groupBy("grp").agg(F.count(F.lit(1)), F.sum("amt")).collect()
    }
    assert inc == want


def test_restore_rolls_back_without_data_movement(spark, tmp_path):
    tbl = VersionedBucketedTable(spark, str(tmp_path / "t"), ["id"], n_buckets=4)
    v1 = tbl.merge(_changes(spark, [("insert", 1, 1, "good"), ("insert", 2, 2, "keep")]))
    v2 = tbl.merge(_changes(spark, [("update", 10, 1, "BAD"), ("delete", 11, 2, "keep")]))
    v3 = tbl.restore(v1)
    assert v3 == v2 + 1 and tbl.current_version() == v3
    # current state == v1's state; the restored manifest SHARES v1's dirs
    assert {(r.id, r.val) for r in tbl.read().collect()} == {(1, "good"), (2, "keep")}
    m = _manifest(tbl)
    assert m["versions"][str(v3)]["buckets"] == m["versions"][str(v1)]["buckets"]
    # the bad version stays readable (audit) until gc expires it
    assert {(r.id, r.val) for r in tbl.read_at(v2).collect()} == {(1, "BAD")}
    # and LWW continues correctly on top of the restore
    tbl.merge(_changes(spark, [("update", 20, 2, "newer")]))
    assert {(r.id, r.val) for r in tbl.read().collect()} == {(1, "good"), (2, "newer")}


def test_rebucket_preserves_rows_history_and_point_lookups(spark, tmp_path):
    """Bucket-count evolution: rebucket(16) must (a) preserve the
    visible rows exactly, (b) leave pre-rebucket snapshots readable
    (they keep their own manifests and bucket count), (c) route
    read_key through the NEW layout, and (d) make subsequent merges
    bucket under the new count."""
    tbl = VersionedBucketedTable(spark, str(tmp_path / "t"), ["id"], n_buckets=4)
    v1 = tbl.merge(
        _changes(spark, [("insert", i, i, f"v{i}") for i in range(1, 33)])
    )
    tbl.merge(_changes(spark, [("delete", 100, 5, "v5")]))
    before = {(r.id, r.val) for r in tbl.read().collect()}
    v1_rows = {(r.id, r.val) for r in tbl.read_at(v1).collect()}

    v3 = tbl.rebucket(16)
    man = _manifest(tbl)
    assert man["versions"][str(v3)]["n_buckets"] == 16
    assert len(man["versions"][str(v3)]["buckets"]) <= 16
    # (a) visible rows unchanged, tombstone for id=5 still effective
    assert {(r.id, r.val) for r in tbl.read().collect()} == before
    # (b) time travel across the rebucket boundary
    assert {(r.id, r.val) for r in tbl.read_at(v1).collect()} == v1_rows
    # (c) point lookup hashes with the current manifest's count
    got = tbl.read_key([7]).collect()
    assert [(r.id, r.val) for r in got] == [(7, "v7")]
    # (d) a post-rebucket merge stays on the new layout
    v4 = tbl.merge(_changes(spark, [("update", 101, 7, "v7b")]))
    assert _manifest(tbl)["versions"][str(v4)]["n_buckets"] == 16
    assert tbl.read_key([7]).collect()[0].val == "v7b"
    # tombstoned key remains deleted through the rewrite
    assert tbl.read_key([5]).count() == 0


def test_rebucket_then_cdf_spans_layouts(spark, tmp_path):
    """changes_between across a rebucket boundary must report only the
    REAL data changes — the physical rewrite itself is invisible to the
    change feed (it carries every row's _seq through unchanged)."""
    tbl = VersionedBucketedTable(spark, str(tmp_path / "t"), ["id"], n_buckets=4)
    v1 = tbl.merge(
        _changes(spark, [("insert", 1, 1, "a"), ("insert", 2, 2, "b")])
    )
    tbl.rebucket(8)
    v3 = tbl.merge(_changes(spark, [("update", 3, 2, "b2"), ("insert", 4, 3, "c")]))
    feed = {
        (r.id, r._change)
        for r in tbl.changes_between(v1, v3).select("id", "_change").collect()
    }
    assert feed == {(2, "update"), (3, "insert")}


def _kv_changes(spark, rows):
    return spark.createDataFrame(rows, "op string, seq long, id long, val string")


def test_bloom_read_where_prunes_and_stays_exact(spark, tmp_path):
    """Secondary-column lookup: with per-id-unique values over 8
    buckets, read_where must open fewer dirs than the manifest holds
    while returning exactly the plain-filter rows — and must track
    updates/deletes (old values die with the rewritten dir's bloom; the
    stale dir's rows are ignored via the manifest intersection)."""
    tbl = VersionedBucketedTable(
        spark, str(tmp_path / "t"), ["id"], n_buckets=8, bloom_cols=["val"]
    )
    tbl.merge(_kv_changes(spark, [("insert", i, i, f"v{i}") for i in range(1, 65)]))
    man = _manifest(tbl)["versions"]["1"]["buckets"]
    assert len(man) == 8

    got = tbl.read_where("val", ["v7"]).collect()
    assert [(r.id, r.val) for r in got] == [(7, "v7")]

    # pruning: the candidate set for one value must be < all dirs
    import qin_cdc_spark.streaming.versioned as vmod
    from qin_cdc_spark.functions.bloom import candidate_units
    import pyspark.sql.functions as FF

    idx = spark.read.parquet(tbl._bloom_idx_path).filter(FF.col("bcol") == "val")
    cands = candidate_units(spark, idx, ["v7"])
    assert 1 <= len(cands) < 8, cands

    # update + delete move/kill values
    tbl.merge(
        _kv_changes(spark, [("update", 100, 9, "v9b"), ("delete", 101, 7, "v7")])
    )
    assert tbl.read_where("val", ["v7"]).count() == 0  # deleted
    assert tbl.read_where("val", ["v9"]).count() == 0  # superseded
    assert [r.id for r in tbl.read_where("val", ["v9b"]).collect()] == [9]
    # historical version still answers with the OLD values
    assert [r.id for r in tbl.read_where("val", ["v7"], version=1).collect()] == [7]


def test_bloom_fallback_without_index_is_correct(spark, tmp_path):
    """Deleting the index (or querying an unindexed column) must fall
    back to reading every dir — correct, just unpruned."""
    import shutil as sh

    tbl = VersionedBucketedTable(
        spark, str(tmp_path / "t"), ["id"], n_buckets=4, bloom_cols=["val"]
    )
    tbl.merge(_kv_changes(spark, [("insert", i, i, f"v{i}") for i in range(1, 17)]))
    sh.rmtree(tbl._bloom_idx_path)
    assert [r.id for r in tbl.read_where("val", ["v5"]).collect()] == [5]
    # unindexed column goes straight to the plain path
    assert tbl.read_where("id", [5]).count() == 1


def test_bloom_survives_rebucket_and_compaction(spark, tmp_path):
    tbl = VersionedBucketedTable(
        spark, str(tmp_path / "t"), ["id"], n_buckets=4, bloom_cols=["val"]
    )
    tbl.merge(_kv_changes(spark, [("insert", i, i, f"v{i}") for i in range(1, 33)]))
    tbl.rebucket(16)
    assert [r.id for r in tbl.read_where("val", ["v11"]).collect()] == [11]
    tbl.gc(keep_last=1)
    tbl.compact_bloom_index()
    # index now only names live dirs; lookups still exact
    live = set(_manifest(tbl)["versions"][str(tbl.current_version())]["buckets"].values())
    units = {
        r.unit
        for r in spark.read.parquet(tbl._bloom_idx_path).select("unit").distinct().collect()
    }
    assert units <= live
    assert [r.id for r in tbl.read_where("val", ["v11"]).collect()] == [11]


def test_sort_cols_cluster_files_and_stay_correct(spark, tmp_path):
    """With sort_cols, every written bucket file is internally sorted by
    the clustering column (tight parquet row-group min/max for range
    skipping) — and merge/rebucket semantics are unchanged."""
    import glob

    import pyarrow.parquet as pq

    tbl = VersionedBucketedTable(
        spark, str(tmp_path / "t"), ["id"], n_buckets=4, sort_cols=["val"]
    )
    # values deliberately shuffled relative to key order
    rows = [("insert", i, i, f"v{(i * 7) % 32:02d}") for i in range(1, 33)]
    tbl.merge(_changes(spark, rows))
    tbl.merge(_changes(spark, [("update", 100, 1, "v99"), ("delete", 101, 2, "x")]))

    assert {(r.id, r.val) for r in tbl.read().collect()} == {
        (i, f"v{(i * 7) % 32:02d}") for i in range(3, 33)
    } | {(1, "v99")}

    # every parquet file in every data dir is sorted by val
    files = glob.glob(os.path.join(tbl.path, "d-*", "*.parquet"))
    assert files
    for f in files:
        vals = pq.read_table(f, columns=["val"]).column("val").to_pylist()
        assert vals == sorted(vals), f

    # rebucket re-clusters too
    tbl.rebucket(8)
    for f in glob.glob(os.path.join(tbl.path, "d-*", "*.parquet")):
        vals = pq.read_table(f, columns=["val"]).column("val").to_pylist()
        assert vals == sorted(vals), f
    assert {(r.id, r.val) for r in tbl.read().collect()} == {
        (i, f"v{(i * 7) % 32:02d}") for i in range(3, 33)
    } | {(1, "v99")}


def test_route_forwards_table_opts_to_versioned_target(spark, tmp_path):
    """CdcStreamRoute(table_opts=…) gives the streaming target the same
    layout levers (bloom skipping, range clustering) as a hand-built
    VersionedBucketedTable."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from qin_cdc_spark.streaming.cdc_stream import CdcStreamRoute

    schema = StructType(
        [StructField("id", LongType()), StructField("val", StringType())]
    )
    route = CdcStreamRoute(
        spark,
        db="src",
        table="t",
        schema=schema,
        keys=["id"],
        target_path=str(tmp_path / "t"),
        versioned=True,
        table_opts={"bloom_cols": ["val"], "sort_cols": ["val"]},
    )
    tgt = route.bind_target()
    assert tgt.bloom_cols == ["val"] and tgt.sort_cols == ["val"]
    tgt.merge(_changes(spark, [("insert", i, i, f"v{i}") for i in range(1, 9)]))
    assert [r.id for r in tgt.read_where("val", ["v3"]).collect()] == [3]


def test_history_reports_reuse_and_exact_rows(spark, tmp_path):
    """history(): driver-side snapshot audit — exact footer row counts,
    shared-vs-new dir accounting, current flag; and it runs NO Spark
    jobs (pure manifest + footer math)."""
    tbl = VersionedBucketedTable(spark, str(tmp_path / "t"), ["id"], n_buckets=8)
    tbl.merge(_changes(spark, [("insert", i, i, f"v{i}") for i in range(1, 17)]))
    tbl.merge(_changes(spark, [("update", 100, 1, "v1b"), ("delete", 101, 2, "x")]))
    h = tbl.history()
    assert [e["version"] for e in h] == [1, 2]
    v1, v2 = h
    assert v1["rows"] == 16 and v1["new_dirs"] == v1["data_dirs"]
    # v2 rewrote only the touched buckets; everything else is shared
    assert 0 < v2["new_dirs"] <= 2
    assert v2["data_dirs"] >= v1["data_dirs"] - 1
    # physical rows at v2: 16 + tombstone still stored for id=2
    assert v2["rows"] == tbl.read_internal(2).count()
    assert v2["is_current"] and not v1["is_current"]
    assert all(e["bytes"] > 0 and e["n_buckets"] == 8 for e in h)


def test_gc_tombstones_drops_below_watermark_only(spark, tmp_path):
    """Tombstones below the redelivery low-water mark are physically
    dropped (touched buckets only — untouched dirs shared with the
    prior version); tombstones at-or-above the mark are kept and keep
    masking redelivered older events; CDF across the gc'd version is
    unchanged; visible rows never change."""
    tbl = VersionedBucketedTable(spark, str(tmp_path / "t"), ["id"], n_buckets=4)
    v1 = tbl.merge(
        _changes(spark, [("insert", 1, 1, "a"), ("insert", 2, 2, "b"),
                         ("insert", 3, 3, "c"), ("insert", 4, 4, "d")]),
        batch_id=0,
    )
    v2 = tbl.merge(
        _changes(spark, [("delete", 5, 2, "b"), ("delete", 20, 3, "c")]),
        batch_id=1,
    )
    man_before = _manifest(tbl)["versions"][str(v2)]["buckets"]
    visible_before = {(r.id, r.val) for r in tbl.read().collect()}
    # low-water mark 10: the seq-5 tombstone is unreachable by
    # redelivery and drops; the seq-20 tombstone stays
    v3 = tbl.gc_tombstones(10)
    assert v3 == v2 + 1
    internal = tbl.read_internal()
    dead = {r.id: r._seq for r in internal.filter(F.col("_deleted")).collect()}
    assert dead == {3: 20}
    assert {(r.id, r.val) for r in tbl.read().collect()} == visible_before
    # untouched buckets share dirs with the prior version
    man_after = _manifest(tbl)["versions"][str(v3)]["buckets"]
    shared = [b for b in man_after if man_before.get(b) == man_after[b]]
    assert shared  # at least the buckets without droppable tombstones
    # the kept tombstone still masks a redelivered OLDER event
    tbl.merge(_changes(spark, [("insert", 6, 3, "ZOMBIE")]), batch_id=2)
    assert 3 not in {r.id for r in tbl.read().collect()}
    # CDF across the gc'd version: delete detection is unchanged
    cdf = {(r.id, r._change) for r in tbl.changes_between(v1, v3).collect()}
    assert cdf == {(2, "delete"), (3, "delete")}
    # idempotent: nothing droppable → no new version minted
    cur = tbl.current_version()
    assert tbl.gc_tombstones(10) == cur
    assert tbl.current_version() == cur


def test_gc_tombstones_empties_pure_tombstone_bucket(spark, tmp_path):
    tbl = VersionedBucketedTable(spark, str(tmp_path / "t"), ["id"], n_buckets=2)
    tbl.merge(_changes(spark, [("insert", 1, 1, "a")]), batch_id=0)
    tbl.merge(_changes(spark, [("delete", 2, 1, "a")]), batch_id=1)
    v = tbl.gc_tombstones(100)
    man = _manifest(tbl)["versions"][str(v)]["buckets"]
    assert man == {}  # the only bucket was pure tombstones → dropped
    assert tbl.read() is None or tbl.read().count() == 0


def test_gc_tombstones_random_interleaving_preserves_lww(spark, tmp_path):
    """Seeded random rounds: merges interleaved with tombstone GC at
    random watermarks must never change visible rows (vs a pure-Python
    LWW fold) and must never let a redelivered sub-watermark event
    resurrect a key (events at-or-above the watermark can still be
    redelivered and must stay masked)."""
    import random

    rng = random.Random(20260815)
    tbl = VersionedBucketedTable(spark, str(tmp_path / "t"), ["id"], n_buckets=4)
    state: dict[int, tuple[int, str | None]] = {}  # id -> (seq, val|None)
    seq = 0
    gc_mark = 0
    for rnd in range(6):
        batch = []
        for _ in range(rng.randint(2, 6)):
            seq += rng.randint(1, 3)
            k = rng.randint(1, 8)
            if rng.random() < 0.35:
                batch.append(("delete", seq, k, "x"))
            else:
                batch.append(("insert", seq, k, f"v{seq}"))
        tbl.merge(_changes(spark, batch), batch_id=rnd)
        for op, s, k, v in batch:
            if state.get(k, (-1, None))[0] < s:
                state[k] = (s, None if op == "delete" else v)
        if rng.random() < 0.6:
            gc_mark = rng.randint(gc_mark, seq)
            tbl.gc_tombstones(gc_mark)
        # redeliver a random PAST event at-or-above the gc mark: the
        # store must converge to the same state (LWW + kept tombstones)
        redeliverable = [e for e in batch if e[1] >= gc_mark]
        if redeliverable and rng.random() < 0.5:
            tbl.merge(_changes(spark, [rng.choice(redeliverable)]))
        expect = {k: v for k, (s, v) in state.items() if v is not None}
        got = {r.id: r.val for r in tbl.read().collect()} if tbl.read() is not None else {}
        assert got == expect, f"round {rnd}: {got} != {expect}"

def test_modify_column_type_rewrites_all_buckets(spark, tmp_path):
    """MODIFY-column evolution on the versioned store: a batch whose
    incoming type differs on a shared column rewrites EVERY current
    bucket (the flat table's table-wide rule) — a touched-buckets-only
    rewrite would mint a manifest mixing string and double files for
    one column, and every mergeSchema read of it would throw
    CANNOT_MERGE_SCHEMAS.  Old versions keep their own uniform files
    (time travel intact); CDF across the boundary reads each side
    separately."""
    from qin_cdc_spark.streaming.versioned import VersionedBucketedTable

    t = VersionedBucketedTable(spark, str(tmp_path / "t"), ["k"], n_buckets=4)
    v1 = t.merge(
        spark.createDataFrame(
            [("insert", 1, 1, "1.5"), ("insert", 2, 2, "2.5"),
             ("insert", 3, 3, "3.5"), ("insert", 4, 4, "4.5")],
            "op string, seq long, k long, amt string",
        ),
        batch_id=0,
    )
    man1 = t._meta()["versions"][str(v1)]["buckets"]
    # widening batch touches ONE key; the rewrite must cover all buckets
    v2 = t.merge(
        spark.createDataFrame(
            [("update", 5, 1, 9.25)], "op string, seq long, k long, amt double"
        ),
        batch_id=1,
    )
    man2 = t._meta()["versions"][str(v2)]["buckets"]
    assert set(man1.values()).isdisjoint(set(man2.values()))  # all-new dirs
    # current read is type-uniform double with stored values cast
    cur = t.read()
    assert dict(cur.dtypes)["amt"] == "double"
    assert {(r.k, r.amt) for r in cur.collect()} == {
        (1, 9.25), (2, 2.5), (3, 3.5), (4, 4.5)
    }
    # time travel: the old version reads its own uniform string files
    old = t.read_at(v1)
    assert dict(old.dtypes)["amt"] == "string"
    assert old.count() == 4
    # CDF across the type boundary: each side reads separately
    cdf = t.changes_between(v1, v2, include_preimage=True)
    ch = {(r.k, r._change) for r in cdf.collect()}
    assert ch == {(1, "update")}


def test_version_manifests_record_schema_and_legacy_falls_back(spark, tmp_path):
    """Versions record their logical schema (VERDICT r8 #3 applied to
    the versioned store): mixed-vintage dirs read under the DECLARED
    schema — added columns come back as typed nulls from pre-evolution
    dirs with no footer-merge job — and a legacy manifest (written
    before schemas were recorded) still reads via the mergeSchema
    fallback."""
    tbl = VersionedBucketedTable(spark, str(tmp_path / "t"), ["id"], n_buckets=4)
    v1 = tbl.merge(_changes(spark, [("insert", 1, 1, "a"), ("insert", 2, 2, "b")]))
    # ADD COLUMN arrives: only id=1's bucket rewrites
    tbl.merge(
        spark.createDataFrame(
            [("update", 3, 1, "a2", 7)],
            "op string, seq long, id long, val string, extra long",
        )
    )
    meta = _manifest(tbl)
    assert meta["versions"]["2"].get("schema") is not None
    names = [f["name"] for f in meta["versions"]["2"]["schema"]["fields"]]
    assert "extra" in names and "_bucket" not in names
    got = {(r.id): (r.val, r.extra) for r in tbl.read().collect()}
    assert got == {1: ("a2", 7), 2: ("b", None)}
    # time travel reads v1 under ITS schema (no extra column)
    assert "extra" not in tbl.read_at(v1).columns
    # legacy manifest: strip the recorded schemas — reads must still
    # resolve the mixed dirs (mergeSchema fallback)
    import json as _json
    import os as _os

    for man in meta["versions"].values():
        man.pop("schema", None)
    with open(_os.path.join(tbl.path, META_NAME), "w") as f:
        _json.dump(meta, f)
    t2 = VersionedBucketedTable(spark, str(tmp_path / "t"), ["id"], n_buckets=4)
    got2 = {(r.id): (r.val, r.extra) for r in t2.read().collect()}
    assert got2 == got
