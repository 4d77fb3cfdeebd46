"""Store integrity checker (streaming/fsck.py).

Each test plants ONE specific damage class in a real store and asserts
fsck names it — plus the clean-store and CLI contracts.
"""

from __future__ import annotations

import json
import os
import shutil

from qin_cdc_spark.streaming.fsck import (
    fsck_consumer,
    fsck_path,
    fsck_versioned_path,
    ok,
)
from qin_cdc_spark.streaming.partitioned import PartitionedVersionedTable
from qin_cdc_spark.streaming.versioned import META_NAME, VersionedBucketedTable


def _ev(spark, rows):
    return spark.createDataFrame(rows, "op string, seq long, k long, v string")


def _mk_versioned(spark, path):
    tbl = VersionedBucketedTable(spark, path, ["k"], n_buckets=4)
    tbl.merge(_ev(spark, [("insert", 1, 1, "a"), ("insert", 2, 2, "b")]), batch_id=0)
    tbl.merge(_ev(spark, [("update", 3, 1, "a2")]), batch_id=1)
    return tbl


def test_clean_versioned_store_is_ok(spark, tmp_path):
    _mk_versioned(spark, str(tmp_path / "t"))
    rep = fsck_path(str(tmp_path / "t"))
    assert rep["kind"] == "versioned"
    assert ok(rep) and rep["errors"] == []


def test_missing_data_dir_is_an_error(spark, tmp_path):
    tbl = _mk_versioned(spark, str(tmp_path / "t"))
    man = tbl._meta()["versions"][str(tbl.current_version())]
    victim = next(iter(man["buckets"].values()))
    shutil.rmtree(os.path.join(tbl.path, victim))
    rep = fsck_path(tbl.path)
    assert not ok(rep)
    assert any("data dir missing" in e and victim in e for e in rep["errors"])


def test_current_behind_and_bad_bucket_id(spark, tmp_path):
    tbl = _mk_versioned(spark, str(tmp_path / "t"))
    meta = tbl._meta()
    meta["current"] = 1  # hand-edit: current behind max retained
    meta["versions"]["2"]["buckets"]["99"] = next(
        iter(meta["versions"]["2"]["buckets"].values())
    )
    with open(os.path.join(tbl.path, META_NAME), "w") as f:
        json.dump(meta, f)
    rep = fsck_path(tbl.path)
    errs = " | ".join(rep["errors"])
    assert "behind max retained" in errs and "outside [0," in errs


def test_orphan_dir_is_warning_not_error(spark, tmp_path):
    tbl = _mk_versioned(spark, str(tmp_path / "t"))
    os.makedirs(os.path.join(tbl.path, "d-deadbeef"))
    rep = fsck_path(tbl.path)
    assert ok(rep)
    assert any("orphan data dir d-deadbeef" in w for w in rep["warnings"])


def test_deep_footer_check_catches_truncation(spark, tmp_path):
    tbl = _mk_versioned(spark, str(tmp_path / "t"))
    man = tbl._meta()["versions"][str(tbl.current_version())]
    d = os.path.join(tbl.path, next(iter(man["buckets"].values())))
    victim = next(f for f in os.listdir(d) if f.endswith(".parquet"))
    with open(os.path.join(d, victim), "r+b") as f:
        f.truncate(10)  # destroy the footer
    assert ok(fsck_path(tbl.path))  # shallow: dirs exist, no error
    rep = fsck_path(tbl.path, deep=True)
    assert not ok(rep)
    assert any("unreadable parquet footer" in e for e in rep["errors"])


def test_partitioned_store_and_reclaimed_subversion(spark, tmp_path):
    p = str(tmp_path / "pt")
    tbl = PartitionedVersionedTable(
        spark, p, ["k"], partition_col="yr", n_buckets=2
    )
    ev = spark.createDataFrame(
        [("insert", 1, 1, 1995, "a"), ("insert", 2, 2, 1996, "b")],
        "op string, seq long, k long, yr int, v string",
    )
    tbl.merge(ev, batch_id=0)
    tbl.merge(
        spark.createDataFrame(
            [("update", 3, 1, 1995, "a2")],
            "op string, seq long, k long, yr int, v string",
        ),
        batch_id=1,
    )
    rep = fsck_path(p)
    assert rep["kind"] == "partitioned" and ok(rep)
    assert len(rep["partitions"]) == 2
    # reclaim a referenced sub-version behind the parent's back
    ent = tbl._manifest(1)["1995"]
    sub = tbl._sub("1995", ent["gen"])
    sub.gc(keep_last=1)  # parent v1 still references the old sub-version
    rep = fsck_path(p)
    assert not ok(rep)
    assert any("not retained there" in e for e in rep["errors"])


def test_consumer_ahead_of_source(spark):
    assert ok(fsck_consumer(3, 5))
    rep = fsck_consumer(7, 5, name="mv1")
    assert not ok(rep) and "ahead of the source" in rep["errors"][0]


def test_cli_fsck(spark, tmp_path, capsys):
    from qin_cdc_spark.__main__ import main

    tbl = _mk_versioned(spark, str(tmp_path / "t"))
    assert main(["--fsck", tbl.path]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["errors"] == []
    assert main(["--fsck", str(tmp_path / "nothing")]) == 1


def test_unknown_layout(spark, tmp_path):
    os.makedirs(tmp_path / "x", exist_ok=True)
    rep = fsck_versioned_path(str(tmp_path / "x"))
    assert not ok(rep)


def test_hand_edited_partition_manifest_reports_not_raises(spark, tmp_path):
    """A hand-edited parent manifest (string entry, missing gen, missing
    sub-version) must come back as error REPORTS — fsck's whole purpose
    is auditing exactly this damage, so a traceback is a bug."""
    from qin_cdc_spark.streaming.partitioned import PART_META_NAME

    p = str(tmp_path / "pt")
    tbl = PartitionedVersionedTable(spark, p, ["k"], partition_col="yr", n_buckets=2)
    ev = spark.createDataFrame(
        [("insert", 1, 1, 1995, "a"), ("insert", 2, 2, 1996, "b")],
        "op string, seq long, k long, yr int, v string",
    )
    tbl.merge(ev, batch_id=0)
    mp = os.path.join(p, PART_META_NAME)
    with open(mp) as f:
        meta = json.load(f)
    man = meta["versions"][str(meta["current"])]
    man["1995"] = "gen-oops"            # entry is a bare string
    man["1996"].pop("gen")              # entry lost its generation
    man["1997"] = {"gen": "gen-x"}      # entry lost its sub-version
    with open(mp, "w") as f:
        json.dump(meta, f)
    rep = fsck_path(p)                  # must not raise
    assert not ok(rep)
    assert any("entry is not a mapping" in e for e in rep["errors"])
    assert any("has no generation" in e for e in rep["errors"])
    assert any("has no sub-version" in e for e in rep["errors"])


def _mkpub(base, name):
    import os

    os.makedirs(os.path.join(base, name), exist_ok=True)


def test_fsck_egress_dir(tmp_path):
    """Egress publication fsck: contiguous coverage is clean, stage
    residue and subsumed dirs warn, a coverage gap or malformed name
    errors — and fsck_path auto-detects the layout."""
    from qin_cdc_spark.streaming.fsck import fsck_egress_dir, fsck_path, ok

    eg = str(tmp_path / "eg")
    for d in ("v0-2", "v2-5"):
        _mkpub(eg, d)
    rep = fsck_egress_dir(eg)
    assert ok(rep) and rep["hwm"] == 5 and not rep["warnings"]
    assert fsck_path(eg)["kind"] == "egress"
    # compaction residue: a wider range subsumes v0-2 (warning), and a
    # crashed emission left a stage dir (warning)
    _mkpub(eg, "v0-5")
    _mkpub(eg, "v5-7.stage-deadbeef")
    rep = fsck_egress_dir(eg)
    assert ok(rep) and rep["hwm"] == 5
    assert any("subsumed" in w for w in rep["warnings"])
    assert any("stage residue" in w for w in rep["warnings"])
    # a GAP is an error: v7-9 without [5, 7)
    _mkpub(eg, "v7-9")
    rep = fsck_egress_dir(eg)
    assert not ok(rep) and any("coverage gap" in e for e in rep["errors"])
    # malformed names error; empty ranges error
    _mkpub(str(tmp_path / "bad"), "vX-3")
    _mkpub(str(tmp_path / "bad"), "v4-4")
    rep = fsck_egress_dir(str(tmp_path / "bad"))
    assert any("unparsable" in e for e in rep["errors"])
    assert any("inverted" in e for e in rep["errors"])


def test_fsck_coordinator(tmp_path):
    """Coordinator fsck: monotone per-table versions, well-formed
    egress stamps, and stamped boundaries must stay
    wire-reconstructible against the real publication dirs."""
    import json
    import os

    from qin_cdc_spark.streaming.fsck import fsck_coordinator_path, fsck_path, ok

    cpath = str(tmp_path / "coord")
    os.makedirs(cpath)
    eg = str(tmp_path / "eg")
    for d in ("v0-1", "v1-2"):
        _mkpub(eg, d)
    meta = {
        "batches": {"0": {"t.A": 1}, "1": {"t.A": 2}},
        "egress": {"0": {"t.A": [0, 1]}, "1": {"t.A": [1, 2]}},
    }
    with open(os.path.join(cpath, "_coordinates.json"), "w") as f:
        json.dump(meta, f)
    rep = fsck_coordinator_path(cpath, egress_dirs={"t.A": eg})
    assert ok(rep), rep["errors"]
    assert fsck_path(cpath)["kind"] == "coordinator"
    # version regression: batch 2 sees t.A at an OLDER version
    meta["batches"]["2"] = {"t.A": 1}
    with open(os.path.join(cpath, "_coordinates.json"), "w") as f:
        json.dump(meta, f)
    rep = fsck_coordinator_path(cpath)
    assert any("BACKWARDS" in e for e in rep["errors"])
    # compaction across a retained boundary: replace the two
    # publications with one v0-2 — the batch-0 stamp (to=1) is no
    # longer reconstructible, the batch-1 stamp (to=2) still is
    del meta["batches"]["2"]
    with open(os.path.join(cpath, "_coordinates.json"), "w") as f:
        json.dump(meta, f)
    for d in ("v0-1", "v1-2"):
        os.rmdir(os.path.join(eg, d))
    _mkpub(eg, "v0-2")
    rep = fsck_coordinator_path(cpath, egress_dirs={"t.A": eg})
    errs = [e for e in rep["errors"] if "not wire-reconstructible" in e]
    assert len(errs) == 1 and "batch 0" in errs[0]
    # malformed stamp shape
    meta["egress"]["1"]["t.A"] = [2, 1]
    with open(os.path.join(cpath, "_coordinates.json"), "w") as f:
        json.dump(meta, f)
    rep = fsck_coordinator_path(cpath)
    assert any("malformed egress stamp" in e for e in rep["errors"])


def test_fsck_live_coordinator_and_egress_are_clean(spark, tmp_path):
    """A REAL coordinated two-route run (the crash-sweep scaffolding)
    fscks clean end to end: both egress dirs, the coordinator manifest
    (with boundary reconstruction against the live dirs), and after a
    boundary-preserving coordinator compaction it STAYS clean."""
    from qin_cdc_spark.streaming.cdc_stream import emit_store_egress
    from qin_cdc_spark.streaming.coordinator import SnapshotCoordinator
    from qin_cdc_spark.streaming.fsck import (
        fsck_coordinator_path,
        fsck_egress_dir,
        ok,
    )
    from qin_cdc_spark.streaming.versioned import VersionedBucketedTable

    tab = VersionedBucketedTable(spark, str(tmp_path / "t"), ["k"], n_buckets=2)
    eg = str(tmp_path / "eg")
    coord = SnapshotCoordinator(
        str(tmp_path / "coord"), {"t.A": tab}, egress_dirs={"t.A": eg}
    )
    for b, rows in enumerate(
        [
            [("insert", 1, 1, "a"), ("insert", 2, 2, "b")],
            [("update", 3, 1, "a2")],
            [("delete", 4, 2, None)],
        ]
    ):
        tab.merge(
            spark.createDataFrame(rows, "op string, seq long, k long, v string"),
            batch_id=b,
        )
        emit_store_egress(tab, eg, database="t", table_name="A")
        coord.record(b)
    assert ok(fsck_egress_dir(eg))
    rep = fsck_coordinator_path(str(tmp_path / "coord"), egress_dirs={"t.A": eg})
    assert ok(rep), rep["errors"]
    # expire the oldest coordinate, compact publications within the
    # retained segments — every retained boundary must stay readable
    coord.expire(keep_last=2)
    coord.compact_egress(spark)
    assert ok(fsck_egress_dir(eg))
    rep = fsck_coordinator_path(str(tmp_path / "coord"), egress_dirs={"t.A": eg})
    assert ok(rep), rep["errors"]

def test_fsck_boundary_follows_reader_rule(spark, tmp_path):
    """ADVICE r7 (medium): with compaction-crash residue — v0-4, v4-6,
    v6-10 PLUS the combined v4-10 — the reader picks widest-first at
    boundary 4, hits v4-10 crossing boundary 6, and raises; the fsck
    check must agree (it previously tiled via the subsumed dirs and
    reported clean exactly while the boundary was unreadable).  Both
    now share ONE rule function (egress_coverage_until)."""
    import json
    import os

    import pytest

    from qin_cdc_spark.streaming.cdc_stream import read_store_egress_until
    from qin_cdc_spark.streaming.fsck import (
        _boundary_reconstructible,
        _egress_ranges_fs,
        _report,
        fsck_coordinator_path,
        ok,
    )

    eg = str(tmp_path / "eg")
    for d in ("v0-4", "v4-6", "v6-10", "v4-10"):
        _mkpub(eg, d)
    ranges = _egress_ranges_fs(eg, _report(eg, "egress"))
    # the reader: boundary 6 raises (v4-10 crosses it), 4 and 10 are
    # readable (the raise happens before any parquet read, so empty
    # dirs suffice to exercise the rule)
    with pytest.raises(ValueError, match="crosses it"):
        read_store_egress_until(spark, eg, 6)
    # fsck mirrors the reader exactly
    assert _boundary_reconstructible(ranges, 6) is False
    assert _boundary_reconstructible(ranges, 4) is True
    assert _boundary_reconstructible(ranges, 10) is True
    # end to end: a coordinator stamping boundary 6 reports the error
    cpath = str(tmp_path / "coord")
    os.makedirs(cpath)
    meta = {"batches": {"0": {"t.A": 1}}, "egress": {"0": {"t.A": [0, 6]}}}
    with open(os.path.join(cpath, "_coordinates.json"), "w") as f:
        json.dump(meta, f)
    rep = fsck_coordinator_path(cpath, egress_dirs={"t.A": eg})
    assert not ok(rep)
    assert any("not wire-reconstructible" in e for e in rep["errors"])


def test_fsck_coordinator_corrupt_egress_section_reports_not_raises(tmp_path):
    """ADVICE r7 (low): a non-integer egress batch key or a
    non-mapping stamps value must become an error REPORT — the
    integrity checker crashing on exactly the corrupt manifests it
    exists to report defeats its purpose."""
    import json
    import os

    from qin_cdc_spark.streaming.fsck import fsck_coordinator_path, ok

    cpath = str(tmp_path / "coord")
    os.makedirs(cpath)
    meta = {
        "batches": {"0": {"t.A": 1}, "1": {"t.A": 2}},
        "egress": {"zero": {"t.A": [0, 1]}, "1": "oops"},
    }
    with open(os.path.join(cpath, "_coordinates.json"), "w") as f:
        json.dump(meta, f)
    rep = fsck_coordinator_path(cpath)  # must not raise
    assert not ok(rep)
    assert any("non-integer egress batch keys" in e for e in rep["errors"])
    assert any("stamps value is not a mapping" in e for e in rep["errors"])

def test_fsck_egress_schema_sidecars(spark, tmp_path):
    """Sidecar audit: corrupt _egress_schema.json is an error; the
    coverage tail missing one (while other publications carry them) is
    a warning — DDL detection degrades for exactly one emission;
    sidecar-free (pre-feature) dirs stay silent."""
    import json as _json
    import os

    from qin_cdc_spark.streaming.fsck import fsck_egress_dir, ok

    eg = str(tmp_path / "eg")
    for d in ("v0-2", "v2-5"):
        _mkpub(eg, d)
    # pre-feature dir: no sidecars anywhere → clean and silent
    rep = fsck_egress_dir(eg)
    assert ok(rep) and not rep["warnings"]
    # feature in use, tail sidecar lost → warning
    with open(os.path.join(eg, "v0-2", "_egress_schema.json"), "w") as f:
        _json.dump({"columns": [["k", "bigint"]]}, f)
    rep = fsck_egress_dir(eg)
    assert ok(rep)
    assert any("no schema sidecar" in w for w in rep["warnings"])
    # corrupt sidecar → error
    with open(os.path.join(eg, "v2-5", "_egress_schema.json"), "w") as f:
        f.write("{broken")
    rep = fsck_egress_dir(eg)
    assert any("corrupt schema sidecar" in e for e in rep["errors"])
    # a REAL emission's dir fscks clean (sidecar written atomically)
    from qin_cdc_spark.cdc.envelope import envelope_from_typed
    from qin_cdc_spark.streaming.cdc_stream import CdcStreamRoute

    changes = spark.createDataFrame(
        [("insert", 1, 1, "a")], "op string, seq long, k long, v string"
    )
    route = CdcStreamRoute(
        spark, db="src", table="t", schema=changes.drop("op", "seq").schema,
        keys=["k"], target_path=str(tmp_path / "t"), n_buckets=2,
        versioned=True, egress_format="default",
    )
    route.apply_batch(envelope_from_typed(changes, db="src", table="t"), batch_id=0)
    rep = fsck_egress_dir(route.egress_dir)
    assert ok(rep) and not rep["warnings"]
