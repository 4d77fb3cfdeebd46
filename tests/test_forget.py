"""purge_keys (streaming/forget.py): right-to-be-forgotten cascade —
value-free tombstones, consumer MVs follow via their normal refresh,
physical erasure composes with retention GC."""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F

from qin_cdc_spark.streaming.derived import DerivedAggTable, DerivedJoinTable
from qin_cdc_spark.streaming.forget import purge_keys
from qin_cdc_spark.streaming.versioned import VersionedBucketedTable


def _fact(spark, rows):
    return spark.createDataFrame(
        rows, "op string, seq long, id long, ck long, grp string, amt long"
    )


def _dim(spark, rows):
    return spark.createDataFrame(rows, "op string, seq long, ck long, name string")


def _keys(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def test_purge_emits_value_free_tombstones(spark, tmp_path):
    tbl = VersionedBucketedTable(spark, str(tmp_path / "t"), ["id"], n_buckets=4)
    tbl.merge(
        _fact(spark, [("insert", i, i, 10, "g", i * 100) for i in range(1, 9)])
    )
    v = purge_keys(tbl, _keys(spark, [2, 5]), seq=1000)
    assert v == 2
    assert {r.id for r in tbl.read().collect()} == {1, 3, 4, 6, 7, 8}
    # the tombstones survive for replay protection but carry NO values
    stones = tbl.read_internal().filter(F.col("_deleted")).collect()
    assert {r.id for r in stones} == {2, 5}
    assert all(r.amt is None and r.grp is None and r.ck is None for r in stones)
    # a redelivered pre-purge update for a purged key loses LWW
    tbl.merge(_fact(spark, [("update", 5, 5, 10, "g", 999)]))
    assert 5 not in {r.id for r in tbl.read().collect()}


def test_purge_strips_values_from_soft_deleted_keys(spark, tmp_path):
    """A key deleted through ordinary CDC keeps its row image inside the
    value-carrying LWW tombstone; purging that key must replace it with
    a value-free tombstone — the soft-deleted-then-purged case."""
    tbl = VersionedBucketedTable(spark, str(tmp_path / "t"), ["id"], n_buckets=4)
    tbl.merge(_fact(spark, [("insert", i, i, 10, "g", i * 100) for i in (1, 2, 3)]))
    # ordinary CDC delete: tombstone carries the row image
    tbl.merge(_fact(spark, [("delete", 10, 2, 10, "g", 200)]))
    stone = tbl.read_internal().filter(F.col("_deleted")).collect()
    assert [(r.id, r.amt) for r in stone] == [(2, 200)]
    # purge the dead key (and a live one): both end value-free
    purge_keys(tbl, _keys(spark, [2, 3]), seq=1000)
    stones = tbl.read_internal().filter(F.col("_deleted")).collect()
    assert {r.id for r in stones} == {2, 3}
    assert all(r.amt is None and r.grp is None and r.ck is None for r in stones)
    assert {r.id for r in tbl.read().collect()} == {1}


def test_purge_cascades_to_agg_and_join_mvs(spark, tmp_path):
    fact = VersionedBucketedTable(spark, str(tmp_path / "f"), ["id"], n_buckets=4)
    dim = VersionedBucketedTable(spark, str(tmp_path / "d"), ["ck"], n_buckets=4)
    agg = DerivedAggTable(
        spark, str(tmp_path / "agg"), group_cols=["grp"], sum_cols=["amt"]
    )
    jmv = DerivedJoinTable(
        spark, str(tmp_path / "jmv"),
        fact_keys=["id"], join_col="ck", dim_key="ck", n_buckets=4,
    )
    dim.merge(_dim(spark, [("insert", 1, 10, "a"), ("insert", 2, 20, "b")]))
    fact.merge(
        _fact(
            spark,
            [("insert", i, i, 10 + (i % 2) * 10, f"g{i % 2}", i * 10) for i in range(1, 9)],
        )
    )
    agg.refresh(fact)
    jmv.refresh(fact, dim)

    purge_keys(fact, _keys(spark, [1, 2, 3]), seq=1000)
    agg.refresh(fact)  # the cascade IS the normal incremental refresh
    jmv.refresh(fact, dim)

    live = fact.read()
    expect_agg = {
        (r.grp, r.cnt, r.s)
        for r in live.groupBy("grp")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("amt").alias("s"))
        .collect()
    }
    assert {(r.grp, r.cnt, r.sum_amt) for r in agg.read().collect()} == expect_agg
    d = dim.read()
    expect_join = {
        (r.id, r.amt, r.name)
        for r in live.join(d, live.ck == d.ck, "inner").drop(d.ck).collect()
    }
    assert {(r.id, r.amt, r.name) for r in jmv.read().collect()} == expect_join
    assert not {1, 2, 3} & {r.id for r in jmv.read().collect()}


def test_purge_plus_gc_erases_history_bytes(spark, tmp_path):
    """After purge + gc(keep_last=1), no retained snapshot can see the
    purged rows and the pre-purge data dirs are physically deleted."""
    tbl = VersionedBucketedTable(spark, str(tmp_path / "t"), ["id"], n_buckets=2)
    tbl.merge(_fact(spark, [("insert", i, i, 10, "g", i) for i in range(1, 5)]))
    v1_dirs = {
        d for d in os.listdir(tbl.path) if d.startswith("d-")
    }
    purge_keys(tbl, _keys(spark, [1, 2, 3, 4]), seq=100)
    tbl.gc(keep_last=1)
    assert tbl.versions() == [tbl.current_version()]
    assert tbl.read().count() == 0
    # every pre-purge dir is gone from disk (both buckets were touched)
    left = {d for d in os.listdir(tbl.path) if d.startswith("d-")}
    assert not (v1_dirs & left)
    # and the surviving parquet bytes contain no purged values
    for f in glob.glob(os.path.join(tbl.path, "d-*", "*.parquet")):
        import pyarrow.parquet as pq

        t = pq.read_table(f)
        assert t.column("amt").null_count == t.num_rows
