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
    from qin_cdc_spark.streaming.derived import DerivedExtremaTable

    fact = VersionedBucketedTable(spark, str(tmp_path / "f"), ["id"], n_buckets=4)
    dim = VersionedBucketedTable(spark, str(tmp_path / "d"), ["ck"], n_buckets=4)
    agg = DerivedAggTable(
        spark, str(tmp_path / "agg"), group_cols=["grp"], sum_cols=["amt"]
    )
    ext = DerivedExtremaTable(
        spark, str(tmp_path / "ext"), group_cols=["grp"], minmax_cols=["amt"]
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
    ext.refresh(fact)
    jmv.refresh(fact, dim)

    # purged ids include each group's current min (1, 2) — the extrema
    # retraction path must rescan off the value-free tombstones'
    # PREIMAGES (the post-purge snapshot no longer stores the values)
    purge_keys(fact, _keys(spark, [1, 2, 3]), seq=1000)
    agg.refresh(fact)  # the cascade IS the normal incremental refresh
    ext.refresh(fact)
    jmv.refresh(fact, dim)

    live = fact.read()
    expect_agg = {
        (r.grp, r.cnt, r.s)
        for r in live.groupBy("grp")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("amt").alias("s"))
        .collect()
    }
    assert {(r.grp, r.cnt, r.sum_amt) for r in agg.read().collect()} == expect_agg
    expect_ext = {
        (r.grp, r.cnt, r.lo, r.hi)
        for r in live.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("amt").alias("lo"),
            F.max("amt").alias("hi"),
        )
        .collect()
    }
    assert {
        (r.grp, r.cnt, r.min_amt, r.max_amt) for r in ext.read().collect()
    } == expect_ext
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


def test_purge_cascades_to_ivf_index(spark, tmp_path):
    """The ANN index is the riskier RTBF leak (embeddings are derived
    content): purge keys on the versioned embeddings table, feed the
    purge version's CDF into IvfIndex.apply_cdf, and the purged vectors
    must be gone from the inverted lists AND unfindable by search."""
    import pyspark.sql.functions as F

    from qin_cdc_spark.operators.ivf import IvfIndex, ivf_search
    from qin_cdc_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    tbl = VersionedBucketedTable(
        spark, str(tmp_path / "vt"), ["vec_id"], n_buckets=8
    )
    v1 = tbl.merge(
        emb.select(
            F.lit("insert").alias("op"),
            F.col("vec_id").alias("seq"),
            "vec_id",
            "embedding",
        )
    )
    idx = IvfIndex(str(tmp_path / "idx"))
    idx.build(spark, "/root/testdata/sf0.001")

    purged = [r.vec_id for r in emb.limit(5).collect()]
    v2 = purge_keys(
        tbl,
        spark.createDataFrame([(i,) for i in purged], "vec_id long"),
        seq=10_000_000,
    )
    # the cascade IS the normal CDF maintenance path
    idx.apply_cdf(tbl.changes_between(v1, v2, include_preimage=True))

    left = {r.vec_id for r in idx.corpus(spark).select("vec_id").collect()}
    assert not (set(purged) & left)
    # a purged doc is unfindable: search with every purged vector as the
    # query — none of them may appear as a result (nor as a query hit
    # against itself)
    queries = emb.filter(F.col("vec_id").isin(purged)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    res = ivf_search(spark, idx, queries, n_probe=16).collect()
    assert res  # other docs still found
    assert not (set(purged) & {r.cand_id for r in res})


def test_purge_drops_neardup_fingerprints(spark, tmp_path):
    """Signature-store RTBF: purge physically erases the fingerprints
    (touched part files rewritten), a re-submitted copy of a purged doc
    is ADMITTED again (the store no longer 'remembers' it), and the
    next compact() rebuilds the band index without the purged rows."""
    import glob as _glob

    import pyspark.sql.functions as F

    from qin_cdc_spark.streaming.neardup_store import NearDupStore

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "a completely different document about spark query planning"),
            (3, "yet another unrelated text on parquet bloom filter pruning"),
        ],
        "doc_id long, text string",
    )
    store = NearDupStore(spark, str(tmp_path / "nd"), n_buckets=8)
    store.admit_batch(docs, batch_id=0)
    store.compact()
    assert {r.doc_id for r in store.read().collect()} == {1, 2, 3}

    # a near-copy of doc 1 is rejected while 1 is remembered
    copy = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog again and again")],
        "doc_id long, text string",
    )
    store.admit_batch(copy, batch_id=1)
    assert 10 not in {r.doc_id for r in store.read().collect()}

    n = store.purge([1])
    assert n == 1
    assert {r.doc_id for r in store.read().collect()} == {2, 3}
    # and no surviving parquet byte mentions doc 1's signature row
    import pyarrow.parquet as pq

    for f in _glob.glob(str(tmp_path / "nd" / "*.parquet")):
        t = pq.read_table(f)
        assert 1 not in t.column("doc_id").to_pylist()

    # forgetting works: the same content is admitted again
    copy2 = spark.createDataFrame(
        [(20, "the quick brown fox jumps over the lazy dog again and again")],
        "doc_id long, text string",
    )
    store.admit_batch(copy2, batch_id=2)
    assert 20 in {r.doc_id for r in store.read().collect()}

    # compact() drops the stale band-index rows for the purged doc
    store.compact()
    idx = spark.read.parquet(str(tmp_path / "nd" / "_bands"))
    assert 1 not in {r.doc_id for r in idx.select("doc_id").collect()}


def test_purge_cascades_to_round5_mvs(spark, tmp_path):
    """The round-5 MV family follows a purge through its normal
    incremental refresh: quantile bins retract off the value-free
    tombstones' PREIMAGES, the top-k buffer drops purged champions
    (rescanning if the slack underflows), the keyed aggregate retracts
    per-customer totals, and the level-2 chain ripples the histogram."""
    from qin_cdc_spark.streaming.derived import (
        DerivedKeyedAggTable,
        DerivedQuantileTable,
        DerivedTopKTable,
    )

    fact = VersionedBucketedTable(spark, str(tmp_path / "f"), ["id"], n_buckets=4)
    qmv = DerivedQuantileTable(
        spark, str(tmp_path / "q"), group_cols=["grp"], value_col="amt",
        bin_width=10,
    )
    tk = DerivedTopKTable(
        spark, str(tmp_path / "tk"), group_cols=["grp"], key_cols=["id"],
        value_col="amt", k=2, buffer_size=3,
    )
    ka = DerivedKeyedAggTable(
        spark, str(tmp_path / "ka"), group_cols=["ck"], sum_cols=["amt"],
        n_buckets=4,
    )
    chain = DerivedKeyedAggTable(
        spark, str(tmp_path / "chain"), group_cols=["cnt"], sum_cols=[],
        n_buckets=2, cnt_col="n_keys",
    )
    fact.merge(
        _fact(
            spark,
            [("insert", i, i, 10 + (i % 2) * 10, f"g{i % 2}", i * 10) for i in range(1, 9)],
        )
    )
    for mv in (qmv, tk, ka):
        mv.refresh(fact)
    chain.refresh(ka.store)

    # ids 7 and 8 are the two group champions; 1 shares ck=20's totals
    purge_keys(fact, _keys(spark, [1, 7, 8]), seq=1000)
    for mv in (qmv, tk, ka):
        mv.refresh(fact)  # the cascade IS the normal incremental refresh
    chain.refresh(ka.store)

    live = fact.read()
    exp_bins = {
        (r.grp, r.amt // 10): 1 for r in live.collect()
    }
    agg_bins: dict = {}
    for r in live.collect():
        k = (r.grp, r.amt // 10)
        agg_bins[k] = agg_bins.get(k, 0) + 1
    got_bins = {(r.grp, r.bin): r.cnt for r in qmv.read().collect()}
    assert got_bins == agg_bins
    assert not any(r.id in {1, 7, 8} for r in tk.read().collect())
    exp_tk = {}
    bygrp: dict = {}
    for r in live.collect():
        bygrp.setdefault(r.grp, []).append((-r.amt, r.id))
    for g, items in bygrp.items():
        for rank, (nv, i) in enumerate(sorted(items)[:2], start=1):
            exp_tk[(g, rank)] = (i, -nv)
    assert {
        (r.grp, r.rank): (r.id, r.amt) for r in tk.read().collect()
    } == exp_tk
    exp_ka = {
        (r.ck): (r.cnt, r.s)
        for r in live.groupBy("ck")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("amt").alias("s"))
        .collect()
    }
    assert {
        r.ck: (r.cnt, r.sum_amt) for r in ka.read().collect()
    } == exp_ka
    hist: dict = {}
    for cnt, _ in exp_ka.values():
        hist[cnt] = hist.get(cnt, 0) + 1
    assert {r.cnt: r.n_keys for r in chain.read().collect()} == hist


def test_purge_where_predicate_takedown(spark, tmp_path):
    """Content-predicate purge: every row matching the predicate is
    tombstoned value-free; non-matching rows survive untouched."""
    from qin_cdc_spark.streaming.forget import purge_where

    tbl = VersionedBucketedTable(spark, str(tmp_path / "t"), ["id"], n_buckets=2)
    tbl.merge(
        _fact(
            spark,
            [("insert", i, i, 10, "bad" if i % 3 == 0 else "ok", i * 10)
             for i in range(1, 10)],
        )
    )
    purge_where(tbl, F.col("grp") == "bad", seq=100)
    live = tbl.read().collect()
    assert {r.id for r in live} == {1, 2, 4, 5, 7, 8}
    stones = tbl.read_internal().filter(F.col("_deleted")).collect()
    assert {r.id for r in stones} == {3, 6, 9}
    assert all(r.amt is None and r.grp is None for r in stones)
