"""Plan-shape and distribution assertions for operators/scale_joins.py
(result correctness is covered by the oracle gate)."""

from __future__ import annotations

import contextlib
import io

import pyspark.sql.functions as F

from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_shuffle(spark):
    from qin_cdc_spark.operators.scale_joins import bucketed_tables

    o_name, l_name = bucketed_tables(spark, SF_SMOKE)
    orders = spark.table(o_name)
    li = spark.table(l_name)
    # At fixture scale AQE would just broadcast the tiny side (and skip
    # bucketed reading entirely); disable it to expose the plan shape
    # that matters at 100 TB, where neither side broadcasts.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = orders.join(li, orders.o_orderkey == li.l_orderkey)
        plan = _plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # Bucketed co-location: the join itself must not introduce a shuffle.
    assert "Exchange hashpartitioning" not in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan


def test_bucketed_scan_reports_selected_buckets(spark):
    from qin_cdc_spark.operators.scale_joins import bucketed_tables

    o_name, _ = bucketed_tables(spark, SF_SMOKE)
    # autoBucketedScan disables bucketed reading when no join/agg
    # benefits; turn it off so the point filter shows bucket pruning.
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        plan = _plan(spark.table(o_name).filter(F.col("o_orderkey") == 7))
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    assert "SelectedBucketsCount: 1 out of 8" in plan, plan


def test_salted_join_spreads_hot_key(spark):
    from qin_cdc_spark.operators.scale_joins import N_SALT, salted_join

    # one hot key (0) with 10k rows + a long tail
    fact = spark.range(0, 10_000).select(
        F.lit(0).alias("k"), F.col("id").alias("payload")
    ).unionByName(
        spark.range(1, 1_000).select(F.col("id").alias("k"), F.col("id").alias("payload"))
    )
    dim = spark.range(0, 1_000).select(F.col("id").alias("dk"), (F.col("id") * 2).alias("dval"))
    out = salted_join(fact, dim, "k", "dk")
    assert out.count() == 10_000 + 999
    # the hot key's rows must occupy every salt bucket
    salt = F.pmod(F.xxhash64(F.col("k"), F.col("payload")), F.lit(N_SALT))
    n_buckets = (
        fact.filter(F.col("k") == 0).select(salt.alias("s")).distinct().count()
    )
    assert n_buckets == N_SALT


def test_zonemap_scan_prunes_files(spark):
    from qin_cdc_spark.operators.scale_joins import scan_sorted_zonemap

    out = scan_sorted_zonemap(spark, SF_SMOKE)
    row = out.collect()[0]
    assert row["n_rows"] > 0
    plan = _plan(out)
    assert "PushedFilters" in plan and "o_orderkey" in plan


def test_salted_twophase_equals_plain_join(spark):
    """Two-phase skew join (salt only measured-hot keys) returns exactly
    the plain join's rows on a synthetically skewed input: one key with
    500 fact rows (hot), 50 keys with 3 (cold)."""
    import pyspark.sql.functions as F

    from qin_cdc_spark.operators.scale_joins import salted_join_twophase

    fact = spark.range(500).select(
        F.lit(7).alias("k"), (F.col("id") * 2).alias("v")
    ).unionAll(
        spark.range(150).select(
            (F.col("id") % 50 + 100).alias("k"), F.col("id").alias("v")
        )
    )
    dim = spark.range(200).select(F.col("id").alias("dk"), (F.col("id") * 10).alias("dv"))
    got = (
        salted_join_twophase(fact, dim, "k", "dk", hot_threshold=100)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("dv").alias("s"))
    )
    want = (
        fact.join(dim, fact.k == dim.dk)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("dv").alias("s"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_interval_binned_join_no_nested_loop(spark):
    """The binned interval join must plan as an equi join on the bin
    (broadcast of the exploded interval side) — never a nested-loop /
    cartesian, which is what a naive theta-range join becomes."""
    from qin_cdc_spark.operators.scale_joins import join_interval_binned

    plan = _plan(join_interval_binned(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan, plan


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    """Evidence for the layout claim: on a 2-D box, the z-order layout
    must admit strictly fewer candidate files (per-file min/max on BOTH
    columns) than a 1-D custkey sort, which must beat nothing at all."""
    import glob

    import pyarrow.parquet as papq
    import pyspark.sql.functions as F

    from qin_cdc_spark.operators.scale_joins import _orders_2d, write_zorder_layout
    from tests.conftest import SF_SMOKE

    d2 = _orders_2d(spark, SF_SMOKE)
    lo_day = d2.agg(F.min("order_day")).collect()[0][0]
    box = {"o_custkey": (100, 400), "order_day": (lo_day + 5, lo_day + 12)}

    zpath = str(tmp_path / "z")
    write_zorder_layout(d2, zpath)
    spath = str(tmp_path / "s")
    (
        d2.repartitionByRange(8, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.parquet(spath)
    )

    def candidate_files(path):
        n_cand = n_total = 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = papq.ParquetFile(f).metadata
            n_total += 1
            schema_names = [md.schema.column(i).name for i in range(md.num_columns)]
            overlaps = True
            for col, (lo, hi) in box.items():
                idx = schema_names.index(col)
                mins, maxs = [], []
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx).statistics
                    mins.append(st.min)
                    maxs.append(st.max)
                if min(mins) > hi or max(maxs) < lo:
                    overlaps = False
                    break
            n_cand += overlaps
        return n_cand, n_total

    z_cand, z_total = candidate_files(zpath)
    s_cand, s_total = candidate_files(spath)
    assert z_total >= 8 and s_total >= 8
    # 1-D sort prunes on custkey only; z-order must do strictly better
    assert z_cand < s_cand, (z_cand, s_cand)


def test_dpp_runtime_pruning_in_plan(spark):
    """The fact scan must carry a DynamicPruningExpression — partitions
    open only after the broadcast dim's join keys arrive at runtime."""
    import contextlib
    import io

    from qin_cdc_spark.operators.scale_joins import join_dpp_pruned
    from tests.conftest import SF_SMOKE

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        join_dpp_pruned(spark, SF_SMOKE).explain("formatted")
    plan = buf.getvalue().lower()
    assert "dynamicpruningexpression" in plan


def test_bloom_index_prunes_files_with_no_false_negatives(spark, tmp_path):
    """A point lookup through the Bloom index must (a) read strictly
    fewer files than the layout holds — with each key in exactly one of
    8 hash-clustered files and 5 keys, candidates ≤ 5 + FPs — and
    (b) return exactly the rows a full scan returns (Bloom guarantee:
    skipping is only ever of files that CANNOT contain the key)."""
    from qin_cdc_spark.operators.scale_joins import (
        bloom_candidate_files,
        build_bloom_file_index,
    )
    from qin_cdc_spark.sources.tables import load_table

    orders = load_table(spark, SF_SMOKE, "orders")
    path = str(tmp_path / "orders_hashed")
    orders.repartition(8, "o_orderkey").write.parquet(path)
    index = build_bloom_file_index(spark, path, "o_orderkey")

    keys = [r.o_orderkey for r in orders.select("o_orderkey").limit(5).collect()]
    files = bloom_candidate_files(spark, index, keys)
    n_total = len(
        [f for f in __import__("os").listdir(path) if f.endswith(".parquet")]
    )
    assert n_total == 8
    assert 1 <= len(files) < n_total, files

    pruned = (
        spark.read.parquet(*files)
        .filter(F.col("o_orderkey").isin(keys))
        .select("o_orderkey", "o_custkey")
    )
    full = (
        spark.read.parquet(path)
        .filter(F.col("o_orderkey").isin(keys))
        .select("o_orderkey", "o_custkey")
    )
    assert sorted(map(tuple, pruned.collect())) == sorted(map(tuple, full.collect()))


def test_bloom_probe_bits_match_sparkside_hash(spark):
    """The driver-side md5 probe computation must be bit-identical to
    the hash60 expression the index build uses — otherwise lookups
    silently miss (a false NEGATIVE, breaking the Bloom contract)."""
    from qin_cdc_spark.functions.text import hash60
    from qin_cdc_spark.operators.scale_joins import (
        BLOOM_M_BITS,
        BLOOM_N_HASHES,
        _bloom_probe_bits,
    )

    df = spark.createDataFrame([(12345,), (7,), (999999,)], "k long")
    probes = F.array(
        *[
            F.pmod(
                hash60(F.concat_ws(":", F.lit(str(i)), F.col("k").cast("string"))),
                F.lit(BLOOM_M_BITS),
            )
            for i in range(BLOOM_N_HASHES)
        ]
    )
    got = {r.k: list(r.p) for r in df.select("k", probes.alias("p")).collect()}
    for k, spark_bits in got.items():
        assert spark_bits == _bloom_probe_bits(k), k


def test_bloom_probe_rejects_divergent_rendering_types(spark):
    """bool/double/timestamp keys render differently under Python str()
    vs Spark cast("string") (True vs true, 1e+20 vs 1.0E20, ...), so the
    probe bits would silently diverge from the built bits — a false
    negative.  probe_bits must refuse those types loudly; string keys
    must still round-trip bit-identically."""
    import datetime

    import pytest

    from qin_cdc_spark.functions.text import hash60
    from qin_cdc_spark.operators.scale_joins import (
        BLOOM_M_BITS,
        BLOOM_N_HASHES,
        _bloom_probe_bits,
    )

    for bad in (True, False, 1e20, 0.1, datetime.datetime(2024, 1, 1)):
        with pytest.raises(TypeError):
            _bloom_probe_bits(bad)

    # str keys: one shared rendering on both sides
    df = spark.createDataFrame([("alpha",), ("b:c",), ("",)], "k string")
    probes = F.array(
        *[
            F.pmod(
                hash60(F.concat_ws(":", F.lit(str(i)), F.col("k").cast("string"))),
                F.lit(BLOOM_M_BITS),
            )
            for i in range(BLOOM_N_HASHES)
        ]
    )
    got = {r.k: list(r.p) for r in df.select("k", probes.alias("p")).collect()}
    for k, spark_bits in got.items():
        assert spark_bits == _bloom_probe_bits(k), k
