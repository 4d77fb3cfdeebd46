"""Training-shard writer: reproducibility, balance, stored order."""

from __future__ import annotations

import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="shards_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_writer_round_trip_and_reproducible(spark, tmpdir):
    from qin_cdc_spark.operators.shards import (
        N_SHARDS,
        read_shard,
        write_training_shards,
    )
    from qin_cdc_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    m1 = {r.shard: (r.n_docs, r.n_chars) for r in
          write_training_shards(docs, f"{tmpdir}/a").collect()}
    m2 = {r.shard: (r.n_docs, r.n_chars) for r in
          write_training_shards(docs, f"{tmpdir}/b").collect()}
    assert m1 == m2  # deterministic assignment

    # contents AND stored order identical across independent writes
    for s in range(N_SHARDS):
        a = [r.doc_id for r in read_shard(spark, f"{tmpdir}/a", s).collect()]
        b = [r.doc_id for r in read_shard(spark, f"{tmpdir}/b", s).collect()]
        assert a == b and a

    # no doc lost or duplicated
    total = sum(n for n, _ in m1.values())
    assert total == docs.count()


def test_shards_are_balanced(spark, tmpdir):
    from qin_cdc_spark.operators.shards import write_training_shards
    from qin_cdc_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    m = write_training_shards(docs, f"{tmpdir}/s").collect()
    counts = [r.n_docs for r in m]
    assert min(counts) > 0
    # hash uniformity at 500 docs / 8 shards: no shard > 2x the smallest
    assert max(counts) <= 2 * min(counts), counts


def test_shard_read_is_in_shuffle_key_order(spark, tmpdir):
    from qin_cdc_spark.operators.shards import read_shard, write_training_shards
    from qin_cdc_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    write_training_shards(docs, f"{tmpdir}/s")
    rows = read_shard(spark, f"{tmpdir}/s", 3).select("shuffle_key").collect()
    keys = [r.shuffle_key for r in rows]
    assert keys == sorted(keys) and keys


def test_no_global_sort_in_write_plan(spark):
    """The shard layout must come from repartition + in-partition sort,
    never a global range sort."""
    import contextlib
    import io

    from qin_cdc_spark.operators.shards import with_shard
    from qin_cdc_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    staged = (
        with_shard(docs)
        .repartition(8, F.col("shard"))
        .sortWithinPartitions("shard", "shuffle_key")
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        staged.explain("formatted")
    plan = buf.getvalue()
    assert "rangepartitioning" not in plan.lower()
    assert "Sort" in plan  # local sort present
    assert "global=false" in plan or "Arguments: [shard" in plan
