"""Tombstone GC composed with the route's state stores.

`tombstone-gc-lag` physically drops delete tombstones from the TARGET
below the redelivery low-water mark (versioned.gc_tombstones).  The
stores riding the same batches — the SCD2 history, a GSI refreshed from
the target's CDF, the wire egress — must be byte-equal to a no-GC run:
GC'ing the target must never GC state-store semantics.  Each test runs
a GC twin and a no-GC twin over the same stream and hash-compares every
surface, plus asserts the GC actually dropped tombstones (the test
would otherwise be vacuous).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from qin_cdc_spark.cdc.envelope import envelope_from_typed
from qin_cdc_spark.streaming.cdc_stream import CdcStreamRoute


def _ev(spark, rows):
    return spark.createDataFrame(rows, "op string, seq long, k long, v string")


B0 = [("insert", 1, 1, "a"), ("insert", 2, 2, "b"), ("insert", 3, 3, "c"),
      ("insert", 4, 4, "d"), ("insert", 5, 5, "e"), ("insert", 6, 6, "f")]
B1 = [("delete", 7, 2, None), ("delete", 8, 3, None), ("update", 9, 1, "a2")]
B2 = [("update", 20, 4, "d2"), ("update", 21, 5, "e2"), ("delete", 22, 6, None)]
BATCHES = [B0, B1, B2]
LAG = 2  # after B2 (hw=22) tombstones below seq 20 drop: deletes of 2 and 3


def _run(spark, tmp_path, name, *, gc_lag, gsi=False, **route_kw):
    changes = _ev(spark, [e for b in BATCHES for e in b])
    schema = changes.drop("op", "seq").schema
    route = CdcStreamRoute(
        spark, db="src", table="t", schema=schema, keys=["k"],
        target_path=str(tmp_path / name / "t"), n_buckets=4, versioned=True,
        tombstone_gc_lag=gc_lag, **route_kw,
    )
    idx = None
    if gsi:
        from qin_cdc_spark.streaming.gsi import GlobalSecondaryIndex

        idx = GlobalSecondaryIndex(
            spark, str(tmp_path / name / "gsi"), index_col="v",
            pk_cols=["k"], n_buckets=4,
        )
    for i, b in enumerate(BATCHES):
        route.apply_batch(
            envelope_from_typed(_ev(spark, b), db="src", table="t"), batch_id=i
        )
        if idx is not None:
            idx.refresh(route.bind_target())
    return route, idx


def _tombstones(route):
    return (
        route.bind_target()
        .read_internal()
        .filter(F.col("_deleted"))
        .count()
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect()) if df is not None else None


def test_gc_composes_with_scd2_history(spark, tmp_path):
    """target + history_path with tombstone GC active: the target's live
    rows AND the full SCD2 history equal the no-GC twin's."""
    gc_route, _ = _run(spark, tmp_path, "gc", gc_lag=LAG,
                       history_path=str(tmp_path / "gc" / "hist"))
    plain_route, _ = _run(spark, tmp_path, "plain", gc_lag=None,
                          history_path=str(tmp_path / "plain" / "hist"))
    assert _tombstones(gc_route) < _tombstones(plain_route)  # GC really ran
    assert _rows(gc_route.target.read()) == _rows(plain_route.target.read())
    assert _rows(gc_route.bind_history().read_history()) == _rows(
        plain_route.bind_history().read_history()
    )
    # the history keeps ALL closed intervals (deletes close, never vanish)
    hist = {(r.k, r.valid_from): r.valid_to
            for r in gc_route.bind_history().read_history().collect()}
    assert hist[(2, 2)] == 7 and hist[(3, 3)] == 8 and hist[(6, 6)] == 22


def test_gc_composes_with_gsi_and_egress(spark, tmp_path):
    """target + CDF-refreshed GSI + wire egress with tombstone GC
    active: index state, lookups, and the published wire messages equal
    the no-GC twin's (GC mints a version whose CDF is empty — claim (1)
    of gc_tombstones — so CDF consumers never observe it)."""
    gc_route, gc_idx = _run(spark, tmp_path, "gc", gc_lag=LAG, gsi=True,
                            egress_format="default")
    plain_route, plain_idx = _run(spark, tmp_path, "plain", gc_lag=None,
                                  gsi=True, egress_format="default")
    assert _tombstones(gc_route) < _tombstones(plain_route)
    assert _rows(gc_idx.read()) == _rows(plain_idx.read())
    assert _rows(gc_idx.lookup(["a2", "d2", "f"])) == _rows(
        plain_idx.lookup(["a2", "d2", "f"])
    )
    # wire messages: same bytes (GC's extra version widens a range name,
    # never changes message content)
    gc_msgs = sorted((r.key, r.value) for r in gc_route.read_egress().collect())
    plain_msgs = sorted(
        (r.key, r.value) for r in plain_route.read_egress().collect()
    )
    assert gc_msgs == plain_msgs
