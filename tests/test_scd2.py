"""SCD Type-2 history table + temporal join (streaming/scd2.py).

Reference parity: the reference streams only CURRENT row images to its
targets (outputs/starrocks/starrocks.go:136-208) and leaves dimension
history / as-of queries to the warehouse; ScdType2Table maintains them
engine-side, incrementally.  Tests compare incremental maintenance
against the one-shot window derivation (scd2_intervals) and against
pure-Python interval folding.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from qin_cdc_spark.streaming.scd2 import ScdType2Table, scd2_intervals, temporal_join


def _ev(spark, rows):
    """rows: (op, seq, k, v)"""
    return spark.createDataFrame(rows, "op string, seq long, k long, v string")


def _hist_rows(scd):
    return {
        (r.k, r.valid_from): (r.valid_to, r.v)
        for r in scd.read_history().collect()
    }


def _intervals_py(events):
    """Pure-Python oracle: fold (op, seq, k, v) into interval rows."""
    out = {}
    by_key = {}
    for op, seq, k, v in sorted(events, key=lambda e: (e[2], e[1])):
        by_key.setdefault(k, []).append((op, seq, v))
    for k, evs in by_key.items():
        for i, (op, seq, v) in enumerate(evs):
            nxt = evs[i + 1][1] if i + 1 < len(evs) else None
            if op != "delete":
                out[(k, seq)] = (nxt, v)
    return out


BATCH1 = [
    ("insert", 10, 1, "a"),
    ("insert", 11, 2, "b"),
    ("update", 20, 1, "a2"),  # two events for k=1 inside ONE batch
    ("insert", 12, 3, "c"),
]
BATCH2 = [
    ("update", 30, 1, "a3"),   # closes the open (1, 20) row
    ("delete", 31, 2, "b"),    # closes (2, 11) without reopening
    ("insert", 40, 2, "b2"),   # re-insert after delete: new interval
    ("update", 32, 3, "c2"),
]


def test_incremental_matches_python_and_window(spark, tmp_path):
    scd = ScdType2Table(spark, str(tmp_path / "h"), keys=["k"], n_buckets=4)
    scd.apply_batch(_ev(spark, BATCH1), batch_id=0)
    scd.apply_batch(_ev(spark, BATCH2), batch_id=1)
    expect = _intervals_py(BATCH1 + BATCH2)
    assert _hist_rows(scd) == expect
    # and equals the one-shot window derivation over the full stream
    one_shot = {
        (r.k, r.valid_from): (r.valid_to, r.v)
        for r in scd2_intervals(_ev(spark, BATCH1 + BATCH2), ["k"]).collect()
    }
    assert one_shot == expect


def test_current_and_as_of(spark, tmp_path):
    scd = ScdType2Table(spark, str(tmp_path / "h"), keys=["k"], n_buckets=4)
    scd.apply_batch(_ev(spark, BATCH1), batch_id=0)
    scd.apply_batch(_ev(spark, BATCH2), batch_id=1)
    cur = {(r.k, r.v) for r in scd.current().collect()}
    assert cur == {(1, "a3"), (2, "b2"), (3, "c2")}
    # as-of seq 25: k1 at version (20,'a2'), k2 still 'b', k3 still 'c'
    snap = {(r.k, r.v) for r in scd.as_of(25).collect()}
    assert snap == {(1, "a2"), (2, "b"), (3, "c")}
    # as-of seq 35: k2 deleted (31) and not yet re-inserted (40)
    snap = {(r.k, r.v) for r in scd.as_of(35).collect()}
    assert snap == {(1, "a3"), (3, "c2")}
    # as-of before any event: empty
    assert scd.as_of(5).count() == 0


def test_replay_idempotent_both_guards(spark, tmp_path):
    scd = ScdType2Table(spark, str(tmp_path / "h"), keys=["k"], n_buckets=4)
    scd.apply_batch(_ev(spark, BATCH1), batch_id=0)
    scd.apply_batch(_ev(spark, BATCH2), batch_id=1)
    before = _hist_rows(scd)
    # whole-batch redelivery: store batch guard short-circuits
    scd.apply_batch(_ev(spark, BATCH2), batch_id=1)
    assert _hist_rows(scd) == before
    # overlap WITHOUT a batch id: the per-key high-water mark drops
    # already-folded events (at-least-once suffix replay)
    scd.apply_batch(_ev(spark, BATCH1 + BATCH2))
    assert _hist_rows(scd) == before


def test_initial_delete_is_noop_and_late_event_dropped(spark, tmp_path):
    scd = ScdType2Table(spark, str(tmp_path / "h"), keys=["k"], n_buckets=4)
    scd.apply_batch(_ev(spark, [("delete", 5, 9, "x"), ("insert", 10, 1, "a")]))
    assert _hist_rows(scd) == {(1, 10): (None, "a")}
    # event at-or-below k=1's high-water mark (10) is a redelivery: dropped
    scd.apply_batch(_ev(spark, [("update", 10, 1, "ghost"), ("update", 9, 1, "g2")]))
    assert _hist_rows(scd) == {(1, 10): (None, "a")}


def test_one_bucket_history_read(spark, tmp_path):
    scd = ScdType2Table(spark, str(tmp_path / "h"), keys=["k"], n_buckets=4)
    scd.apply_batch(_ev(spark, BATCH1), batch_id=0)
    scd.apply_batch(_ev(spark, BATCH2), batch_id=1)
    got = {
        (r.valid_from, r.valid_to, r.v, r.is_current)
        for r in scd.history_of([1]).collect()
    }
    assert got == {(10, 20, "a", False), (20, 30, "a2", False), (30, None, "a3", True)}
    # placement hashes the business key alone: every version of k=1
    # lives in ONE bucket of the store's current manifest
    man = scd.store._meta()["versions"][str(scd.store.current_version())]
    full = scd.store.read()
    buckets_of_k1 = (
        full.filter(F.col("k") == 1)
        .select(scd.store._bucket_expr(scd.store._manifest_n_buckets(man)).alias("b"))
        .distinct()
        .count()
    )
    assert buckets_of_k1 == 1


@pytest.mark.parametrize("seed", [7, 23])
def test_random_rounds_match_recompute(spark, tmp_path, seed):
    """N rounds of seeded random insert/update/delete: incremental
    history equals the pure-Python fold after every round."""
    import random

    rng = random.Random(seed)
    scd = ScdType2Table(spark, str(tmp_path / f"h{seed}"), keys=["k"], n_buckets=4)
    all_events, seq, live = [], 0, set()
    for rnd in range(4):
        batch = []
        for _ in range(25):
            seq += 1
            k = rng.randrange(8)
            if k in live:
                op = rng.choice(["update", "delete"])
                if op == "delete":
                    live.discard(k)
            else:
                op = "insert"
                live.add(k)
            batch.append((op, seq, k, f"v{seq}"))
        all_events += batch
        scd.apply_batch(_ev(spark, batch), batch_id=rnd)
        assert _hist_rows(scd) == _intervals_py(all_events)


def test_temporal_join_semantics_and_plan(spark):
    events = BATCH1 + BATCH2
    hist = scd2_intervals(_ev(spark, events), ["k"])
    facts = spark.createDataFrame(
        [(1, 100, 25), (1, 101, 9), (2, 102, 35), (2, 103, 40), (3, 104, 32)],
        "k long, fact_id long, asof long",
    )
    out = {
        (r.fact_id, r.v)
        for r in temporal_join(facts, hist, ["k"], "asof").collect()
    }
    assert out == {
        (100, "a2"),   # inside [20, 30)
        (101, None),   # before k=1's first event
        (102, None),   # k=2 deleted at 31, re-inserted at 40
        (103, "b2"),   # at the open interval's start
        (104, "c2"),
    }
    # scale contract: equi-join on the key, never a nested loop
    plan = temporal_join(facts, hist, ["k"], "asof")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_composite_key_history_and_temporal_join(spark, tmp_path):
    """Multi-PK parity (the reference's composite-key path,
    outputs/mysql/mysql_utils.go:90-112): history keyed (k1, k2), and
    the temporal join equi-joins on both key columns."""
    rows = [
        ("insert", 10, 1, 1, "a"),
        ("insert", 11, 1, 2, "b"),   # same k1, different k2 — distinct keys
        ("update", 20, 1, 1, "a2"),
        ("delete", 21, 1, 2, "b"),
    ]
    ev = spark.createDataFrame(rows, "op string, seq long, k1 long, k2 long, v string")
    scd = ScdType2Table(spark, str(tmp_path / "h"), keys=["k1", "k2"], n_buckets=4)
    scd.apply_batch(ev.filter(F.col("seq") <= 11), batch_id=0)
    scd.apply_batch(ev.filter(F.col("seq") > 11), batch_id=1)
    hist = {
        (r.k1, r.k2, r.valid_from): (r.valid_to, r.v)
        for r in scd.read_history().collect()
    }
    assert hist == {
        (1, 1, 10): (20, "a"),
        (1, 1, 20): (None, "a2"),
        (1, 2, 11): (21, "b"),
    }
    facts = spark.createDataFrame(
        [(1, 1, 15, 100), (1, 2, 15, 101), (1, 2, 22, 102)],
        "k1 long, k2 long, asof long, fact_id long",
    )
    out = {
        (r.fact_id, r.v)
        for r in temporal_join(
            facts, scd2_intervals(ev, ["k1", "k2"]), ["k1", "k2"], "asof"
        ).collect()
    }
    assert out == {(100, "a"), (101, "b"), (102, None)}


def test_hot_key_serving_reads_one_bucket(spark, tmp_path):
    """The VERDICT r5 watch item measured: history_of / read_key_asof
    on a HOT key (hundreds of versions) open exactly the key's bucket —
    cost is the key's own version list, never the table."""
    scd = ScdType2Table(spark, str(tmp_path / "h"), keys=["k"], n_buckets=8)
    hot = [("update", s, 1, f"v{s}") for s in range(1, 401)]
    cold = [("insert", i, i, f"c{i}") for i in range(401, 601)]
    scd.apply_batch(_ev(spark, hot + cold), batch_id=0)
    h = scd.history_of([1])
    man = scd.store._meta()["versions"][str(scd.store.current_version())]
    opened = {f.rsplit("/", 2)[-2] for f in h.inputFiles()}
    assert len(opened) == 1 and opened < set(man["buckets"].values())
    assert h.count() == 400  # every version of the hot key, one bucket
    # point-in-time point lookup: interval filter over the same bucket
    snap = scd.read_key_asof([1], 250)
    opened2 = {f.rsplit("/", 2)[-2] for f in snap.inputFiles()}
    assert opened2 == opened
    assert [(r.k, r.valid_from, r.v) for r in snap.collect()] == [(1, 250, "v250")]
    # before the first event → empty, not an error
    assert scd.read_key_asof([1], 0).count() == 0


def test_temporal_join_pruned_opens_fact_buckets_only(spark, tmp_path):
    """ScdType2Table.temporal_join: serving a point-lookup-shaped fact
    batch opens strictly fewer bucket dirs than the history holds
    (the test_gsi.py inputFiles discipline), and the result matches the
    stream-the-whole-history module-level join."""
    scd = ScdType2Table(spark, str(tmp_path / "h"), keys=["k"], n_buckets=16)
    rows = [("insert", i * 10, i, f"v{i}") for i in range(1, 33)] + [
        ("update", i * 10 + 5, i, f"w{i}") for i in range(1, 33)
    ]
    scd.apply_batch(_ev(spark, rows), batch_id=0)
    facts = spark.createDataFrame([(1, 12), (1, 3)], "k long, asof long")
    out = scd.temporal_join(facts, "asof", how="left")
    man = scd.store._meta()["versions"][str(scd.store.current_version())]
    opened = {f.rsplit("/", 2)[-2] for f in out.inputFiles()}
    assert opened < set(man["buckets"].values())
    got = {(r.k, r.asof, r.v) for r in out.collect()}
    assert got == {(1, 12, "v1"), (1, 3, None)}
    # parity with the full-history module-level join
    full = temporal_join(facts, scd.read_history(), ["k"], "asof", how="left")
    assert {(r.k, r.asof, r.v) for r in full.collect()} == got


def test_dlq_replay_folds_into_history(spark, tmp_path):
    """replay_dlq honors the history contract: recovered rows are
    dimension versions too, so after a replay the SCD2 history matches
    the target — not permanently missing the quarantined versions."""
    import pyspark.sql.types as T

    from qin_cdc_spark.cdc.envelope import envelope_from_typed
    from qin_cdc_spark.streaming.cdc_stream import CdcStreamRoute

    changes = _ev(spark, BATCH1)
    env = envelope_from_typed(changes, db="src", table="dim")
    good_schema = changes.drop("op", "seq").schema
    broken = T.StructType(
        [
            T.StructField("k", T.ArrayType(T.LongType()))
            if f.name == "k"
            else f
            for f in good_schema.fields
        ]
    )
    route = CdcStreamRoute(
        spark, db="src", table="dim", schema=broken, keys=["k"],
        target_path=str(tmp_path / "t"), n_buckets=4, versioned=True,
        history_path=str(tmp_path / "hist"), dlq_path=str(tmp_path / "dlq"),
    )
    route.apply_batch(env, batch_id=0)  # pk parses null → all quarantined
    assert route.history is None or route.history.read_history() is None

    route.schema = good_schema
    applied, still_bad = route.replay_dlq()
    assert (applied, still_bad) == (len(BATCH1), 0)
    assert _hist_rows(route.history) == _intervals_py(BATCH1)
    live = {(r.k, r.v) for r in route.target.read().collect()}
    assert {(r.k, r.v) for r in route.history.current().collect()} == live
    # replay idempotence extends to the history (high-water mark absorbs it)
    route.replay_dlq()
    assert _hist_rows(route.history) == _intervals_py(BATCH1)


def test_stream_route_maintains_history(spark, tmp_path):
    """CdcStreamRoute(history_path=…): the SAME decoded batches maintain
    the LWW target and the SCD2 history; current() == target live rows,
    and redelivered batches no-op on both guards."""
    from qin_cdc_spark.cdc.envelope import envelope_from_typed
    from qin_cdc_spark.streaming.cdc_stream import CdcStreamRoute

    changes = _ev(spark, BATCH1 + BATCH2)
    env = envelope_from_typed(changes, db="src", table="dim")
    schema = changes.drop("op", "seq").schema
    route = CdcStreamRoute(
        spark, db="src", table="dim", schema=schema, keys=["k"],
        target_path=str(tmp_path / "t"), n_buckets=4, versioned=True,
        history_path=str(tmp_path / "hist"),
    )
    split = 20  # BATCH1 seqs ≤ 20, BATCH2 seqs > 20
    route.apply_batch(env.filter(F.col("seq") <= split), batch_id=0)
    route.apply_batch(env.filter(F.col("seq") > split), batch_id=1)
    hist = _hist_rows(route.history)
    assert hist == _intervals_py(BATCH1 + BATCH2)
    live = {(r.k, r.v) for r in route.target.read().collect()}
    cur = {(r.k, r.v) for r in route.history.current().collect()}
    assert cur == live
    # whole-batch redelivery (fresh-checkpoint replay): both stores no-op
    route.apply_batch(env.filter(F.col("seq") > split), batch_id=1)
    assert _hist_rows(route.history) == hist
