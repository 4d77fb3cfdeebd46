"""Property-based check of the LWW apply core: for ANY event stream,
``apply_changes`` must equal a sequential replay, and splitting the
stream at any point and applying the two halves through a target
snapshot must give the same result (micro-batch composition)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from qin_cdc_spark.cdc.apply import apply_changes

KEYS = list(range(5))

event = st.tuples(
    st.sampled_from(["insert", "update", "delete", "replace"]),
    st.sampled_from(KEYS),
    st.integers(min_value=0, max_value=999),
)


def sequential_replay(events):
    """Ground truth: fold the stream in seq order over a dict."""
    state = {}
    for seq, (op, key, val) in enumerate(events):
        if op == "delete":
            state.pop(key, None)
        else:
            state[key] = val
    return state


def spark_apply(spark, events, split_at=None):
    rows = [(op, seq, key, val) for seq, (op, key, val) in enumerate(events)]
    if not rows:
        return {}
    if split_at is None:
        df = spark.createDataFrame(rows, ["op", "seq", "id", "v"])
        out = apply_changes(None, df, ["id"])
    else:
        first = rows[:split_at] or None
        second = rows[split_at:]
        target = None
        if first:
            target = apply_changes(
                None, spark.createDataFrame(first, ["op", "seq", "id", "v"]), ["id"]
            )
        if second:
            out = apply_changes(
                target, spark.createDataFrame(second, ["op", "seq", "id", "v"]), ["id"]
            )
        else:
            out = target
    return {r.id: r.v for r in out.collect()}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=st.lists(event, min_size=0, max_size=25), split_frac=st.floats(0, 1))
def test_lww_apply_equals_sequential_replay(spark, events, split_frac):
    expected = sequential_replay(events)
    got = spark_apply(spark, events)
    assert got == expected
    # batch composition: target-then-suffix equals one-shot
    split_at = int(len(events) * split_frac)
    got_split = spark_apply(spark, events, split_at=split_at)
    assert got_split == expected
