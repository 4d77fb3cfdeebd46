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


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=-(2**31), max_value=2**31),
            st.one_of(st.none(), st.text(max_size=20)),
            st.one_of(
                st.none(),
                st.floats(allow_nan=False, allow_infinity=False, width=64),
            ),
        ),
        min_size=1,
        max_size=6,
        unique_by=lambda r: r[0],
    )
)
def test_envelope_decode_roundtrip_property(spark, rows):
    """to_json → from_json round trip must be lossless for arbitrary
    payloads: JSON-escaping-hostile text (quotes, backslashes, newlines,
    unicode), nulls (dropped from JSON, restored as null), and doubles
    at full precision."""
    from qin_cdc_spark.cdc.apply import decode_envelope
    from qin_cdc_spark.cdc.envelope import envelope_from_typed

    df = spark.createDataFrame(
        [(i, n, v, "insert", k) for k, (i, n, v) in enumerate(rows)],
        "id long, name string, value double, op string, seq long",
    )
    env = envelope_from_typed(df, db="d", table="t")
    dec = decode_envelope(
        env, df.drop("op", "seq").schema, db="d", table="t", keys=["id"]
    )
    got = sorted((r.id, r.name, r.value) for r in dec.collect())
    want = sorted(rows)
    assert got == want


# ---------------------------------------------------------------------------
# VersionedBucketedTable vs a pure-Python versioned-LWW model: random
# op sequences partitioned into batches; every retained snapshot must
# equal the model's state after the corresponding prefix of batches.
# ---------------------------------------------------------------------------


def _model_apply(state, batch):
    """state: key -> (seq, val, deleted).  LWW by seq (ties: later
    event in batch order wins only if seq strictly greater — the
    engine keeps max-seq; equal seq keeps whichever max_by picks, so
    the generator below never emits duplicate (key, seq) pairs)."""
    for op, seq, k, v in batch:
        cur = state.get(k)
        if cur is None or seq > cur[0]:
            state[k] = (seq, v, op == "delete")
    return state


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ops=st.lists(
        st.tuples(
            st.sampled_from(["insert", "update", "delete"]),
            st.integers(min_value=0, max_value=9),   # key
            st.integers(min_value=0, max_value=99),  # value payload
        ),
        min_size=1,
        max_size=24,
    ),
    n_batches=st.integers(min_value=1, max_value=3),
)
def test_versioned_table_matches_python_model(spark, tmp_path_factory, ops, n_batches):
    from qin_cdc_spark.streaming.versioned import VersionedBucketedTable

    # unique seq per event (list position) → no equal-seq ambiguity
    events = [(op, i, k, f"v{val}") for i, (op, k, val) in enumerate(ops)]
    cut = max(1, len(events) // n_batches)
    batches = [events[i : i + cut] for i in range(0, len(events), cut)]

    tbl = VersionedBucketedTable(
        spark, str(tmp_path_factory.mktemp("vprop") / "t"), ["id"], n_buckets=4
    )
    versions = []
    for b in batches:
        df = spark.createDataFrame(
            [(op, seq, k, v) for op, seq, k, v in b],
            "op string, seq long, id long, val string",
        )
        versions.append(tbl.merge(df))

    state: dict = {}
    for b, v in zip(batches, versions):
        state = _model_apply(state, b)
        want = {
            (k, val) for k, (seq, val, dead) in state.items() if not dead
        }
        got = {(r.id, r.val) for r in tbl.read_at(v).collect()}
        assert got == want, (v, got, want)
