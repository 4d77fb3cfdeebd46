"""Property-based hardening (hypothesis) for the hand-built operators:
salted join ≡ plain join, and DataFrame connected components ≡ a pure
Python union-find, on randomized inputs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    fact_keys=st.lists(st.integers(min_value=0, max_value=6), min_size=0, max_size=25),
    dim_keys=st.sets(st.integers(min_value=0, max_value=6), max_size=7),
)
def test_salted_join_equals_plain_join(spark, fact_keys, dim_keys):
    from qin_cdc_spark.operators.scale_joins import salted_join

    fact = spark.createDataFrame(
        [(k, i) for i, k in enumerate(fact_keys)] or [(None, None)],
        "k long, payload long",
    ).filter("k is not null")
    dim = spark.createDataFrame(
        [(k, k * 10) for k in dim_keys] or [(None, None)], "dk long, dval long"
    ).filter("dk is not null")
    got = sorted(
        (r["k"], r["payload"], r["dval"])
        for r in salted_join(fact, dim, "k", "dk").collect()
    )
    want = sorted(
        (k, i, k * 10) for i, k in enumerate(fact_keys) if k in dim_keys
    )
    assert got == want


def _union_find_components(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=15),
            st.integers(min_value=0, max_value=15),
        ).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=20,
    )
)
def test_connected_components_equals_union_find(spark, edges):
    from qin_cdc_spark.operators.llm_ext import connected_components

    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["component"] for r in connected_components(pairs).collect()
    }
    assert got == _union_find_components(edges)


@given(
    weights=st.lists(st.integers(min_value=0, max_value=20_000), min_size=1, max_size=200),
    step=st.integers(min_value=1, max_value=10_000),
)
def test_pps_multiplicity_telescopes_to_exact_total(weights, step):
    """Systematic-PPS exactness: per-doc multiplicities
    (W_i div STEP) - (W_{i-1} div STEP) telescope, so the TOTAL sample
    size is exactly total_weight div STEP for every weight sequence —
    the property that makes the budget guarantee deterministic, not
    just expected.  (Pure formula mirror of sample_weighted_pps's
    selection rule; the Spark/DuckDB agreement is gate-checked.)"""
    cum = 0
    total_mult = 0
    for w in weights:
        prev = cum
        cum += w
        total_mult += cum // step - prev // step
    assert total_mult == sum(weights) // step


def _hamilton_py(weights: list[int], budget: int) -> list[int]:
    """Pure-Python largest-remainder mirror (ties by index asc)."""
    total = sum(weights)
    base = [budget * w // total for w in weights]
    rem = [budget * w - b * total for w, b in zip(weights, base)]
    leftover = budget - sum(base)
    order = sorted(range(len(weights)), key=lambda i: (-rem[i], i))
    out = list(base)
    for i in order[:leftover]:
        out[i] += 1
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    weights=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=12)
    .filter(lambda ws: sum(ws) > 0),
    budget=st.integers(min_value=1, max_value=10**6),
)
def test_hamilton_alloc_matches_pure_python(spark, weights, budget):
    """Spark Hamilton apportionment ≡ the pure-Python mirror, and the
    two invariants hold: Σ alloc == budget, |alloc − quota| < 1."""
    from qin_cdc_spark.operators.fusion import hamilton_alloc

    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(weights)], "k int, w long"
    )
    got = {
        r.k: r.alloc for r in hamilton_alloc(df, "k", "w", budget).collect()
    }
    want = _hamilton_py(weights, budget)
    assert [got[i] for i in range(len(weights))] == want
    assert sum(got.values()) == budget
    total = sum(weights)
    for i, w in enumerate(weights):
        assert abs(got[i] - budget * w / total) < 1.0 + 1e-9
