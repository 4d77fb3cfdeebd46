"""Property-based hardening for the session's algorithmic operators:
PPJoin prefix-filter completeness vs a pure-Python brute force, and
Morton-key bijectivity/order locality."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _brute_force_pairs(texts: dict[int, str], t: float) -> set[tuple[int, int]]:
    """Exact Jaccard >= t over 3-word shingle sets, pure Python."""

    def shingles(s: str) -> frozenset:
        w = s.split()
        if len(w) <= 3:
            return frozenset([" ".join(w)])
        return frozenset(" ".join(w[i : i + 3]) for i in range(len(w) - 2))

    sets = {d: shingles(s) for d, s in texts.items()}
    out = set()
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter / union >= t:
                out.add((a, b))
    return out


# small vocab forces overlap; repeated words force hot shingles
_doc = st.lists(
    st.sampled_from([f"w{i}" for i in range(12)]), min_size=4, max_size=20
).map(" ".join)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_doc, min_size=2, max_size=8))
def test_prefix_exact_join_complete_on_random_corpora(spark, texts):
    """The prefix filter must lose NO pair: operator output == the
    pure-Python all-pairs answer on adversarial random corpora."""
    import qin_cdc_spark.operators.similarity as sim

    docs_map = {i + 1: t for i, t in enumerate(texts)}
    docs = spark.createDataFrame(
        list(docs_map.items()), "doc_id long, text string"
    )
    orig = sim.load_table
    sim.load_table = lambda s, d, n: docs
    try:
        got = {
            (r.doc_a, r.doc_b)
            for r in sim.dedup_jaccard_prefix_exact(spark, "x").collect()
        }
    finally:
        sim.load_table = orig
    want = _brute_force_pairs(docs_map, 0.5)
    assert got == want


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    xs=st.lists(
        st.integers(min_value=0, max_value=(1 << 21) - 1), min_size=1, max_size=8
    ),
    ys=st.lists(
        st.integers(min_value=0, max_value=(1 << 21) - 1), min_size=1, max_size=8
    ),
)
def test_morton_key_is_bijective(spark, xs, ys):
    """Interleave must be invertible: distinct (x, y) -> distinct z, and
    de-interleaving recovers the inputs exactly."""
    import pyspark.sql.functions as F

    from qin_cdc_spark.operators.scale_joins import ZBITS, morton_key

    pts = list({(x, y) for x, y in zip(xs, ys)})
    df = spark.createDataFrame(pts, "x long, y long").withColumn(
        "z", morton_key(F.col("x"), F.col("y"))
    )
    rows = df.collect()
    assert len({r.z for r in rows}) == len(pts)
    for r in rows:
        x = sum(((r.z >> (2 * b)) & 1) << b for b in range(ZBITS))
        y = sum(((r.z >> (2 * b + 1)) & 1) << b for b in range(ZBITS))
        assert (x, y) == (r.x, r.y)
