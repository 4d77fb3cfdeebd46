"""Incremental connected-components cluster store (streaming/cc_store.py).

Every scenario is checked against a pure-Python union-find recompute of
the FINAL edge set — merges via added edges, splits via removed bridge
documents, singleton drop-out, replay, and the affected-scope bound.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from qin_cdc_spark.streaming.cc_store import IncrementalClusterStore


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "a long, b long")


def _nodes(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "node long")


def _labels(store):
    df = store.read()
    return {} if df is None else {r.node: r.label for r in df.collect()}


def _cc_py(edges, removed=()):
    """Min-label components of the live edge set, pure Python."""
    live = [
        (a, b) for a, b in edges if a not in removed and b not in removed
    ]
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in live:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


E1 = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)]
E2 = [(4, 10), (30, 31)]          # merges {1..4} with {10,11}; new comp
RM = [21]                          # splits {20,21,22} → {20},{22} singletons


def test_additions_merge_components(spark, tmp_path):
    st = IncrementalClusterStore(spark, str(tmp_path / "cc"), n_buckets=4)
    st.apply_batch(_pairs(spark, E1), batch_id=0)
    assert _labels(st) == _cc_py(E1)
    st.apply_batch(_pairs(spark, E2), batch_id=1)
    assert _labels(st) == _cc_py(E1 + E2)
    # merged component took the global min label
    assert _labels(st)[11] == 1


def test_removal_splits_and_drops_singletons(spark, tmp_path):
    st = IncrementalClusterStore(spark, str(tmp_path / "cc"), n_buckets=4)
    st.apply_batch(_pairs(spark, E1), batch_id=0)
    st.apply_batch(None, _nodes(spark, RM), batch_id=1)
    # 20 and 22 became edgeless → implicit singletons, no label rows
    assert _labels(st) == _cc_py(E1, removed=set(RM))
    assert 20 not in _labels(st) and 21 not in _labels(st)
    # adjacency physically erased both directions
    adj = st.adj.read()
    assert adj.filter((F.col("node") == 21) | (F.col("peer") == 21)).count() == 0


def test_removal_with_alternate_path_keeps_component(spark, tmp_path):
    """Removing a node on a CYCLE must not split the component."""
    st = IncrementalClusterStore(spark, str(tmp_path / "cc"), n_buckets=4)
    cyc = [(1, 2), (2, 3), (3, 1), (3, 4)]
    st.apply_batch(_pairs(spark, cyc), batch_id=0)
    st.apply_batch(None, _nodes(spark, [2]), batch_id=1)
    assert _labels(st) == _cc_py(cyc, removed={2})
    assert _labels(st)[4] == 1  # still reaches 1 via 3


def test_string_and_int32_node_ids(spark, tmp_path):
    """The node schema follows the DATA (no hardcoded `node long`):
    string doc ids work end-to-end, and int32 batches against a store
    created from int32 hash into the right buckets across batches."""
    st = IncrementalClusterStore(spark, str(tmp_path / "cc_s"), n_buckets=4)
    p1 = spark.createDataFrame([("d1", "d2"), ("d2", "d3"), ("x", "y")],
                               "a string, b string")
    st.apply_batch(p1, batch_id=0)
    assert _labels(st) == {"d1": "d1", "d2": "d1", "d3": "d1", "x": "x", "y": "x"}
    # second batch + removal against the stored string schema
    p2 = spark.createDataFrame([("d3", "x")], "a string, b string")
    st.apply_batch(p2, spark.createDataFrame([("y",)], "node string"), batch_id=1)
    assert _labels(st) == {"d1": "d1", "d2": "d1", "d3": "d1", "x": "d1"}

    st32 = IncrementalClusterStore(spark, str(tmp_path / "cc_i"), n_buckets=4)
    pi = spark.createDataFrame([(1, 2), (2, 3)], "a int, b int")
    st32.apply_batch(pi, batch_id=0)
    # a later int32 batch must find the stored rows (bucket alignment)
    st32.apply_batch(spark.createDataFrame([(3, 4)], "a int, b int"), batch_id=1)
    assert _labels(st32) == {1: 1, 2: 1, 3: 1, 4: 1}


def test_same_batch_add_and_remove(spark, tmp_path):
    """Removals win over same-batch additions (a purged doc contributes
    no edges)."""
    st = IncrementalClusterStore(spark, str(tmp_path / "cc"), n_buckets=4)
    st.apply_batch(_pairs(spark, [(1, 2), (2, 3)]), _nodes(spark, [3]), batch_id=0)
    assert _labels(st) == {1: 1, 2: 1}


def test_replay_is_noop_and_heals_member_index(spark, tmp_path):
    from qin_cdc_spark.streaming.gsi import GlobalSecondaryIndex

    st = IncrementalClusterStore(spark, str(tmp_path / "cc"), n_buckets=4)
    st.apply_batch(_pairs(spark, E1), batch_id=0)
    before = _labels(st)
    st.apply_batch(_pairs(spark, E1), batch_id=0)  # whole-batch redelivery
    assert _labels(st) == before
    # crash window: the label store advances but the process dies before
    # the member-index refresh — simulate by suppressing the refresh
    orig = GlobalSecondaryIndex.refresh
    GlobalSecondaryIndex.refresh = lambda self, source: self.applied_version()
    try:
        st.apply_batch(_pairs(spark, E2), batch_id=1)
    finally:
        GlobalSecondaryIndex.refresh = orig
    assert st.members.applied_version() < st.labels.current_version()
    # redelivered batch: labels no-op on the guard, the index heals
    st.apply_batch(_pairs(spark, E2), batch_id=1)
    assert st.members.applied_version() == st.labels.current_version()
    assert {r.node for r in st.members.lookup([1]).collect()} == {1, 2, 3, 4, 10, 11}
    assert _labels(st) == _cc_py(E1 + E2)


def test_scope_is_bounded_to_touched_components(spark, tmp_path):
    """A batch touching one component must not read the others'
    adjacency buckets (the affected-component cost bound)."""
    st = IncrementalClusterStore(spark, str(tmp_path / "cc"), n_buckets=8)
    st.apply_batch(_pairs(spark, E1), batch_id=0)
    seen: list = []
    orig = IncrementalClusterStore._rows_of_nodes

    def spy(self, nodes, store):
        out = orig(self, nodes, store)
        if store is self.adj and out is not None:
            seen.extend(r.node for r in nodes.collect())
        return out

    IncrementalClusterStore._rows_of_nodes = spy
    try:
        st.apply_batch(_pairs(spark, [(30, 31)]), batch_id=1)
    finally:
        IncrementalClusterStore._rows_of_nodes = orig
    # the untouched components' nodes never entered an adjacency read
    assert set(seen) <= {30, 31}
    assert _labels(st) == _cc_py(E1 + [(30, 31)])


def test_many_touched_components_and_giant_merge(spark, tmp_path):
    """A batch touching MANY components at once (the old probe_limit
    overflow shape — the members probe is now always the distributed
    lookup_df, no driver-side cap exists) converges to the union-find
    oracle, as does the giant-component shape: the second batch merges
    everything into one component."""
    st = IncrementalClusterStore(spark, str(tmp_path / "cc"), n_buckets=4)
    # 5 separate 2-node components, all touched by the second batch
    e1 = [(i, i + 100) for i in range(1, 6)]
    st.apply_batch(_pairs(spark, e1), batch_id=0)
    # chain them all together: touches all 5 components at once
    e2 = [(i, i + 1) for i in range(1, 5)]
    st.apply_batch(_pairs(spark, e2), batch_id=1)
    assert _labels(st) == _cc_py(e1 + e2)
    assert set(_labels(st).values()) == {1}
    # removal inside the (now giant) component still converges
    st.apply_batch(None, _nodes(spark, [3]), batch_id=2)
    assert _labels(st) == _cc_py(e1 + e2, removed={3})


def test_neardup_store_feeds_cluster_store(spark, tmp_path):
    """End-to-end dedup story: the streaming near-dup store's verified
    pairs (within-batch AND batch-vs-store) maintain the live cluster
    assignment — rejected docs are members of their match's cluster
    even though only the representative's signature is stored — and a
    purge removes the doc from BOTH stores."""
    from qin_cdc_spark.streaming.neardup_store import NearDupStore

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    uniq1 = "one two three four five six seven eight nine ten"
    uniq2 = "red orange yellow green blue indigo violet black white gray"
    store = NearDupStore(spark, str(tmp_path / "nd"))
    cc = IncrementalClusterStore(spark, str(tmp_path / "cc"), n_buckets=4)
    store.admit_batch(
        docs([(1, dup), (2, dup), (3, dup), (4, uniq1)]), 0, clusters=cc
    )
    # within-batch: 2 and 3 rejected against 1; all three one cluster
    assert _labels(cc) == {1: 1, 2: 1, 3: 1}
    store.admit_batch(docs([(5, dup), (6, uniq2)]), 1, clusters=cc)
    # cross-batch: 5 matched the stored representative 1
    assert _labels(cc) == {1: 1, 2: 1, 3: 1, 5: 1}
    assert {r.doc_id for r in store.read().collect()} == {1, 4, 6}
    # purge composition: remove doc 1 from the signature store AND the
    # cluster graph — 2,3 re-solve to the new min label via their own
    # edge; 5's only recorded relation was to the purged representative,
    # so it drops to an implicit singleton
    store.purge([1])
    cc.apply_batch(None, _nodes(spark, [1]), batch_id=2)
    assert _labels(cc) == {2: 2, 3: 2}
    assert store.read().filter(F.col("doc_id") == 1).count() == 0


@pytest.mark.parametrize("seed", [5])
def test_random_rounds_match_union_find(spark, tmp_path, seed):
    import random

    rng = random.Random(seed)
    st = IncrementalClusterStore(spark, str(tmp_path / "cc"), n_buckets=4)
    edges: list = []
    removed: set = set()
    for rnd in range(4):
        batch_pairs = []
        for _ in range(8):
            a, b = rng.randrange(20), rng.randrange(20)
            if a != b and a not in removed and b not in removed:
                batch_pairs.append((a, b))
                edges.append((a, b))
        batch_rm = []
        if rnd >= 1:
            cand = {x for e in edges for x in e} - removed
            if cand:
                r = rng.choice(sorted(cand))
                batch_rm.append(r)
                removed.add(r)
        st.apply_batch(
            _pairs(spark, batch_pairs) if batch_pairs else None,
            _nodes(spark, batch_rm) if batch_rm else None,
            batch_id=rnd,
        )
        assert _labels(st) == _cc_py(edges, removed=removed), f"round {rnd}"


def test_members_probe_opens_only_affected_label_buckets(spark, tmp_path):
    """The members probe is BOUNDED by the affected components'
    storage, not the members index: the distributed scoping probe
    (GSI.lookup_df — the ONLY path since the probe_limit fold) must
    open ONLY the buckets the affected labels hash into — spied on
    read_buckets — while components the batch never touches stay
    unread.  Result still equals the union-find oracle."""
    st = IncrementalClusterStore(spark, str(tmp_path / "cc"), n_buckets=8)
    # 12 two-node components spread across the members index's buckets
    e1 = [(i, i + 1000) for i in range(1, 13)]
    st.apply_batch(_pairs(spark, e1), batch_id=0)

    # batch 1 touches components 1, 2, 3 only
    affected = [1, 2, 3]
    exp_df = spark.createDataFrame([(v,) for v in affected], "label long")
    expected = {
        str(r[0])
        for r in exp_df.select(
            st.members.store._bucket_expr(8).alias("_b")
        ).distinct().collect()
    }
    man = st.members.store._meta()["versions"][
        str(st.members.store.current_version())
    ]
    assert len(man["buckets"]) > len(expected)  # pruning has room to prune

    calls = []
    orig = st.members.store.read_buckets

    def spy(bucket_ids, *a, **kw):
        calls.append({str(b) for b in bucket_ids})
        return orig(bucket_ids, *a, **kw)

    st.members.store.read_buckets = spy
    try:
        st.apply_batch(_pairs(spark, [(1, 2), (2, 3)]), batch_id=1)
    finally:
        del st.members.store.read_buckets  # restore the bound method
    # the FIRST members read is the scoping probe: exactly the
    # affected labels' buckets, nothing else
    assert calls, "degrade path never probed the members index"
    assert calls[0] == expected
    assert _labels(st) == _cc_py(e1 + [(1, 2), (2, 3)])


def test_driver_solve_matches_distributed_loop(spark, tmp_path):
    """The bounded driver union-find (OPTIMIZATION_r11) must return
    exactly the distributed propagation loop's min-label assignment —
    on long ids and on string ids (UTF-8 byte order == code-point
    order, so the min agrees) — and the oversized path must still route
    to the loop."""
    import random

    rng = random.Random(11)
    edges = {(rng.randrange(30), rng.randrange(30)) for _ in range(40)}
    edges = [(a, b) for a, b in edges if a != b]
    st = IncrementalClusterStore(spark, str(tmp_path / "cc"), n_buckets=4)
    sym = spark.createDataFrame(
        [(a, b) for a, b in edges] + [(b, a) for a, b in edges],
        "node long, peer long",
    )
    nodes = sym.select("node").distinct()
    got = {(r.node, r.label) for r in st._solve_cc(nodes, sym).collect()}
    want = {
        (r.node, r.label)
        for r in st._solve_cc_distributed(nodes, sym).collect()
    }
    assert got == want

    s_sym = sym.select(
        F.concat(F.lit("d"), F.col("node").cast("string")).alias("node"),
        F.concat(F.lit("d"), F.col("peer").cast("string")).alias("peer"),
    )
    s_nodes = s_sym.select("node").distinct()
    got_s = {(r.node, r.label) for r in st._solve_cc(s_nodes, s_sym).collect()}
    want_s = {
        (r.node, r.label)
        for r in st._solve_cc_distributed(s_nodes, s_sym).collect()
    }
    assert got_s == want_s

    # oversized guard: shrink the bound and confirm the fallback path
    # still solves correctly
    st.DRIVER_CC_MAX_NODES = 3
    got_big = {(r.node, r.label) for r in st._solve_cc(nodes, sym).collect()}
    assert got_big == want
