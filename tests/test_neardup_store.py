"""NearDupStore: cross-batch near-duplicate admission semantics —
near-dup of an admitted historical doc is rejected, novel docs admit,
within-batch min-id-wins, and replay is a store no-op (idempotence)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from qin_cdc_spark.sources.tables import load_table
from qin_cdc_spark.streaming.neardup_store import (
    NearDupStore,
    start_streaming_neardup,
)
from tests.conftest import SF_SMOKE


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)
NEAR = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden nearby"
)
NOVEL = (
    "completely different subject matter entirely about database engines "
    "query optimizers shuffle partitions and adaptive execution planning"
)


def test_cross_batch_neardup_rejected(spark, tmp_path):
    store = NearDupStore(spark, str(tmp_path / "store"))
    store.admit_batch(_docs(spark, [(1, BASE)]), batch_id=0)
    store.admit_batch(_docs(spark, [(2, NEAR), (3, NOVEL)]), batch_id=1)
    got = {r.doc_id: r.first_seen_batch for r in store.read().collect()}
    assert got == {1: 0, 3: 1}  # 2 is a near-dup of stored 1 → rejected


def test_within_batch_min_id_wins(spark, tmp_path):
    store = NearDupStore(spark, str(tmp_path / "store"))
    store.admit_batch(_docs(spark, [(7, NOVEL), (5, BASE), (9, NEAR)]), batch_id=0)
    admitted = sorted(r.doc_id for r in store.read().collect())
    assert admitted == [5, 7]  # 9 near-matches lower-id 5 → rejected


def test_replay_is_noop(spark, tmp_path):
    store = NearDupStore(spark, str(tmp_path / "store"))
    batch = _docs(spark, [(1, BASE), (2, NOVEL)])
    store.admit_batch(batch, batch_id=0)
    before = sorted((r.doc_id, r.first_seen_batch) for r in store.read().collect())
    # at-least-once redelivery: same rows re-admitted under a new batch id
    store.admit_batch(batch, batch_id=0)
    store.admit_batch(batch, batch_id=1)
    after = sorted((r.doc_id, r.first_seen_batch) for r in store.read().collect())
    assert after == before  # every doc self-matches the store → no growth


def test_streaming_wiring_available_now(spark, tmp_path):
    """foreachBatch wiring: a 2-file documents stream lands in the store
    with near-dups (vs either batch) rejected."""
    src = str(tmp_path / "src")
    docs = load_table(spark, SF_SMOKE, "documents").limit(40).select("doc_id", "text")
    docs.repartition(2).write.parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    store = NearDupStore(spark, str(tmp_path / "store"))
    q = start_streaming_neardup(spark, stream, store, str(tmp_path / "ckpt"))
    q.awaitTermination(300)
    admitted = store.read()
    n_in = docs.count()
    n_admitted = admitted.count()
    assert 0 < n_admitted <= n_in
    # admitted set is pairwise non-near-dup: re-admitting it in one batch
    # under fresh ids keeps everything (nothing rejects against itself
    # within a batch because the store check is what would catch them)
    store2 = NearDupStore(spark, str(tmp_path / "store2"))
    readmit = admitted.join(docs, "doc_id").select("doc_id", "text")
    store2.admit_batch(readmit, batch_id=0)
    assert store2.read().count() == n_admitted


def _py_minhash(text: str, n_hashes: int = 64):
    """Independent pure-Python reimplementation of the engine's MinHash
    (md5-hash60 shingle hashes, deterministic LCG permutation family) —
    a cross-check that the Spark expression pipeline computes what the
    design says, not just what its own oracle mirrors."""
    import hashlib

    from qin_cdc_spark.functions.text import MERSENNE31, perm_params_sql

    ws = [w for w in text.strip().split() if w]
    k = 3
    n = max(1, len(ws) - (k - 1))
    shingles = list(dict.fromkeys(" ".join(ws[i : i + k]) for i in range(n)))
    hs = [
        int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % MERSENNE31
        for s in shingles
    ]
    return [min((a * h + b) % MERSENNE31 for h in hs) for a, b in perm_params_sql(n_hashes)]


def _py_admit(batches, threshold=0.5):
    """Brute-force reference of the store's admission policy."""
    store = []  # (doc_id, sig) admitted so far

    def agree(sa, sb):
        return sum(1 for x, y in zip(sa, sb) if x == y) / len(sa)

    out = {}
    for batch_no, batch in enumerate(batches):
        sigs = {d: _py_minhash(t) for d, t in batch}
        ids = sorted(sigs)
        rejected = set()
        for i, b in enumerate(ids):  # within batch: any lower-id match
            for a in ids[:i]:
                if agree(sigs[a], sigs[b]) >= threshold:
                    rejected.add(b)
                    break
        for d in ids:  # cross-batch: any admitted historical match
            if d in rejected:
                continue
            if any(agree(s, sigs[d]) >= threshold for _, s in store):
                rejected.add(d)
        for d in ids:
            if d not in rejected:
                store.append((d, sigs[d]))
                out[d] = batch_no
    return out


def test_store_admission_matches_pure_python_reference(spark, tmp_path):
    """NearDupStore over three micro-batches == the brute-force Python
    simulation (exact signature-level agreement, including the LSH
    banding not missing any pair the brute force finds at these sizes)."""
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    mut = base.split()
    variants = []
    for i in range(12):
        w = list(mut)
        for j in range(i):  # progressively more distant from base
            w[(3 * j + 1) % len(w)] = f"word{i}_{j}"
        variants.append(" ".join(w))
    other = (
        "one two three four five six seven eight nine ten eleven twelve "
        "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
    )
    batches = [
        [(1, base), (2, variants[1]), (10, other)],
        [(3, variants[2]), (11, other + " twentyone"), (12, variants[11])],
        [(4, base), (13, variants[3]), (14, "totally unrelated words that share nothing at all here")],
    ]
    want = _py_admit(batches)

    store = NearDupStore(spark, str(tmp_path / "store"))
    for bno, batch in enumerate(batches):
        store.admit_batch(_docs(spark, batch), batch_id=bno)
    got = {r.doc_id: r.first_seen_batch for r in store.read().collect()}
    assert got == want


# --------------------------------------------------------------------------
# Band-bucketed compaction
# --------------------------------------------------------------------------


def _mixed_batches():
    """Three batches with within-batch dups, cross-batch dups, and novel
    docs — enough structure that a wrong candidate path changes the
    admitted set."""
    b1 = [(1, BASE), (2, NOVEL), (9, NEAR)]
    b2 = [(3, NEAR), (4, NOVEL + " extended with some new tail words"), (5, BASE + " x")]
    b3 = [(6, "fresh unrelated content about spark adaptive query execution"), (7, BASE)]
    return [b1, b2, b3]


def test_compacted_admission_equals_uncompacted(spark, tmp_path):
    """Compacting between batches must not change what is admitted:
    the band index + tail path is an access-path change only."""
    flat = NearDupStore(spark, str(tmp_path / "flat"))
    comp = NearDupStore(spark, str(tmp_path / "comp"), n_buckets=8)
    batches = _mixed_batches()
    for bno, batch in enumerate(batches):
        flat.admit_batch(_docs(spark, batch), batch_id=bno)
        comp.admit_batch(_docs(spark, batch), batch_id=bno)
        comp.compact()  # compact after EVERY batch — worst case
    got_flat = sorted((r.doc_id, r.first_seen_batch) for r in flat.read().collect())
    got_comp = sorted((r.doc_id, r.first_seen_batch) for r in comp.read().collect())
    assert got_comp == got_flat


def test_compacted_tail_covers_post_watermark_appends(spark, tmp_path):
    """Appends AFTER the last compact must still reject near-dups (the
    row-local tail path), and a replayed pre-watermark batch stays a
    no-op (idempotence through the index path)."""
    store = NearDupStore(spark, str(tmp_path / "store"), n_buckets=8)
    store.admit_batch(_docs(spark, [(1, BASE)]), batch_id=0)
    store.compact()  # watermark = 0
    store.admit_batch(_docs(spark, [(2, NOVEL)]), batch_id=1)  # tail, not indexed
    # near-dup of the TAIL doc must be rejected via the tail path
    store.admit_batch(
        _docs(spark, [(3, NOVEL + " minor suffix"), (4, NEAR)]), batch_id=2
    )
    got = {r.doc_id: r.first_seen_batch for r in store.read().collect()}
    assert got == {1: 0, 2: 1}  # 3 near-matches tail doc 2; 4 near-matches indexed 1
    # replay of batch 0: doc 1 self-matches through the band index → no growth
    store.admit_batch(_docs(spark, [(1, BASE)]), batch_id=3)
    assert {r.doc_id: r.first_seen_batch for r in store.read().collect()} == got


def test_compacted_candidate_scan_prunes_buckets(spark, tmp_path):
    """The candidate join against the compacted index must carry a
    partition filter on bucket — the physical guarantee that history
    reads touch only the batch's buckets at scale."""
    from qin_cdc_spark.streaming.neardup_store import _signatures

    store = NearDupStore(spark, str(tmp_path / "store"), n_buckets=8)
    store.admit_batch(
        _docs(spark, [(i, f"{BASE} variant {i} tail {i}") for i in range(1, 9)]),
        batch_id=0,
    )
    store.compact()
    sigs = _signatures(_docs(spark, [(100, NEAR)])).persist()
    try:
        cand = store._store_candidates(sigs)
        plan = cand._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [bucket" in plan.replace("#", " #").replace(
            "bucket #", "bucket#"
        ) or "bucket" in plan.split("PartitionFilters")[1].split("]")[0], plan
    finally:
        sigs.unpersist()
    # and the store's own data read never lists the _bands tree
    assert store.read().count() > 0


def test_streaming_decontamination_composition(spark, tmp_path):
    """Streaming decontamination falls out of the store's admission
    contract: preload the BENCHMARK docs as batch 0, stream the train
    corpus through admit_batch — train docs near-dup to any benchmark
    doc are rejected (contaminated), novel train docs land.  The batch
    analog is decontaminate_neardup (operators/similarity.py); this is
    the same discipline running incrementally, O(batch) per batch, and
    the benchmark's signatures are stored ONCE, not rebroadcast per
    batch."""
    other = (
        "grain silos and harvest schedules across the northern plains "
        "with crop rotation irrigation canals and seasonal labor markets"
    )
    store = NearDupStore(spark, str(tmp_path / "store"))
    # benchmark set: ids < 100
    store.admit_batch(_docs(spark, [(1, BASE), (2, NOVEL)]), batch_id=0)
    bench_ids = {r.doc_id for r in store.read().collect()}
    assert bench_ids == {1, 2}
    # train stream, two batches
    store.admit_batch(_docs(spark, [(101, NEAR), (102, other)]), batch_id=1)
    store.admit_batch(_docs(spark, [(103, NOVEL + " extra tail words")]),
                      batch_id=2)
    kept = {r.doc_id for r in store.read().collect()} - bench_ids
    # 101 near-dups benchmark 1 → contaminated; 102 is novel; 103
    # near-dups benchmark 2 → contaminated
    assert kept == {102}
