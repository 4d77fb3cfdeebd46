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
