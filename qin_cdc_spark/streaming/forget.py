"""Right-to-be-forgotten purge cascade over the versioned CDC target
and its maintained consumers.

An LLM-data pipeline must be able to remove documents after the fact —
PII findings, licensing takedowns, poisoning incidents — and every
derived artifact (aggregate MVs, join MVs, ANN indexes, near-dup
indexes) has to follow, or the purged content keeps influencing
training runs through the side tables.  The engine already maintains
each consumer incrementally from the table's change data feed; purging
is therefore just a correctly-shaped delete batch plus the normal
refresh cycle — no consumer-specific erase code.

Two properties matter beyond ordinary deletes:

* **Value-free tombstones.**  A normal CDC delete carries the row
  image; the LWW tombstone would then keep storing the purged VALUES
  in the current snapshot until tombstone GC.  ``purge_keys`` emits
  tombstones whose value columns are typed NULLs — after the merge,
  the current version physically stores only the keys.  (Typed, not
  bare ``lit(None)``: the merge aligns the STORED side to the incoming
  batch's types, so an untyped null column would void the table.)
* **History erasure is retention policy.**  Older snapshots still
  reference the pre-purge data dirs by design (that is what time
  travel is).  Full physical erasure = purge + ``gc(keep_last=1)``,
  after which the publish GC deletes every data dir only pre-purge
  manifests referenced.  ``purge_keys`` leaves that to the caller (a
  compliance job decides retention, not the engine) but returns the
  minted version so the caller can pin/GC around it.

Scale: the doomed-row probe is one semi-join of the key list (tiny,
broadcastable) against the current snapshot — O(|keys| + touched
buckets) for the merge, and each consumer refresh is its own
incremental O(delta) path.  Nothing rescans the corpus.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from qin_cdc_spark.streaming.versioned import VersionedBucketedTable


def purge_keys(
    table: VersionedBucketedTable,
    keys_df: DataFrame,
    *,
    seq: int,
    batch_id: int | None = None,
) -> int:
    """Mint a new snapshot with every row matching ``keys_df`` deleted
    via value-free tombstones; returns the new version (or the current
    one if nothing matched).  ``seq`` must exceed every STORED seq of
    the purged keys — live rows and existing tombstones alike (use the
    stream's high-water mark) — or LWW will ignore the replacement;
    replay-idempotent the same way any merge is.

    The probe deliberately does NOT filter to live rows: a key deleted
    through ordinary CDC still stores its row image inside the
    value-carrying tombstone, so the purge must re-tombstone dead keys
    too — otherwise the purged values persist in the current snapshot
    for exactly the soft-deleted-then-purged case the cascade exists
    for."""
    cur = table.read_internal()
    if cur is None:
        return table.current_version()
    doomed = (
        cur.join(keys_df.select(*table.keys), table.keys, "left_semi")
        .select(*table.keys)
    )
    value_fields = [
        f
        for f in cur.schema.fields
        if f.name not in {*table.keys, "_seq", "_deleted"}
    ]
    events = doomed.select(
        F.lit("delete").alias("op"),
        F.lit(seq).cast("long").alias("seq"),
        *table.keys,
        # typed NULLs: the snapshot keeps only the key after the merge
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in value_fields],
    )
    return table.merge(events, batch_id=batch_id)


def purge_where(
    table: VersionedBucketedTable,
    predicate,
    *,
    seq: int,
    batch_id: int | None = None,
) -> int:
    """Predicate takedown: purge every row the boolean ``predicate``
    Column matches — real takedowns name content ("every document from
    domain X", "license tag Y"), not key lists.  Resolves the doomed
    keys with ONE pass over the current snapshot (Bloom/zone skipping
    applies when the predicate allows), then delegates to
    ``purge_keys`` for the value-free-tombstone merge and the normal
    consumer cascade.

    The predicate evaluates against the CURRENT snapshot only — a key
    whose matching row was already soft-deleted has no live row to
    match, so content-based takedowns compose with `purge_keys` for
    key lists collected out-of-band (e.g. from an earlier version via
    ``read_at``)."""
    cur = table.read()
    if cur is None:
        return table.current_version()
    doomed = cur.filter(predicate).select(*table.keys)
    return purge_keys(table, doomed, seq=seq, batch_id=batch_id)
