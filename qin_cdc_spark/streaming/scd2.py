"""SCD Type-2 history table + temporal (point-in-time) join.

The reference streams row images to a warehouse and keeps only the
CURRENT state per key (LWW upsert, outputs/starrocks/starrocks.go:
136-208); history and as-of queries are left to the downstream
warehouse.  This module closes that loop engine-side, the same way the
derived-MV family does for aggregates:

* ``ScdType2Table`` maintains the full slowly-changing-dimension
  history — one row per VERSION of each key, carrying its validity
  interval ``[valid_from, valid_to)`` in stream-seq coordinates
  (``valid_to`` NULL = the open, current version; a delete closes the
  open interval without opening a new one).  Maintenance is
  incremental per change batch: the batch is window-sorted per key
  (delta-sized shuffle), stored OPEN rows of exactly the changed keys
  are read via bucket-pruned ``read_buckets``, and one LWW merge
  rewrites only the touched buckets — O(|batch| + touched buckets),
  never a history rescan.
* ``temporal_join`` enriches fact rows with the dimension version that
  was current AT THE FACT'S OWN as-of coordinate — the Flink temporal
  table join / feature-store point-in-time-correctness pattern.  It is
  an EQUI-join on the key with the interval predicate as a residual
  condition (never a range/cross join): history holds a handful of
  versions per key, so the join is ~O(|facts|) and rides the key's
  hash partitioning at any scale.

State layout: a ``VersionedBucketedTable`` keyed ``(key…, valid_from)``
but BUCKETED by the key columns alone (``bucket_cols=keys``) — every
version of a key lands in one bucket, so closing its open interval is
a one-bucket read and serving "history of key K" is ``read_key``-grade.

Ordering contract: per-key event seqs must be monotone ACROSS batches
(the binlog order the whole engine assumes).  At-least-once redelivery
is absorbed exactly: each key's stored high-water mark
``max(coalesce(valid_to, valid_from))`` drops already-folded events, so
replaying any suffix of the stream is a no-op; with ``batch_id`` the
store's replay guard additionally short-circuits whole redelivered
batches, and state+progress commit in one manifest flip (crash between
the target merge and the history merge replays into two independent
guards and converges).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from qin_cdc_spark.streaming.versioned import VersionedBucketedTable


def scd2_intervals(
    changes: DataFrame,
    keys: list[str],
    *,
    op_col: str = "op",
    seq_col: str = "seq",
) -> DataFrame:
    """One-shot derivation of SCD2 validity intervals from a COMPLETE
    change stream (op, seq, key…, values…): each non-delete event opens
    the version ``[seq, next event's seq)``; the key's last event leaves
    ``valid_to`` NULL unless it is a delete.  One window pass; the
    incremental equivalent is ``ScdType2Table``."""
    value_cols = [c for c in changes.columns if c not in {op_col, seq_col, *keys}]
    w = Window.partitionBy(*keys).orderBy(seq_col)
    return (
        changes.withColumn("_vt", F.lead(seq_col).over(w))
        .filter(F.col(op_col) != "delete")
        .select(
            *keys,
            F.col(seq_col).cast("long").alias("valid_from"),
            F.col("_vt").cast("long").alias("valid_to"),
            *value_cols,
        )
    )


def temporal_join(
    facts: DataFrame,
    history: DataFrame,
    keys: list[str],
    asof_col: str,
    *,
    how: str = "left",
) -> DataFrame:
    """Point-in-time enrichment: join each fact row to the history
    version whose ``[valid_from, valid_to)`` interval contains the
    fact's ``asof_col`` value.  At most one interval per key contains
    any point (intervals partition the key's timeline), so the join
    never fans out.  Plan shape: hash equi-join on ``keys`` with the
    interval predicate as a residual filter — NOT a range join; at
    100 TB this is one co-partitioned pass over the facts with the
    (small-per-key) history on the other side."""
    h = history
    cond = None
    for k in keys:
        c = facts[k] == h[k]
        cond = c if cond is None else (cond & c)
    cond = (
        cond
        & (h["valid_from"] <= facts[asof_col])
        & (h["valid_to"].isNull() | (facts[asof_col] < h["valid_to"]))
    )
    out = facts.join(h, cond, how)
    # drop the history side's duplicate key columns by reference
    for k in keys:
        out = out.drop(h[k])
    return out


def temporal_join_salted(
    facts: DataFrame,
    history: DataFrame,
    keys: list[str],
    asof_col: str,
    *,
    how: str = "left",
    salt: int = 8,
) -> DataFrame:
    """Hot-business-key variant of :func:`temporal_join` — the
    ``join_salted_twophase`` discipline applied to history enrichment
    (VERDICT r7 #7).  The CDC skew case: one business key is 10% of
    the facts.  When history is BROADCASTable the skew is immaterial
    (no fact shuffle at all — the default ``temporal_join`` plan); when
    history is too big to broadcast, the sort-merge shuffle hashes on
    the key and the hot key lands in ONE task.  Here the fact side
    gains a uniform salt (xxhash64 of the whole row — deterministic,
    no RNG) and history explodes ``salt``× so every (key, salt_i)
    partition holds the key's small version set; the join keys become
    (key…, _salt), spreading the hot key over ``salt`` tasks.  Cost:
    history bytes ×salt in the shuffle — pay it only on the skewed
    serving path (or let AQE's skew-join split handle moderate skew;
    this is the manual fallback when AQE's floor still leaves one hot
    key in one task, same contract as ``salted_join``)."""
    fs = facts.withColumn(
        "_salt",
        (F.abs(F.xxhash64(*[F.col(c) for c in facts.columns])) % salt).cast("int"),
    )
    hs = history.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i).cast("int") for i in range(salt)]))
    )
    return temporal_join(fs, hs, [*keys, "_salt"], asof_col, how=how).drop("_salt")


class ScdType2Table:
    """Incrementally-maintained SCD Type-2 dimension history."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        *,
        keys: list[str],
        n_buckets: int = 32,
    ):
        self.spark = spark
        self.path = path
        self.keys = list(keys)
        self.store = VersionedBucketedTable(
            spark,
            path,
            [*self.keys, "valid_from"],
            n_buckets=n_buckets,
            bucket_cols=self.keys,
        )

    def rename_columns(
        self,
        mapping: dict[str, str],
        *,
        missing_ok: bool = False,
        stmt_id=None,
    ) -> int:
        """Upstream RENAME COLUMN applied to the history store —
        historical versions keep their values under the new name (the
        same value-preserving contract as the target tables; the route
        applies both sides from one DDL row).  The interval columns are
        engine bookkeeping, never upstream columns — renaming them is
        refused.  Business-key renames follow through ``keys`` and the
        store's bucket placement (value-hashed: no row moves)."""
        if "valid_from" in mapping or "valid_to" in mapping:
            raise ValueError(
                "rename_columns: valid_from/valid_to are engine interval "
                "columns, not renameable upstream columns"
            )
        v = self.store.rename_columns(
            mapping, missing_ok=missing_ok, stmt_id=stmt_id
        )
        self.keys = [mapping.get(k, k) for k in self.keys]
        return v

    # -- reads ---------------------------------------------------------------

    def read_history(self, *, include_markers: bool = False) -> DataFrame | None:
        """All VERSIONS: (key…, valid_from, valid_to, is_current,
        values…).  Zero-width ``[d, d)`` rows are no-op-delete MARKERS
        (null values, never current), not versions — ``apply_batch``
        records them only to pin a delete coordinate for redelivery
        drop and late-insert closure; they are invisible to every
        point-in-time read and EXCLUDED here by default so external
        consumers never meet surprise null-value rows (a
        delete-first/double-delete stream produces them).  Pass
        ``include_markers=True`` for hwm forensics."""
        st = self.store.read()
        if st is None:
            return None
        if not include_markers:
            st = st.filter(
                F.col("valid_to").isNull()
                | (F.col("valid_to") != F.col("valid_from"))
            )
        return st.withColumn("is_current", F.col("valid_to").isNull())

    def current(self) -> DataFrame | None:
        """The open versions — equals the plain LWW target's live rows
        (minus rows whose last event was a delete)."""
        st = self.store.read()
        if st is None:
            return None
        return st.filter(F.col("valid_to").isNull()).drop("valid_to")

    def history_floor(self) -> int:
        """Retention floor set by ``expire_history`` (0 = full
        history).  Persisted as a store prop, so it rides the same
        manifest flip as the data and survives clone/backup."""
        return int(self.store.get_prop("history_floor", 0))

    def _check_floor(self, seq, what: str) -> None:
        fl = self.history_floor()
        if fl and seq is not None and seq < fl:
            raise ValueError(
                f"{what}({seq}) below the history retention floor {fl}: "
                "versions closing before the floor were expired "
                "(the read_at-on-gc-expired discipline — partial answers "
                "are worse than a loud one)"
            )

    def as_of(self, seq: int) -> DataFrame | None:
        """Point-in-time snapshot: the version of each key that was
        current at stream coordinate ``seq`` — pure interval filter
        over the history, no time-travel manifest needed (and unlike
        ``VersionedBucketedTable.read_at`` it resolves ARBITRARY seqs,
        not just batch boundaries)."""
        self._check_floor(seq, "as_of")
        st = self.store.read()
        if st is None:
            return None
        return st.filter(
            (F.col("valid_from") <= F.lit(seq))
            & (F.col("valid_to").isNull() | (F.lit(seq) < F.col("valid_to")))
        ).drop("valid_to")

    def history_of(
        self, key_values: list, *, include_markers: bool = False
    ) -> DataFrame | None:
        """All VERSIONS of one key — a one-bucket read (placement hashes
        the key columns alone, so the store's manifest names the single
        bucket every version of this key lives in).  Zero-width
        no-op-delete marker rows are excluded by default
        (``read_history``'s contract); ``include_markers=True``
        surfaces them."""
        st = self.store.read_buckets(self._buckets_of_values([key_values]))
        if st is None:
            return None
        cond = None
        for k, v in zip(self.keys, key_values):
            c = F.col(k) == F.lit(v)
            cond = c if cond is None else (cond & c)
        if not include_markers:
            cond = cond & (
                F.col("valid_to").isNull()
                | (F.col("valid_to") != F.col("valid_from"))
            )
        return st.filter(cond).withColumn("is_current", F.col("valid_to").isNull())

    def read_key_asof(self, key_values: list, seq: int) -> DataFrame | None:
        """Point-in-time POINT lookup: the version of ONE key current
        at stream coordinate ``seq`` — a one-bucket read
        (``history_of``) + interval filter, so the cost is the key's
        own bucket, never the table.  This is the hot-path serving
        shape (``as_of`` scans the store by design — it answers for
        EVERY key); even a very hot key (thousands of versions) costs
        exactly its bucket's rows: versions co-locate by construction
        (``bucket_cols=keys``)."""
        self._check_floor(seq, "read_key_asof")
        h = self.history_of(key_values)
        if h is None:
            return None
        return h.filter(
            (F.col("valid_from") <= F.lit(seq))
            & (F.col("valid_to").isNull() | (F.lit(seq) < F.col("valid_to")))
        ).drop("is_current", "valid_to")

    def applied_batch(self) -> int:
        return self.store.last_batch_id()

    def _buckets_of_facts(self, facts: DataFrame) -> list[str]:
        """Distinct history buckets the fact rows' keys hash into —
        driver-side manifest math over the store's OWN typed bucket
        expression (fact key columns are cast to the stored key types
        first).  The collect is bounded by n_buckets: the distinct runs
        on the bucket id, never the keys."""
        man = self.store._meta()["versions"].get(
            str(self.store.current_version()), {"buckets": {}}
        )
        nb = self.store._manifest_n_buckets(man)
        st = self.store.read_internal()
        if st is None:
            return []
        typed = {f.name: f.dataType for f in st.limit(0).select(*self.keys).schema.fields}
        kf = facts.select(
            *[F.col(k).cast(typed[k]).alias(k) for k in self.keys]
        )
        return [
            str(r[0])
            for r in kf.select(self.store._bucket_expr(nb).alias("_b"))
            .distinct()
            .collect()
        ]

    def temporal_join(
        self, facts: DataFrame, asof_col: str, *, how: str = "left"
    ) -> DataFrame:
        """Serving-side point-in-time enrichment pruned to the FACT
        KEYS' history buckets: a point-lookup-shaped fact batch (the
        feature-store inference case) opens only the buckets its keys
        hash into (the ``history_of`` discipline applied to a batch);
        a fact batch touching every bucket degrades gracefully to the
        full history read.  The join itself is the module-level
        ``temporal_join`` — equi-join on the keys with the interval
        predicate residual, never a range join."""
        if self.history_floor():
            # one bounded agg over the FACTS (only when a floor exists):
            # a fact below the floor would silently enrich with nulls
            # where the true version was expired
            lo = facts.agg(F.min(asof_col)).first()[0]
            self._check_floor(lo, "temporal_join(min asof)")
        hist = self.store.read_buckets(self._buckets_of_facts(facts))
        if hist is None:
            # A None read collapses two cases: (a) the store was never
            # written — no typed history schema exists, so the join
            # result schema is undefinable and raising is honest; (b)
            # the store is NON-empty but every fact key hashes to a
            # bucket absent from the manifest (a small batch of unseen
            # keys).  For (b) the correct result — for any how — is the
            # join against an EMPTY typed history frame (left: facts
            # with null enrichment; inner: empty), not an exception.
            st = self.store.read()
            if st is None:
                raise ValueError("temporal_join: history is empty")
            hist = st.limit(0)
        return temporal_join(facts, hist, self.keys, asof_col, how=how)

    # -- maintenance -----------------------------------------------------------

    def _buckets_of_values(self, rows: list[list]) -> list[str]:
        man = self.store._meta()["versions"].get(
            str(self.store.current_version()), {"buckets": {}}
        )
        nb = self.store._manifest_n_buckets(man)
        typed = None
        st = self.store.read_internal()
        if st is not None:
            typed = st.limit(0).select(*self.keys).schema
        if typed is None:
            return []
        df = self.spark.createDataFrame([tuple(r) for r in rows], typed)
        return [
            str(r[0])
            for r in df.select(self.store._bucket_expr(nb).alias("_b"))
            .distinct()
            .collect()
        ]

    def apply_batch(
        self,
        changes: DataFrame,
        *,
        op_col: str = "op",
        seq_col: str = "seq",
        batch_id: int | None = None,
    ) -> int:
        """Fold one change batch (op, seq, key…, values…) into the
        history; returns the store's new version.  Cost: one window
        over the BATCH (delta-sized), one bucket-pruned read of the
        changed keys' stored rows, one touched-bucket LWW merge.

        Per-key semantics (seq strictly increasing per key):

        * every non-delete event opens version ``[seq, ·)``,
        * the NEXT event for the key (any op) closes it at its seq,
        * the stored open interval (from an earlier batch) is closed by
          the batch's first surviving event for that key,
        * events at-or-below the key's stored high-water mark
          ``max(coalesce(valid_to, valid_from))`` are redeliveries and
          are dropped (replay idempotence),
        * a delete that closes NOTHING (no stored open interval and no
          preceding live event in the batch, or preceded by another
          delete) records a ZERO-WIDTH tombstone row ``[d, d)`` —
          invisible to ``as_of``/``current``/``temporal_join`` by the
          half-open interval predicate, but it pins the key's
          high-water mark at ``d`` so (a) redelivered deletes are
          dropped and (b) a LATE insert before ``d`` routed through
          ``insert_versions`` closes at ``d`` instead of resurrecting
          the deleted key as an open version."""
        if batch_id is not None and batch_id <= self.store.last_batch_id():
            return self.store.current_version()
        value_cols = [
            c for c in changes.columns if c not in {op_col, seq_col, *self.keys}
        ]
        ev = changes.select(
            F.col(op_col).alias("_op"),
            F.col(seq_col).cast("long").alias("_seq_ev"),
            *self.keys,
            *value_cols,
        )
        fl = self.history_floor()
        if fl:
            # events strictly below the floor are ancient redeliveries
            # by the expire_history contract (the floor sits at-or-below
            # the source's redelivery low-water mark); dropping them
            # here replaces the per-key hwm the expired rows no longer
            # provide
            ev = ev.filter(F.col("_seq_ev") >= F.lit(fl))
        ev = ev.persist()
        try:
            # stored rows of the batch's keys: manifest-level pruning to
            # the buckets the batch's keys hash into (the batch already
            # computes this set for the merge — reuse the expression)
            man = self.store._meta()["versions"].get(
                str(self.store.current_version()), {"buckets": {}}
            )
            nb = self.store._manifest_n_buckets(man)
            touched = [
                str(r[0])
                for r in ev.select(self.store._bucket_expr(nb).alias("_b"))
                .distinct()
                .collect()
            ]
            old = self.store.read_buckets(touched) if touched else None
            if old is not None:
                old_k = old.join(
                    ev.select(*self.keys).distinct(), self.keys, "left_semi"
                )
                hw = old_k.groupBy(*self.keys).agg(
                    F.max(F.coalesce("valid_to", "valid_from")).alias("_hw")
                )
                live = ev.join(hw, self.keys, "left").filter(
                    F.col("_hw").isNull() | (F.col("_seq_ev") > F.col("_hw"))
                ).drop("_hw")
            else:
                old_k, live = None, ev

            w = Window.partitionBy(*self.keys).orderBy("_seq_ev")
            seqd = live.withColumn("_vt", F.lead("_seq_ev").over(w)).withColumn(
                "_prev_op", F.lag("_op").over(w)
            )
            new_rows = seqd.filter(F.col("_op") != "delete").select(
                *self.keys,
                F.col("_seq_ev").alias("valid_from"),
                F.col("_vt").cast("long").alias("valid_to"),
                *value_cols,
            )
            # no-op deletes: a delete preceded in-batch by another
            # delete closes nothing; a batch-FIRST delete closes
            # nothing iff its key has no stored open interval.  Record
            # each as a zero-width tombstone [d, d) (null values) so
            # the delete coordinate survives for hwm and late-insert
            # closure (see docstring).
            typed = {f.name: f.dataType for f in ev.schema.fields}
            noop = seqd.filter(
                (F.col("_op") == "delete") & (F.col("_prev_op") == F.lit("delete"))
            )
            first_del = seqd.filter(
                (F.col("_op") == "delete") & F.col("_prev_op").isNull()
            )
            if old_k is not None:
                open_keys = (
                    old_k.filter(F.col("valid_to").isNull())
                    .select(*self.keys)
                    .distinct()
                )
                first_del = first_del.join(open_keys, self.keys, "left_anti")
            noop = noop.unionByName(first_del)
            tombstones = noop.select(
                *self.keys,
                F.col("_seq_ev").alias("valid_from"),
                F.col("_seq_ev").cast("long").alias("valid_to"),
                *[F.lit(None).cast(typed[c]).alias(c) for c in value_cols],
            )
            merge_rows = new_rows.unionByName(tombstones)
            if old_k is not None:
                s0 = seqd.groupBy(*self.keys).agg(F.min("_seq_ev").alias("_s0"))
                closed = (
                    old_k.filter(F.col("valid_to").isNull())
                    .drop("valid_to")
                    .join(s0, self.keys, "inner")
                    .select(
                        *self.keys,
                        "valid_from",
                        F.col("_s0").cast("long").alias("valid_to"),
                        *value_cols,
                    )
                )
                merge_rows = merge_rows.unionByName(closed)
            # LWW seq: a row's latest fact is its close coordinate —
            # coalesce(valid_to, valid_from) is monotone per identity
            # (open first, closed later), so redelivered opens never
            # overwrite a stored close
            events = merge_rows.select(
                F.lit("upsert").alias("op"),
                F.coalesce("valid_to", "valid_from").alias("seq"),
                *self.keys,
                "valid_from",
                *value_cols,
                "valid_to",
            )
            # bootstrap-shaped batch (no stored rows for these keys):
            # every ev key lands in events (first event per key is a
            # new row or a zero-width tombstone), so the probed bucket
            # set transfers exactly and the store merge skips its own
            # probe job + persist (OPTIMIZATION_r10).  With stored rows
            # the hwm filter may drop whole keys (redeliveries) — a
            # fully-dropped batch must keep minting NO version, so the
            # store re-probes the events frame itself.
            return self.store.merge(
                events,
                batch_id=batch_id,
                touched=touched if old_k is None else None,
            )
        finally:
            ev.unpersist()

    def insert_versions(
        self,
        changes: DataFrame,
        *,
        op_col: str = "op",
        seq_col: str = "seq",
    ) -> int:
        """Retroactively fold LATE events — events at-or-below their
        key's stored high-water mark — into the history at their true
        stream coordinates.  ``apply_batch`` must drop such events (it
        cannot tell a late first delivery from an at-least-once
        redelivery), which leaves DLQ-replayed versions permanently
        missing whenever newer events for the key landed before the
        replay.  THIS path can tell them apart: an event whose seq
        matches NO stored version boundary was never folded, so it is
        genuinely late, not redelivered.

        Semantics per late event at seq ``s``: the stored interval
        containing ``s`` (if any) closes at ``s``; a non-delete opens
        ``[s, next-event-seq)`` with the late values.  Implemented as a
        per-key event-list recompute: stored rows reconstruct the
        original events (each row is an upsert at ``valid_from``; a
        close with no successor row at that coordinate was a delete; a
        zero-width row was a no-op-delete tombstone and reconstructs as
        the delete alone — so late inserts before a delete that closed
        NOTHING at stream time still close at the delete's coordinate),
        the late events union in, one delta-sized window re-derives the
        intervals, and ONLY rows whose interval changed (plus brand-new
        rows) merge back — stamped with an LWW seq strictly above every
        stored ``_seq`` of the touched keys (the ``purge_keys``
        discipline, forget.py), because a shortened close must beat the
        stored row it replaces.  The open (current) interval is never
        touched: late events sit below the hwm by definition.

        Idempotent: a replayed insert finds every late seq already a
        stored boundary and merges nothing.  Cost: O(|batch| + touched
        buckets) — same class as ``apply_batch``.  Returns the store's
        new version (the current one when nothing changed)."""
        value_cols = [
            c for c in changes.columns if c not in {op_col, seq_col, *self.keys}
        ]
        ev = changes.select(
            F.col(op_col).alias("_op"),
            F.col(seq_col).cast("long").alias("_seq_ev"),
            *self.keys,
            *value_cols,
        )
        fl = self.history_floor()
        if fl and ev.filter(F.col("_seq_ev") < F.lit(fl)).limit(1).count():
            raise ValueError(
                f"insert_versions: events below the history retention "
                f"floor {fl} are not placeable — the intervals that "
                "would close them were expired"
            )
        touched = self._buckets_of_facts(ev)
        raw = self.store.read_buckets(touched, internal=True) if touched else None
        if raw is None:
            return self.store.current_version()
        stored = (
            raw.filter(~F.col("_deleted"))
            .join(ev.select(*self.keys).distinct(), self.keys, "left_semi")
            .persist()
        )
        late = None
        try:
            hw = stored.groupBy(*self.keys).agg(
                F.max(F.coalesce("valid_to", "valid_from")).alias("_hw")
            )
            # existing event coordinates: every interval start, plus
            # every close that was a delete (a close that IS another
            # row's start dedups against that start anyway)
            existing = (
                stored.select(*self.keys, F.col("valid_from").alias("_seq_ev"))
                .unionByName(
                    stored.filter(F.col("valid_to").isNotNull()).select(
                        *self.keys, F.col("valid_to").alias("_seq_ev")
                    )
                )
                .distinct()
            )
            late = (
                ev.join(hw, self.keys, "inner")
                .filter(F.col("_seq_ev") <= F.col("_hw"))
                .drop("_hw")
                .join(existing, [*self.keys, "_seq_ev"], "left_anti")
                .dropDuplicates([*self.keys, "_seq_ev"])
                .persist()
            )
            if not late.limit(1).count():
                return self.store.current_version()
            rows = stored.join(
                late.select(*self.keys).distinct(), self.keys, "left_semi"
            )
            typed = {f.name: f.dataType for f in rows.schema.fields}
            # a zero-width row [d, d) is a no-op-delete tombstone
            # (apply_batch): it reconstructs as a DELETE event at d,
            # never as an upsert
            zero = F.col("valid_to").isNotNull() & (
                F.col("valid_to") == F.col("valid_from")
            )
            ups = rows.filter(~zero).select(
                F.lit("upsert").alias("_op"),
                F.col("valid_from").alias("_seq_ev"),
                *self.keys,
                *value_cols,
            )
            dels = (
                rows.filter(F.col("valid_to").isNotNull())
                .join(
                    rows.filter(~zero).select(
                        *self.keys, F.col("valid_from").alias("valid_to")
                    ),
                    [*self.keys, "valid_to"],
                    "left_anti",
                )
                .select(
                    F.lit("delete").alias("_op"),
                    F.col("valid_to").alias("_seq_ev"),
                    *self.keys,
                    *[F.lit(None).cast(typed[c]).alias(c) for c in value_cols],
                )
            )
            # a stored tombstone and a stored close can share a
            # coordinate (both deletes at d) — one event per (key, seq)
            all_ev = (
                ups.unionByName(dels)
                .unionByName(late)
                .dropDuplicates([*self.keys, "_seq_ev"])
            )
            w = Window.partitionBy(*self.keys).orderBy("_seq_ev")
            rec = all_ev.withColumn("_vt", F.lead("_seq_ev").over(w)).withColumn(
                "_prev_op", F.lag("_op").over(w)
            )
            recomputed = (
                rec.filter(F.col("_op") != "delete")
                .select(
                    *self.keys,
                    F.col("_seq_ev").alias("valid_from"),
                    F.col("_vt").cast("long").alias("valid_to"),
                    *value_cols,
                )
                .unionByName(
                    # re-derive no-op-delete tombstones the same way
                    # apply_batch records them, so an unchanged stored
                    # tombstone compares equal (not re-merged) and a
                    # late no-op delete gains one
                    rec.filter(
                        (F.col("_op") == "delete")
                        & (
                            F.col("_prev_op").isNull()
                            | (F.col("_prev_op") == F.lit("delete"))
                        )
                    ).select(
                        *self.keys,
                        F.col("_seq_ev").alias("valid_from"),
                        F.col("_seq_ev").cast("long").alias("valid_to"),
                        *[F.lit(None).cast(typed[c]).alias(c) for c in value_cols],
                    )
                )
            )
            prior = rows.select(
                *self.keys,
                "valid_from",
                F.col("valid_to").alias("_old_vt"),
                F.lit(True).alias("_stored"),
            )
            changed = (
                recomputed.join(prior, [*self.keys, "valid_from"], "left")
                .filter(
                    F.col("_stored").isNull()
                    | ~F.col("valid_to").eqNullSafe(F.col("_old_vt"))
                )
                .drop("_old_vt", "_stored")
            )
            # bounded driver scalar: one max over the touched buckets
            smax = (
                raw.join(late.select(*self.keys).distinct(), self.keys, "left_semi")
                .agg(F.max("_seq"))
                .first()[0]
                or 0
            )
            events = changed.select(
                F.lit("upsert").alias("op"),
                F.lit(int(smax) + 1).cast("long").alias("seq"),
                *self.keys,
                "valid_from",
                *value_cols,
                "valid_to",
            )
            return self.store.merge(events)
        finally:
            stored.unpersist()
            if late is not None:
                late.unpersist()

    def history_stats_mv(self, path: str, *, n_buckets: int = 32):
        """Bind a :class:`ScdHistoryStatsMV` over this history — the
        first DERIVED CONSUMER of SCD2 history (VERDICT r7 #4): the
        retention floor stops being a contract with zero consumers."""
        return ScdHistoryStatsMV(self, path, n_buckets=n_buckets)

    def expire_history(self, before: int) -> int:
        """Retention for the history ITSELF: physically drop every
        version that closed at-or-before ``before`` (``valid_to <=
        before``), keep the interval containing ``before`` and
        everything after, and record ``before`` as the store's durable
        retention floor (a manifest prop, so it survives clone/backup).
        A dimension history grows without bound otherwise; after
        expiry, ``as_of(t >= before)`` is bit-identical to the
        unexpired store, and every read below the floor raises — the
        ``read_at``-on-gc-expired discipline (partial answers are worse
        than loud ones).

        Contract: ``before`` must sit at-or-below the source's
        redelivery low-water mark (the ``gc_tombstones`` contract):
        expiring lowers per-key high-water marks, so afterwards the
        FLOOR — enforced by ``apply_batch`` (drops sub-floor
        redeliveries) and ``insert_versions`` (refuses sub-floor late
        events: their closing evidence is gone) — carries the guarantee
        the expired rows no longer can.

        Mechanics: the floor prop flips FIRST (a crash after the flip
        leaves sub-floor reads raising — conservative — and the doomed
        rows droppable by a rerun); doomed rows then delete through the
        normal LWW merge at a seq STRICTLY ABOVE the max stored
        ``_seq`` over the doomed rows' own buckets (not ``before + 1``:
        ``insert_versions`` re-stamps changed rows at ``smax + 1``,
        which can exceed ``before + 1`` — a retro-shortened interval
        whose close lands at-or-below a future floor would then WIN the
        LWW against the expiry delete and leak into ``read_history``
        forever, each rerun minting a no-op version), and
        ``store.gc_tombstones`` reclaims the tombstones physically —
        the same two-step every other retention path in the engine
        uses.  Zero-width no-op-delete tombstone rows below the floor
        expire too.  Idempotent: a rerun finds the floor set and
        nothing doomed.  Cost: O(doomed rows + their buckets) — the
        one-time price of what is dropped, never a history rescan
        beyond the filter.  Returns the store's version."""
        fl = self.history_floor()
        if before < fl:
            return self.store.current_version()
        if before > fl:
            self.store.set_prop("history_floor", int(before))
        st = self.store.read()
        if st is None:
            return self.store.current_version()
        doomed = st.filter(
            F.col("valid_to").isNotNull() & (F.col("valid_to") <= F.lit(before))
        )
        if not doomed.limit(1).count():
            return self.store.current_version()
        value_cols = [
            c
            for c in st.columns
            if c not in {*self.keys, "valid_from", "valid_to"}
        ]
        typed = {f.name: f.dataType for f in st.schema.fields}
        # bounded driver scalar (the insert_versions discipline): one
        # max over the doomed keys' buckets; the delete must out-seq
        # every stored row it targets, whatever stamped them
        raw = self.store.read_buckets(
            self._buckets_of_facts(doomed.select(*self.keys)), internal=True
        )
        smax = (raw.agg(F.max("_seq")).first()[0] or 0) if raw is not None else 0
        del_seq = max(int(before), int(smax)) + 1
        events = doomed.select(
            F.lit("delete").alias("op"),
            F.lit(del_seq).cast("long").alias("seq"),
            *self.keys,
            "valid_from",
            *[F.lit(None).cast(typed[c]).alias(c) for c in value_cols],
            F.lit(None).cast("long").alias("valid_to"),
        )
        self.store.merge(events)
        # the SCD2 store's only delete tombstones are expiry ones (the
        # history never deletes identities otherwise), so reclaiming
        # below del_seq + 1 is exact
        return self.store.gc_tombstones(del_seq + 1)


class _HistoryStatsSource:
    """CDF adapter: the SCD2 store's version rows projected to additive
    per-key statistics columns, so ``DerivedKeyedAggTable`` maintains
    the stats MV with its standard signed-delta machinery.  Projection
    per version row (identity = key…, valid_from):

    * ``closed``  — 1 for a closed real version (``valid_to`` set and
      > ``valid_from``), else 0 (open rows, zero-width markers);
    * ``dwell``   — ``valid_to - valid_from`` for closed versions
      (stream-seq dwell time of that version), else 0;
    * ``is_open`` — 1 for the key's open (current) version, else 0.

    Identities are stable (a row's valid_from never changes); the only
    mutations are open→closed and retro-shortened closes — exactly the
    update retract/add the delta machinery handles; expiry deletes
    retract their row's contribution, so after ``expire_history`` the
    MV converges to stats over the RETAINED range by construction."""

    def __init__(self, store: VersionedBucketedTable):
        self.store = store

    @staticmethod
    def _stat_cols(prefix: str = ""):
        vf, vt = F.col(f"{prefix}valid_from"), F.col(f"{prefix}valid_to")
        closed = (vt.isNotNull() & (vt > vf)).cast("long")
        return [
            closed.alias(f"{prefix}closed"),
            F.when(closed == 1, vt - vf).otherwise(F.lit(0))
            .cast("long").alias(f"{prefix}dwell"),
            vt.isNull().cast("long").alias(f"{prefix}is_open"),
        ]

    def current_version(self) -> int:
        return self.store.current_version()

    def read_at(self, v: int) -> DataFrame:
        df = self.store.read_at(v)
        keys = [k for k in self.store.keys if k != "valid_from"]
        return df.select(*keys, *self._stat_cols())

    def changes_between(
        self, v0: int, v1: int, *, include_preimage: bool = True
    ) -> DataFrame:
        cdf = self.store.changes_between(v0, v1, include_preimage=True)
        keys = [k for k in self.store.keys if k != "valid_from"]
        post = self._stat_cols()
        # the store's key columns (key…, valid_from) are the CDF's join
        # IDENTITY — they have no _pre_ side (a row never changes them),
        # so the preimage stats read _pre_valid_to against the identity
        # valid_from, and the retract's _pre_<group> aliases are the
        # identity keys themselves
        pre_vf, pre_vt = F.col("valid_from"), F.col("_pre_valid_to")
        pre_closed = (pre_vt.isNotNull() & (pre_vt > pre_vf)).cast("long")
        pre = [
            pre_closed.alias("_pre_closed"),
            F.when(pre_closed == 1, pre_vt - pre_vf).otherwise(F.lit(0))
            .cast("long").alias("_pre_dwell"),
            pre_vt.isNull().cast("long").alias("_pre_is_open"),
        ]
        return cdf.select(
            "_change",
            *keys,
            *[F.col(k).alias(f"_pre_{k}") for k in keys],
            *post,
            *pre,
        )


class ScdHistoryStatsMV:
    """Per-key VERSION STATISTICS derived from the SCD2 history's own
    change feed — the retention floor's first real consumer: a derived
    view that (a) maintains itself incrementally from history CDF
    (O(delta + touched buckets) per refresh, the DerivedKeyedAggTable
    discipline — state and applied-version commit in one manifest
    flip), and (b) CARRIES the floor: each refresh records the
    source's ``history_floor`` as its own prop, so a consumer can ask
    whether the stats are complete over a range BEFORE trusting them
    (``assert_covers``) instead of silently reading
    counts-minus-the-expired.  Reference analog: the versioned-schema
    read path (outputs/kafka/kafka.go:135-141) — state must be
    interpreted with the metadata of the range it was built over.

    Columns: (key…, n_entries, n_closed, dwell, n_open) where
    ``n_entries`` counts ALL stored identities (zero-width no-op-delete
    markers included — storage-grain), ``n_closed``/``n_open`` count
    visible versions, ``dwell`` totals the closed versions'
    ``valid_to - valid_from``.  After ``expire_history`` + refresh the
    stats equal the from-scratch derivation over the RETAINED history
    (the gate query's hash contract)."""

    def __init__(self, scd: "ScdType2Table", path: str, *, n_buckets: int = 32):
        from qin_cdc_spark.streaming.derived import DerivedKeyedAggTable

        self.scd = scd
        self.mv = DerivedKeyedAggTable(
            scd.spark,
            path,
            group_cols=[k for k in scd.store.keys if k != "valid_from"],
            sum_cols=["closed", "dwell", "is_open"],
            n_buckets=n_buckets,
            cnt_col="n_entries",
        )
        self._source = _HistoryStatsSource(scd.store)

    def refresh(self, source=None) -> int:
        """Fold the history CDF since the last applied version.  The
        ``source`` argument is accepted-and-ignored for protocol parity
        with the derived-view family (the pipeline's mview hook passes
        the route TARGET; this view's source is the bound history
        store, fixed at construction).

        The source's retention floor records BEFORE the state flip
        (ADVICE r8): the two writes aren't atomic, and a crash between
        them must land on the safe side — floor recorded, retractions
        not yet folded ⇒ ``assert_covers`` OVER-claims incompleteness
        (raises for a range the stats could still answer, heals on the
        next refresh).  The old order (state first, floor second) left
        a window where stats had already retracted expired versions
        while ``floor()`` still read the old value, so ``assert_covers``
        passed for ranges the stats no longer covered — defeating the
        loud-completeness contract this MV exists for."""
        fl = self.scd.history_floor()
        if fl and fl != int(self.mv.store.get_prop("history_floor", 0)):
            self.mv.store.set_prop("history_floor", int(fl))
        return self.mv.refresh(self._source)

    def rename_columns(self, mapping: dict[str, str]) -> None:
        """Follow an upstream BUSINESS-KEY rename on the route (the
        history store itself renames via ScdType2Table.rename_columns;
        this re-binds the stats state, whose group columns are the
        business keys — the stat columns closed/dwell/is_open are
        engine names, never upstream columns)."""
        self.mv.rename_columns(mapping)

    def floor(self) -> int:
        """The retention floor the stats were built over (0 = full
        history): versions closing at-or-below it were expired at the
        SOURCE, so their counts/dwell are gone from these stats —
        correctly (the MV mirrors the retained range), but a consumer
        summing 'all versions ever' must hear that."""
        return int(self.mv.store.get_prop("history_floor", 0))

    def assert_covers(self, since_seq: int) -> None:
        """Raise unless the stats are COMPLETE for versions closing
        at-or-after ``since_seq`` — the read_at-on-gc-expired
        discipline applied to the derived view (partial answers are
        worse than loud ones)."""
        fl = self.floor()
        if fl and since_seq < fl:
            raise ValueError(
                f"history stats cover versions closing above the retention "
                f"floor {fl}; completeness since {since_seq} is gone "
                "(expired at the source)"
            )

    def read(self) -> DataFrame | None:
        st = self.mv.read()
        if st is None:
            return None
        return st.select(
            *self.mv.group_cols,
            F.col("n_entries"),
            F.col("sum_closed").alias("n_closed"),
            F.col("sum_dwell").alias("dwell"),
            F.col("sum_is_open").alias("n_open"),
        )
