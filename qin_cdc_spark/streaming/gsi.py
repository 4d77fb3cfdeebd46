"""Global secondary index over a versioned CDC target.

The base table is hash-bucketed by PRIMARY key: a point lookup by any
other column either scans everything or leans on the probabilistic
Bloom path (``versioned.read_where`` — skip-quality depends on how
values cluster in bucket files).  A warehouse serves such lookups with
a SECONDARY INDEX — a co-located projection keyed by the indexed
column (DynamoDB GSI / Iceberg sort-order projection / covering index)
— and at 100 TB it must be maintained incrementally, never rebuilt.

``GlobalSecondaryIndex`` is that projection built from the engine's
own machinery:

* state = a ``VersionedBucketedTable`` keyed ``(index_col, pk…)`` but
  BUCKETED by the index column alone (``bucket_cols=``): every row
  sharing an indexed value co-locates, so ``lookup(values)`` is a
  manifest-pruned read of exactly the buckets the probed values hash
  into — EXACT one-bucket serving, cost independent of the base
  table's layout (the Bloom path's pruning is best-effort; this one is
  structural).
* maintenance = O(delta) from the base table's preimage CDF:
  inserts upsert, deletes delete the (pre-index-value, pk) row, and an
  update that MOVES the indexed value deletes under the old value and
  upserts under the new one — the index-move case a naive additive
  mirror gets wrong.  NULL index values are never indexed (SQL index
  semantics); a value→NULL update deletes, NULL→value inserts.
* progress rides the store's batch guard (``batch_id = v_to``), so
  index state and applied-version commit in ONE manifest flip and a
  replayed refresh no-ops — the ``DerivedKeyedAggTable`` discipline.

``include_cols`` makes it a COVERING index (lookups answered entirely
from the projection); empty = key-only (lookup returns PKs to feed
``read_key`` on the base table).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from qin_cdc_spark.streaming.versioned import VersionedBucketedTable


class GlobalSecondaryIndex:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        *,
        index_col: str,
        pk_cols: list[str],
        include_cols: list[str] | None = None,
        n_buckets: int = 32,
    ):
        self.spark = spark
        self.index_col = index_col
        self.pk_cols = list(pk_cols)
        self.include_cols = list(include_cols or [])
        self.store = VersionedBucketedTable(
            spark,
            path,
            [index_col, *self.pk_cols],
            n_buckets=n_buckets,
            bucket_cols=[index_col],
        )

    def applied_version(self) -> int:
        return max(0, self.store.last_batch_id())

    def read(self) -> DataFrame | None:
        """The whole projection (diagnostics; serving goes via lookup)."""
        return self.store.read()

    def rename_columns(self, mapping: dict[str, str]) -> None:
        """Follow an upstream source-column rename: the index
        projection stores source names raw (index col, PKs, covered
        columns) — delegate to the state store's value-preserving
        rename (bucket placement hashes the index VALUE, no row
        moves); a never-refreshed store just re-binds keys."""
        spec = {self.index_col, *self.pk_cols, *self.include_cols}
        state_map = {o: n for o, n in mapping.items() if o in spec}
        self.index_col = mapping.get(self.index_col, self.index_col)
        self.pk_cols = [mapping.get(c, c) for c in self.pk_cols]
        self.include_cols = [mapping.get(c, c) for c in self.include_cols]
        if not state_map:
            return
        if self.store.current_version() > 0:
            self.store.rename_columns(state_map, missing_ok=True)
        else:
            self.store.keys = [state_map.get(k, k) for k in self.store.keys]
            self.store.bucket_cols = [
                state_map.get(k, k) for k in self.store.bucket_cols
            ]

    # -- maintenance -----------------------------------------------------------

    def _events(self, rows: DataFrame, op: str, v: int, *, pre: bool) -> DataFrame:
        """Index events from CDF rows; ``pre`` selects the preimage side
        (retractions address the OLD indexed value)."""
        idx = F.col(f"_pre_{self.index_col}") if pre else F.col(self.index_col)
        if op == "delete":
            # typed NULLs for the projection columns (the merge aligns
            # stored rows to the incoming batch's types)
            types = dict(
                (f.name, f.dataType)
                for f in rows.schema.fields
            )
            inc = [
                F.lit(None).cast(types[c]).alias(c) for c in self.include_cols
            ]
        else:
            inc = [F.col(c).alias(c) for c in self.include_cols]
        return rows.filter(idx.isNotNull()).select(
            F.lit(op).alias("op"),
            F.lit(v).cast("long").alias("seq"),
            idx.alias(self.index_col),
            *[F.col(k) for k in self.pk_cols],
            *inc,
        )

    def refresh(self, source: VersionedBucketedTable) -> int:
        """Fold base-table versions past the applied one into the index;
        O(|CDF| + touched index buckets) — never a base-table scan."""
        v0, v1 = self.applied_version(), source.current_version()
        if v1 <= v0:
            return v0
        if v0 == 0:
            base = source.read_at(v1)
            events = base.filter(F.col(self.index_col).isNotNull()).select(
                F.lit("upsert").alias("op"),
                F.lit(v1).cast("long").alias("seq"),
                self.index_col,
                *self.pk_cols,
                *self.include_cols,
            )
            self.store.merge(events, batch_id=v1)
            return v1
        cdf = source.changes_between(v0, v1, include_preimage=True)
        ups = self._events(
            cdf.filter(F.col("_change") != "delete"), "upsert", v1, pre=False
        )
        # retractions: deletes always; updates only when the indexed
        # value MOVED (same identity otherwise — the upsert covers it)
        idx_moved = ~F.col(f"_pre_{self.index_col}").eqNullSafe(
            F.col(self.index_col)
        )
        rets = self._events(
            cdf.filter(
                (F.col("_change") == "delete")
                | ((F.col("_change") == "update") & idx_moved)
            ),
            "delete",
            v1,
            pre=True,
        )
        self.store.merge(ups.unionByName(rets), batch_id=v1)
        return v1

    # -- serving ------------------------------------------------------------------

    def _buckets_of(self, values: list) -> list[str]:
        man = self.store._meta()["versions"].get(
            str(self.store.current_version()), {"buckets": {}}
        )
        nb = self.store._manifest_n_buckets(man)
        st = self.store.read_internal()
        if st is None:
            return []
        typed = st.limit(0).select(self.index_col).schema
        df = self.spark.createDataFrame([(v,) for v in values], typed)
        return [
            str(r[0])
            for r in df.select(self.store._bucket_expr(nb).alias("_b"))
            .distinct()
            .collect()
        ]

    def lookup(self, values: list) -> DataFrame | None:
        """All indexed rows for the probed values — a manifest-pruned
        read of exactly the buckets those values hash into (driver-side
        bucket math, the ``read_key`` discipline applied to a non-PK
        column)."""
        buckets = self._buckets_of(values)
        rows = self.store.read_buckets(buckets) if buckets else None
        if rows is None:
            return None
        return rows.filter(F.col(self.index_col).isin(values))

    def lookup_df(self, values: DataFrame) -> DataFrame | None:
        """Distributed-probe lookup: like ``lookup`` but the probed
        values stay a DataFrame — the driver collects only their
        distinct BUCKET ids (bounded by n_buckets at ANY probe
        cardinality), so a probe set too large for a driver-side list
        (e.g. every affected component label of a giant relabel batch)
        still gets a manifest-pruned read: only the probed values'
        buckets open, membership resolves as a left-semi join inside
        the scan.  ``values``' first column is the probe; it is cast to
        the stored index type before hashing (the read_key
        type-alignment guard)."""
        man = self.store._meta()["versions"].get(
            str(self.store.current_version()), {"buckets": {}}
        )
        nb = self.store._manifest_n_buckets(man)
        st = self.store.read_internal()
        if st is None:
            return None
        stored_t = st.schema[self.index_col].dataType
        probes = values.select(
            F.col(values.columns[0]).cast(stored_t).alias(self.index_col)
        ).distinct()
        buckets = [
            str(r[0])
            for r in probes.select(self.store._bucket_expr(nb).alias("_b"))
            .distinct()
            .collect()
        ]
        rows = self.store.read_buckets(buckets) if buckets else None
        if rows is None:
            return None
        return rows.join(probes, self.index_col, "left_semi")
