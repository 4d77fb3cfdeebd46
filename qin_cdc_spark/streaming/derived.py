"""Incrementally-maintained derived aggregate (materialized view) over
a versioned CDC target.

``RollupStore`` maintains continuous aggregates from an APPEND stream —
additive merges only.  A synced CDC table also mutates: updates move
rows between groups and deletes retract them, which additive merges
cannot express.  ``DerivedAggTable`` closes that gap using the
versioned table's change data feed WITH PREIMAGES
(``VersionedBucketedTable.changes_between(…, include_preimage=True)``):

* insert   → (+1, +value) into the postimage's group
* delete   → (−1, −pre_value) into the preimage's group
* update   → BOTH rows — retract from the preimage group, add to the
  postimage group (covers group-moving updates)

The per-refresh cost is O(|delta| + |touched groups|): the CDF is
bounded by what changed, the delta pre-aggregates map-side, and the
merge touches only the groups the delta names.  Aggregates must be
retractable (count, sum; avg = sum/cnt downstream) — min/max need a
rescan on retraction and are deliberately not offered.  Use integer
(cents-quantized) value columns: float sums under retraction reorder
arbitrarily, the repo-wide cross-engine lesson (PLANS.md).

Publish is the snapshot-pointer pattern shared with RollupStore: an
immutable data dir per refresh + one atomic ``os.replace`` of the meta
JSON recording the last applied source version — a crashed refresh
leaves the previous state intact and replays from the same CDF range.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from qin_cdc_spark.streaming.versioned import VersionedBucketedTable

META_NAME = "_derived_meta.json"


class DerivedAggTable:
    """(group_cols → cnt, sum_<col>…) maintained from a CDF."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        *,
        group_cols: list[str],
        sum_cols: list[str],
    ):
        self.spark = spark
        self.path = path
        self.group_cols = list(group_cols)
        self.sum_cols = list(sum_cols)

    # -- meta --------------------------------------------------------------

    def _meta(self) -> dict:
        p = os.path.join(self.path, META_NAME)
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return {"applied_version": 0, "data": None}

    def _publish(self, meta: dict) -> None:
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f".{META_NAME}.tmp-{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(self.path, META_NAME))
        for d in os.listdir(self.path):
            if d.startswith("agg-") and d != meta["data"]:
                shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)

    def applied_version(self) -> int:
        return self._meta()["applied_version"]

    def read(self) -> DataFrame | None:
        meta = self._meta()
        if meta["data"] is None:
            return None
        return self.spark.read.parquet(os.path.join(self.path, meta["data"]))

    # -- refresh -----------------------------------------------------------

    def _delta(self, cdf: DataFrame) -> DataFrame:
        """Signed (group, dcnt, dsum_*) rows from a preimage CDF."""
        add = cdf.filter(F.col("_change").isin("insert", "update")).select(
            *self.group_cols,
            F.lit(1).cast("long").alias("dcnt"),
            *[F.col(c).cast("long").alias(f"dsum_{c}") for c in self.sum_cols],
        )
        retract = cdf.filter(F.col("_change").isin("update", "delete")).select(
            *[F.col(f"_pre_{g}").alias(g) for g in self.group_cols],
            F.lit(-1).cast("long").alias("dcnt"),
            *[
                (-F.col(f"_pre_{c}").cast("long")).alias(f"dsum_{c}")
                for c in self.sum_cols
            ],
        )
        return (
            add.unionByName(retract)
            .groupBy(*self.group_cols)
            .agg(
                F.sum("dcnt").alias("dcnt"),
                *[F.sum(f"dsum_{c}").alias(f"dsum_{c}") for c in self.sum_cols],
            )
        )

    def refresh(self, source: VersionedBucketedTable) -> int:
        """Fold every source version past ``applied_version`` into the
        aggregate; returns the new applied version.  Idempotent: a
        repeated call sees an empty CDF range and no-ops."""
        meta = self._meta()
        v_from, v_to = meta["applied_version"], source.current_version()
        if v_to <= v_from:
            return v_from
        if v_from == 0:
            # bootstrap: aggregate the snapshot directly (no prior state)
            base = source.read_at(v_to)
            delta = base.groupBy(*self.group_cols).agg(
                F.count(F.lit(1)).alias("dcnt"),
                *[
                    F.sum(F.col(c).cast("long")).alias(f"dsum_{c}")
                    for c in self.sum_cols
                ],
            )
        else:
            delta = self._delta(
                source.changes_between(v_from, v_to, include_preimage=True)
            )
        cur = self.read()
        if cur is None:
            merged = delta
        else:
            merged = (
                cur.select(
                    *self.group_cols,
                    F.col("cnt").alias("dcnt"),
                    *[F.col(f"sum_{c}").alias(f"dsum_{c}") for c in self.sum_cols],
                )
                .unionByName(delta)
                .groupBy(*self.group_cols)
                .agg(
                    F.sum("dcnt").alias("dcnt"),
                    *[F.sum(f"dsum_{c}").alias(f"dsum_{c}") for c in self.sum_cols],
                )
            )
        out = merged.filter(F.col("dcnt") > 0).select(
            *self.group_cols,
            F.col("dcnt").alias("cnt"),
            *[F.col(f"dsum_{c}").alias(f"sum_{c}") for c in self.sum_cols],
        )
        dname = f"agg-{uuid.uuid4().hex[:12]}"
        out.write.parquet(os.path.join(self.path, dname))
        self._publish({"applied_version": v_to, "data": dname})
        return v_to
