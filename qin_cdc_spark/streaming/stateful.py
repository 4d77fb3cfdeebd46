"""Custom stateful streaming operators via applyInPandasWithState.

The north-star contract (BASELINE.json) calls for custom stateful
operators beyond the built-in window/dedup set; this module provides
the canonical shape: per-key state maintained across micro-batches with
Arrow-batched pandas UDFs.  State lives in the Spark state store
(checkpointed, partitioned by key — scales horizontally like any
stateful agg; the reference has no analog, its only state is the
position store A31).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

USER_STATS_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)

USER_STATS_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("s", DoubleType()),
        StructField("mx", DoubleType()),
    ]
)


def _update_user_stats(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Running per-user aggregate across micro-batches (count/sum/max)."""
    if state.exists:
        n, s, mx = state.get
    else:
        n, s, mx = 0, 0.0, float("-inf")
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, s, mx))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [s], "max_value": [mx]}
    )


def running_user_stats(events_stream: DataFrame) -> DataFrame:
    """Stateful per-user running stats over a streaming events frame.

    Each micro-batch emits the UPDATED totals for the users present in
    the batch (update semantics) — the stateful analog of
    ``groupBy(user_id).agg(...)`` that a pure window operator can't
    express incrementally.
    """
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=USER_STATS_OUTPUT,
            stateStructType=USER_STATS_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --------------------------------------------------------------------------
# transformWithState (Spark 4): the successor API to
# applyInPandasWithState — typed named-state slots in the state store,
# optional per-state TTL, and timers.  NOTE: its Python worker protocol
# needs protobuf + the RocksDB state store provider; this container
# ships neither protobuf nor allows installs, so the operator is
# import-guarded and its test skips with a documented reason (the same
# pattern as the Kafka connector jar).  Implemented here: cross-batch
# first-seen admission with expiring memory (the streaming
# rate-limiter/dedup-with-TTL primitive: admit a key's event only if the
# key was NOT seen within the TTL window — re-crawl suppression,
# notification throttling, sliding uniqueness).  A plain
# dropDuplicates-with-watermark can't express "seen within T of the
# PREVIOUS admission" semantics; value-state + TTL can.
# --------------------------------------------------------------------------

try:  # Spark >= 4.0
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class FirstSeenTTLProcessor(StatefulProcessor):
        """Admit the first event per key; suppress repeats while the
        key's state lives.  ``ttl_ms=None`` = remember forever (exact
        cross-batch dedup); with a TTL the state store expires the
        memory and the key admits again — bounded state by design (the
        100 TB property: store size tracks the ACTIVE key set, not
        history)."""

        def __init__(self, ttl_ms: int | None = None):
            self.ttl_ms = ttl_ms

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._seen = handle.getValueState(
                "seen", "n long", ttlDurationMs=self.ttl_ms
            )

        def handleInputRows(self, key, rows, timer_values):
            admitted = not self._seen.exists()
            n_sup = 0
            total = 0
            for pdf in rows:
                total += len(pdf)
            if admitted:
                self._seen.update((1,))
                n_sup = total - 1
            else:
                n_sup = total
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "admitted": [admitted],
                    "n_suppressed": [n_sup],
                }
            )

        def close(self) -> None:
            pass

    def first_seen_admission(
        keyed_stream: DataFrame, *, ttl_ms: int | None = None
    ) -> DataFrame:
        """Streaming first-seen admission over a frame with a ``key``
        column; one output row per (batch, key present in batch)."""
        return keyed_stream.groupBy("key").transformWithStateInPandas(
            FirstSeenTTLProcessor(ttl_ms),
            outputStructType="key string, admitted boolean, n_suppressed long",
            outputMode="Update",
            timeMode="ProcessingTime",
        )

except ImportError:  # pragma: no cover — Spark 3.x fallback surface
    FirstSeenTTLProcessor = None

    def first_seen_admission(keyed_stream: DataFrame, *, ttl_ms: int | None = None):
        raise NotImplementedError("transformWithState requires Spark >= 4.0")
