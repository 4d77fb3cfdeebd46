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
