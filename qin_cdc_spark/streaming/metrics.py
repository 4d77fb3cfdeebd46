"""Pipeline metrics (A33) — the reference's Prometheus surface
(metrics/metrics.go:8-41: start time, read/write processed counters,
read/write delay gauges) re-expressed on Spark's StreamingQueryListener.

The listener is push-based (no polling of query.lastProgress from user
code) and aggregates across every stream started on the session; a
deployment exports ``snapshot()`` through whatever scraper it runs
(Prometheus client, StatsD, …) — the engine deliberately has no HTTP
dependency.
"""

from __future__ import annotations

import time
from threading import Lock

from pyspark.sql.streaming import StreamingQueryListener


class PipelineMetrics(StreamingQueryListener):
    """Accumulates per-query and total progress counters.

    - ``rows_processed``  ≙ reference write-processed counter
    - ``batch_durations_ms`` (last per query) ≙ write-delay gauge
    - ``input_rows_per_second`` (last) ≙ read-rate gauge
    - ``started_at`` ≙ metrics start-time gauge
    """

    def __init__(self) -> None:
        self.started_at = time.time()
        self._lock = Lock()
        self._by_query: dict[str, dict] = {}
        self._rows_total = 0
        self._batches_total = 0

    # -- StreamingQueryListener contract --------------------------------
    def onQueryStarted(self, event) -> None:
        with self._lock:
            self._by_query.setdefault(
                str(event.id),
                {"name": event.name, "rows": 0, "batches": 0,
                 "last_batch_ms": None, "last_rows_per_s": None,
                 "active": True},
            )

    def onQueryProgress(self, event) -> None:
        p = event.progress
        with self._lock:
            q = self._by_query.setdefault(
                str(p.id),
                {"name": p.name, "rows": 0, "batches": 0,
                 "last_batch_ms": None, "last_rows_per_s": None,
                 "active": True},
            )
            q["rows"] += p.numInputRows
            q["batches"] += 1
            q["last_batch_ms"] = (p.durationMs or {}).get("triggerExecution")
            q["last_rows_per_s"] = p.processedRowsPerSecond
            self._rows_total += p.numInputRows
            self._batches_total += 1

    def onQueryTerminated(self, event) -> None:
        with self._lock:
            if str(event.id) in self._by_query:
                self._by_query[str(event.id)]["active"] = False

    def onQueryIdle(self, event) -> None:  # pragma: no cover - no-op
        pass

    # -- export ----------------------------------------------------------
    def snapshot(self) -> dict:
        with self._lock:
            return {
                "started_at": self.started_at,
                "uptime_s": time.time() - self.started_at,
                "rows_processed": self._rows_total,
                "batches_processed": self._batches_total,
                "queries": {qid: dict(v) for qid, v in self._by_query.items()},
            }


def attach_metrics(spark) -> PipelineMetrics:
    """Register a fresh PipelineMetrics listener on the session."""
    m = PipelineMetrics()
    spark.streams.addListener(m)
    return m
