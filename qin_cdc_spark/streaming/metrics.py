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


# --------------------------------------------------------------------------
# Prometheus exposition (reference utils/http.go:13-25 + metrics/metrics.go:
# 8-41): the same five metric series, served from a stdlib HTTP endpoint.
# In a micro-batch engine read and write happen inside one trigger, so both
# delay gauges report the last trigger duration (the honest analog of the
# reference's separate binlog-read / sink-write lag gauges).
# --------------------------------------------------------------------------

REFERENCE_METRIC_NAMES = (
    "qin_cdc_start_time",
    "qin_cdc_read_processed_ops_total",
    "qin_cdc_write_processed_ops_total",
    "qin_cdc_read_delay_time_seconds",
    "qin_cdc_write_delay_time_seconds",
)


def prometheus_text(metrics: PipelineMetrics) -> str:
    """Render the snapshot in Prometheus exposition format."""
    snap = metrics.snapshot()
    last_ms = [
        q["last_batch_ms"]
        for q in snap["queries"].values()
        if q.get("last_batch_ms") is not None
    ]
    delay_s = (max(last_ms) / 1000.0) if last_ms else 0.0
    lines = [
        "# HELP qin_cdc_start_time qin-cdc startup timestamp (s).",
        "# TYPE qin_cdc_start_time gauge",
        f"qin_cdc_start_time {snap['started_at']}",
        "# HELP qin_cdc_read_processed_ops_total The total number of read processed events",
        "# TYPE qin_cdc_read_processed_ops_total counter",
        f"qin_cdc_read_processed_ops_total {snap['rows_processed']}",
        "# HELP qin_cdc_write_processed_ops_total The total number of write processed events",
        "# TYPE qin_cdc_write_processed_ops_total counter",
        f"qin_cdc_write_processed_ops_total {snap['rows_processed']}",
        "# HELP qin_cdc_read_delay_time_seconds Delay in seconds to read at the source.",
        "# TYPE qin_cdc_read_delay_time_seconds gauge",
        f"qin_cdc_read_delay_time_seconds {delay_s}",
        "# HELP qin_cdc_write_delay_time_seconds Delay in seconds to write at the destination.",
        "# TYPE qin_cdc_write_delay_time_seconds gauge",
        f"qin_cdc_write_delay_time_seconds {delay_s}",
    ]
    return "\n".join(lines) + "\n"


def start_metrics_http(metrics: PipelineMetrics, *, port: int = 0):
    """Serve ``/metrics`` on a daemon thread; returns the HTTPServer
    (``server.server_address[1]`` is the bound port; ``server.shutdown()``
    stops it).  Port 0 binds an ephemeral port — the reference takes the
    port as a CLI flag (utils/help.go HttpPort)."""
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 — stdlib contract
            if self.path != "/metrics":
                self.send_response(404)
                self.end_headers()
                return
            body = prometheus_text(metrics).encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/plain; version=0.0.4")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):  # silence request logging
            pass

    server = HTTPServer(("127.0.0.1", port), Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server
