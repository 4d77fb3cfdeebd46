"""Runtime control plane for a streaming CDC pipeline — SURVEY §2.A
A36 made REAL.

The reference registers five control endpoints but every handler is an
empty stub (api/api.go:7-35 — each returns immediately; utils/http.go:
28-32 wires them to /api/addRouter, /api/delRule, /api/getRule,
/api/pause, /api/resume).  This module implements the semantics those
names promise, Spark-first:

- **add/del router**: the ``foreachBatch`` closure in
  ``start_cdc_stream`` iterates the SAME list object the controller
  holds, so in-place mutation takes effect at the next micro-batch —
  no restart, no rebuild.  A freshly-added route simply starts
  filtering its (db, table) slice from the next batch onward; rows for
  that table in earlier batches were never routed (the operator
  backfills via ``replay`` from a fresh checkpoint if needed).
- **pause**: graceful ``StreamingQuery.stop()`` — Spark commits the
  checkpoint through the last completed batch, so no event is lost.
- **resume**: restart from the SAME checkpoint; at-least-once
  redelivery of the in-flight batch converges because every route's
  merge is idempotent (LWW by seq).

The HTTP layer binds 127.0.0.1 like the metrics endpoint and mirrors
the reference's exact paths.
"""

from __future__ import annotations

import json
import threading
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from qin_cdc_spark.streaming.cdc_stream import (
    DEFAULT_N_BUCKETS,
    CdcStreamRoute,
    start_cdc_stream,
)


class CdcController:
    """Owns a streaming CDC pipeline's lifecycle and route table.

    ``stream_factory`` returns a FRESH envelope readStream DataFrame on
    every (re)start — a Structured Streaming query cannot be restarted
    on a consumed DataFrame, and the checkpoint (not the DataFrame)
    carries the position.
    """

    def __init__(
        self,
        spark: SparkSession,
        stream_factory: Callable[[], DataFrame],
        routes: list[CdcStreamRoute],
        *,
        checkpoint_dir: str,
        registry=None,
        trigger: dict | None = None,
        gc_every: int = 0,
    ):
        self.spark = spark
        self.stream_factory = stream_factory
        # THE shared list: start_cdc_stream's closure iterates this very
        # object, so add_router/del_router below are live
        self.routes = routes
        self.checkpoint_dir = checkpoint_dir
        self.registry = registry
        self.trigger = trigger
        self.gc_every = gc_every
        self.query = None
        self._lock = threading.Lock()

    # -- lifecycle ----------------------------------------------------

    def start(self):
        with self._lock:
            if self.query is not None and self.query.isActive:
                return self.query
            self.query = start_cdc_stream(
                self.spark,
                self.stream_factory(),
                self.routes,
                checkpoint_dir=self.checkpoint_dir,
                trigger=self.trigger,
                registry=self.registry,
                gc_every=self.gc_every,
            )
            return self.query

    def pause(self) -> bool:
        """Graceful stop; checkpoint retains the committed position.
        Returns True if a running query was stopped."""
        with self._lock:
            if self.query is None or not self.query.isActive:
                return False
            self.query.stop()
            self.query.awaitTermination(60)
            return True

    def resume(self):
        """Restart from the same checkpoint (no-op if already active)."""
        return self.start()

    def await_drained(self, timeout_s: int = 300) -> None:
        """Block until an availableNow run finishes (test/ops helper)."""
        if self.query is not None:
            self.query.awaitTermination(timeout_s)

    # -- route table --------------------------------------------------

    def add_router(self, route: CdcStreamRoute) -> None:
        """Live route add: effective from the next micro-batch."""
        with self._lock:
            if any(
                r.db == route.db and r.table == route.table for r in self.routes
            ):
                raise ValueError(f"route {route.db}.{route.table} already exists")
            self.routes.append(route)

    def del_router(self, db: str, table: str) -> bool:
        """Live route removal: effective from the next micro-batch.
        The route's target table is left on disk untouched."""
        with self._lock:
            for i, r in enumerate(self.routes):
                if r.db == db and r.table == table:
                    del self.routes[i]
                    return True
            return False

    def get_rules(self) -> list[dict]:
        with self._lock:
            return [
                {
                    "db": r.db,
                    "table": r.table,
                    "keys": list(r.keys),
                    "target_path": r.target_path,
                    "n_buckets": r.n_buckets,
                }
                for r in self.routes
            ]

    def status(self) -> dict:
        q = self.query
        return {
            "active": bool(q is not None and q.isActive),
            "n_routes": len(self.routes),
            "checkpoint_dir": self.checkpoint_dir,
        }


def start_control_http(controller: CdcController, *, port: int = 0):
    """Serve the reference's five control paths (utils/http.go:28-32)
    against a live :class:`CdcController`; returns the HTTPServer
    (``server.server_address[1]`` is the bound port).

    - ``GET  /api/getRule``          → JSON route table
    - ``POST /api/addRouter``        → body ``{db, table, keys,
      target_path, schema_ddl, n_buckets?}`` (schema as a DDL string,
      e.g. ``"id long, val string"``)
    - ``POST /api/delRule``          → body ``{db, table}``
    - ``POST /api/pause`` / ``/api/resume``
    """
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from pyspark.sql.types import _parse_datatype_string

    def _json(handler, code: int, obj) -> None:
        body = json.dumps(obj).encode()
        handler.send_response(code)
        handler.send_header("Content-Type", "application/json")
        handler.send_header("Content-Length", str(len(body)))
        handler.end_headers()
        handler.wfile.write(body)

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 — stdlib contract
            if self.path == "/api/getRule":
                _json(self, 200, {"rules": controller.get_rules(),
                                  "status": controller.status()})
            else:
                _json(self, 404, {"error": "unknown path"})

        def do_POST(self):  # noqa: N802 — stdlib contract
            n = int(self.headers.get("Content-Length", 0))
            try:
                body = json.loads(self.rfile.read(n) or b"{}")
            except json.JSONDecodeError:
                _json(self, 400, {"error": "bad json"})
                return
            try:
                if self.path == "/api/addRouter":
                    route = CdcStreamRoute(
                        controller.spark,
                        db=body["db"],
                        table=body["table"],
                        schema=_parse_datatype_string(body["schema_ddl"]),
                        keys=list(body["keys"]),
                        target_path=body["target_path"],
                        n_buckets=body.get("n_buckets", DEFAULT_N_BUCKETS),
                    )
                    controller.add_router(route)
                    _json(self, 200, {"ok": True})
                elif self.path == "/api/delRule":
                    ok = controller.del_router(body["db"], body["table"])
                    _json(self, 200 if ok else 404, {"ok": ok})
                elif self.path == "/api/pause":
                    _json(self, 200, {"ok": True, "stopped": controller.pause()})
                elif self.path == "/api/resume":
                    controller.resume()
                    _json(self, 200, {"ok": True})
                else:
                    _json(self, 404, {"error": "unknown path"})
            except (KeyError, ValueError) as e:
                _json(self, 400, {"error": str(e)})

        def log_message(self, *args):  # silence request logging
            pass

    server = HTTPServer(("127.0.0.1", port), Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server
