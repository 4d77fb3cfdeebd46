"""StarRocks/Doris stream-load as a native Spark SINK — Spark 4's
Python DataSource writer API (``writeStream.format("qin_streamload")``).

The foreachBatch loader (sinks/starrocks.py) stays the labeled
effectively-once path (labels need the batch id at POST time, which the
DSv2 write path only reveals at commit); this sink is the idiomatic
``writeStream`` packaging of the same wire contract for pipelines that
want a declarative sink line instead of a callback:

    rows = streamload_rows(changes)              # JVM-side formatting
    (rows.writeStream.format("qin_streamload")
         .option("host", "fe").option("load-port", 8030)
         .option("database", "dw").option("table", "orders")
         .option("columns", "id,name")
         .option("checkpointLocation", ckpt).start())

Input contract: a single string column ``value`` holding one JSON row
per record (produced by :func:`qin_cdc_spark.sinks.starrocks.
streamload_rows` — keeps row formatting JVM-side; the Python writer
only chunks and POSTs).  Executor-parallel: each partition POSTs its
own slice, the driver sees only commit messages (row counts).  Retry =
the loader's linear backoff inside each partition write; a failed
partition fails the batch and Spark replays it (at-least-once, same as
the reference).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    WriterCommitMessage,
)


@dataclass
class _LoadCommit(WriterCommitMessage):
    n_rows: int


class StreamLoadStreamWriter(DataSourceStreamWriter):
    def __init__(self, options: dict):
        required = ["host", "load-port", "database", "table", "columns"]
        missing = [k for k in required if not options.get(k)]
        if missing:
            raise ValueError(f"qin_streamload missing options: {missing}")
        self.options = dict(options)

    def _loader(self):
        from qin_cdc_spark.sinks.starrocks import StarRocksStreamLoad

        o = self.options
        return StarRocksStreamLoad(
            host=o["host"],
            load_port=int(o["load-port"]),
            database=o["database"],
            table=o["table"],
            username=o.get("username", "root"),
            password=o.get("password", ""),
            columns=o["columns"].split(","),
            batch_size=int(o.get("batch-size", 0) or 10240),
            dialect=o.get("dialect", "starrocks"),
        )

    def write(self, iterator) -> _LoadCommit:
        loader = self._loader()
        chunk: list[str] = []
        n = 0
        for row in iterator:
            chunk.append(row.value)
            n += 1
            if len(chunk) >= loader.batch_size:
                loader.send(chunk)
                chunk = []
        if chunk:
            loader.send(chunk)
        return _LoadCommit(n_rows=n)

    def commit(self, messages, batchId) -> None:  # noqa: N803 — API contract
        # loads are already durable per-partition; nothing to finalize.
        pass

    def abort(self, messages, batchId) -> None:  # noqa: N803 — API contract
        # at-least-once: the replayed batch re-POSTs; targets converge
        # via the engine's LWW / delete-sign semantics.
        pass


class StreamLoadDataSource(DataSource):
    """``format("qin_streamload")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "qin_streamload"

    def schema(self) -> str:
        return "value string"

    def streamWriter(self, schema, overwrite):  # noqa: N802 — API contract
        return StreamLoadStreamWriter(self.options)


def register(spark) -> None:
    spark.dataSource.register(StreamLoadDataSource)
