"""Binlog-tail streaming source via Spark 4's Python DataSource API —
the A1/A5-A6 position-tracking contract on a public, pluggable surface.

``file_envelope_stream`` already stands in for the binlog tail with
Spark's built-in file source, but its offset bookkeeping is opaque.
This source makes the reference's position semantics EXPLICIT
(inputs/mysql/mysql_position.go:150-170: position = binlog file+pos,
persisted, resumed): the offset is a plain ``{"index": N}`` dict over
the stable file order of an append-only envelope directory — the
direct analog of a binlog file sequence — and Spark checkpoints it
through ``initialOffset``/``latestOffset``/``partitions``/``commit``
exactly like the reference persists its position store.

Scale/shape notes: one ``InputPartition`` per file (reads parallelize
across executors), rows ship as Arrow RecordBatches (no per-row Python
cost beyond pyarrow's parquet reader).  Restart replays only the
un-committed tail — at-least-once, converged by the idempotent LWW
merge like every other source here.

Usage::

    from qin_cdc_spark.sources.binlog_dir import register
    register(spark)
    env = (spark.readStream.format("qin_binlog_dir")
                .option("path", envelope_dir).load())
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

# Column order must match ENVELOPE_SCHEMA (cdc/envelope.py)
ENVELOPE_DDL = (
    "db string, table string, op string, seq long, ts timestamp, "
    "schema_version int, data string, old string"
)
_COLUMNS = ["db", "table", "op", "seq", "ts", "schema_version", "data", "old"]


def _stable_files(path: str) -> list[str]:
    """Deterministic append-order listing: (mtime_ns, name) sorts
    earlier appends first and breaks same-instant ties by name."""
    if not os.path.isdir(path):
        return []
    out = []
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for f in files:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                full = os.path.join(root, f)
                out.append((os.stat(full).st_mtime_ns, full))
    return [f for _, f in sorted(out)]


class _FilePartition(InputPartition):
    def __init__(self, file_path: str):
        self.file_path = file_path


class BinlogDirStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("qin_binlog_dir requires option 'path'")
        self.path = path

    def initialOffset(self) -> dict:  # noqa: N802 — API contract
        return {"index": 0}

    def latestOffset(self) -> dict:  # noqa: N802 — API contract
        return {"index": len(_stable_files(self.path))}

    def partitions(self, start: dict, end: dict):
        files = _stable_files(self.path)
        return [
            _FilePartition(f) for f in files[start["index"] : end["index"]]
        ]

    def read(self, partition: _FilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        table = pq.read_table(partition.file_path)
        # project to the envelope column order (extra columns dropped,
        # order pinned so Arrow batches line up with the schema) and
        # cast to Spark-compatible Arrow types: parquet fixtures carry
        # ns timestamps, which Spark's Arrow bridge rejects
        table = table.select(_COLUMNS).cast(
            pa.schema(
                [
                    ("db", pa.string()),
                    ("table", pa.string()),
                    ("op", pa.string()),
                    ("seq", pa.int64()),
                    ("ts", pa.timestamp("us")),
                    ("schema_version", pa.int32()),
                    ("data", pa.string()),
                    ("old", pa.string()),
                ]
            )
        )
        yield from table.to_batches()

    def commit(self, end: dict) -> None:
        # Spark's checkpoint IS the position store (A31); nothing extra
        # to persist source-side for a directory tail.
        pass


class BinlogDirDataSource(DataSource):
    """``format("qin_binlog_dir")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "qin_binlog_dir"

    def schema(self) -> str:
        return ENVELOPE_DDL

    def streamReader(self, schema):  # noqa: N802 — API contract
        return BinlogDirStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the source with a session."""
    spark.dataSource.register(BinlogDirDataSource)
