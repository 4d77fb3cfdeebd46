"""StarRocks / Doris stream-load sink (SURVEY §2.A A22/A23).

Reference parity (outputs/starrocks/starrocks.go:136-208,
starrocks_utils.go:12-70; outputs/doris/doris.go:136-210,
doris_utils.go:13-22).  The two dialects share the envelope — JSON
array body, ``_delete_sign_`` virtual column, PUT, retry — and differ
ONLY in how delete rows are signalled to the FE:

- StarRocks maps the sign column onto the engine op code via the
  columns header: ``columns: c1,…,_delete_sign_, __op = _delete_sign_``
  (starrocks.go:177-183).
- Doris instead sends ``merge_type: MERGE`` + ``delete:
  _delete_sign_=1`` headers and a plain ``columns: c1,…,_delete_sign_``
  with no ``__op`` mapping (doris.go:177-186, doris_utils.go:22).

Shared contract:

- rows serialize to a JSON array; every row carries the virtual
  ``_delete_sign_`` column (0 = upsert, 1 = delete) —
  starrocks_utils.go:39-70 / doris_utils.go:42-70
- HTTP PUT to ``/api/{db}/{table}/_stream_load`` with headers
  ``Authorization: Basic``, ``Expect: 100-continue``,
  ``strict_mode: true``, ``format: json``, ``strip_outer_array: true``
- response body is JSON; ``Status != "Success"`` raises with Message +
  ErrorURL — starrocks.go:192-205 / doris.go:192-205
- retry with linear backoff RetryInterval·(attempt+1), RetryCount
  attempts — starrocks.go:148-160 / doris.go:148-160

Spark-first split: FORMATTING is a column expression
(:func:`streamload_rows` — JVM ``to_json``, zero Python per row); the
HTTP POST fans out per partition (:meth:`StarRocksStreamLoad.
load_batch`), so at scale each executor streams its own slice to the
FE/BE — the driver never materializes the batch.  Tested against a
canned local HTTP server (no StarRocks in this container).
"""

from __future__ import annotations

import base64
import json
import time
import urllib.error
import urllib.request

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DELETE_COLUMN = "_delete_sign_"  # starrocks_utils.go:16 / doris_utils.go:18
DEFAULT_BATCH_SIZE = 10240  # starrocks_utils.go:14
DEFAULT_BATCH_INTERVAL_MS = 3000  # starrocks_utils.go:15
RETRY_COUNT = 3  # starrocks_utils.go:17
RETRY_INTERVAL_S = 5  # starrocks_utils.go:18
DELETE_CONDITION = f"{DELETE_COLUMN}=1"  # doris_utils.go:22


class StreamLoadError(RuntimeError):
    """Non-Success stream-load response (Message + ErrorURL carried)."""


def streamload_rows(
    df: DataFrame, *, op_col: str = "op", seq_col: str = "seq", ts_col: str = "ts"
) -> DataFrame:
    """Envelope/typed change rows → one JSON string per row with the
    ``_delete_sign_`` virtual column (0 upsert / 1 delete) appended —
    the reference's generateJson as a single JVM expression."""
    payload = [c for c in df.columns if c not in {op_col, seq_col, ts_col}]
    sign = F.when(F.col(op_col) == "delete", 1).otherwise(0)
    return df.select(
        F.to_json(
            F.struct(*[F.col(c) for c in payload], sign.alias(DELETE_COLUMN))
        ).alias("value")
    )


class StarRocksStreamLoad:
    """One table's stream-load channel (host, auth, headers, retry).

    ``dialect`` selects the delete-signalling convention:
    ``"starrocks"`` (default, ``__op`` columns mapping) or ``"doris"``
    (``merge_type: MERGE`` + ``delete`` headers).  Everything else is
    shared — see module docstring.
    """

    DIALECTS = ("starrocks", "doris")

    def __init__(
        self,
        *,
        host: str,
        load_port: int,
        database: str,
        table: str,
        username: str = "root",
        password: str = "",
        columns: list[str],
        batch_size: int = DEFAULT_BATCH_SIZE,
        retry_count: int = RETRY_COUNT,
        retry_interval_s: float = RETRY_INTERVAL_S,
        sleep=time.sleep,
        dialect: str = "starrocks",
        label_prefix: str | None = None,
    ):
        if dialect not in self.DIALECTS:
            raise ValueError(f"dialect must be one of {self.DIALECTS}, got {dialect!r}")
        self.dialect = dialect
        # Deterministic load labels (the reference carries the header
        # commented out, starrocks.go:173 / doris.go:175): both FEs
        # reject a duplicate label within the retention window, so a
        # replayed micro-batch's chunks — which regenerate the SAME
        # labels — are deduplicated server-side and at-least-once
        # delivery becomes effectively-once on the wire.  None = no
        # label header (the reference's shipped behavior).
        self.label_prefix = label_prefix
        self.host = host
        self.load_port = load_port
        self.database = database
        self.table = table
        self.username = username
        self.password = password
        self.columns = list(columns)
        self.batch_size = batch_size
        self.retry_count = retry_count
        self.retry_interval_s = retry_interval_s
        self._sleep = sleep

    @property
    def url(self) -> str:
        return (
            f"http://{self.host}:{self.load_port}/api/"
            f"{self.database}/{self.table}/_stream_load"
        )

    def headers(self) -> dict[str, str]:
        auth = base64.standard_b64encode(
            f"{self.username}:{self.password}".encode()
        ).decode()
        cols = ",".join([*self.columns, DELETE_COLUMN])
        hdrs = {
            "Authorization": f"Basic {auth}",
            "Expect": "100-continue",
            "strict_mode": "true",
            "format": "json",
            "strip_outer_array": "true",
        }
        if self.dialect == "doris":
            # doris.go:177-186: MERGE load + delete predicate on the sign
            # column; columns header has NO __op mapping
            hdrs["merge_type"] = "MERGE"
            hdrs["delete"] = DELETE_CONDITION
            hdrs["columns"] = cols
        else:
            # starrocks.go:177-183: __op mapping — the delete-sign column
            # drives upsert-vs-delete
            hdrs["columns"] = f"{cols}, __op = {DELETE_COLUMN}"
        return hdrs

    def send(self, json_rows: list[str], *, label: str | None = None) -> dict:
        """PUT one chunk; returns the parsed response map.  Retries with
        the reference's linear backoff; raises StreamLoadError after the
        final attempt.  ``label`` (if given) rides the stream-load
        ``label`` header — the FE's dedup key for the load."""
        if not json_rows:
            return {"Status": "Success", "NumberLoadedRows": 0}
        body = ("[" + ",".join(json_rows) + "]").encode()
        hdrs = self.headers()
        if label is not None:
            hdrs["label"] = label
        last_err: Exception | None = None
        for attempt in range(self.retry_count):
            try:
                req = urllib.request.Request(
                    self.url, data=body, headers=hdrs, method="PUT"
                )
                with urllib.request.urlopen(req) as resp:
                    result = json.loads(resp.read().decode())
                if result.get("Status") != "Success":
                    raise StreamLoadError(
                        f"{result.get('Message')}, targetTable: "
                        f"{self.database}.{self.table}, visit ErrorURL to view "
                        f"error details, ErrorURL: {result.get('ErrorURL')}"
                    )
                return result
            except Exception as e:  # noqa: BLE001 — retry both transport+status
                last_err = e
                if attempt + 1 < self.retry_count:
                    self._sleep(self.retry_interval_s * (attempt + 1))
        raise StreamLoadError(str(last_err)) from last_err

    def load_batch(self, changes: DataFrame, batch_id: int | None = None) -> None:
        """foreachBatch body: format JVM-side, then POST per partition
        from the executors in ``batch_size`` chunks — the scale path; no
        driver-side materialization of the batch.

        With ``label_prefix`` set, each chunk carries a DETERMINISTIC
        label ``{prefix}_{batch_id}_{partition_id}_{chunk_idx}``: a
        checkpoint-replayed batch regenerates the same labels, so the
        FE drops the duplicate loads (label dedup) instead of
        double-applying — at-least-once delivery, effectively-once
        ingestion."""
        rows = streamload_rows(changes)
        url, hdrs = self.url, self.headers()
        size, retries, interval, sleep = (
            self.batch_size,
            self.retry_count,
            self.retry_interval_s,
            self._sleep,
        )
        label_prefix = self.label_prefix

        def _post_partition(it):
            from pyspark import TaskContext

            ctx = TaskContext.get()
            pid = ctx.partitionId() if ctx is not None else 0
            chunk: list[str] = []
            chunk_idx = 0

            def flush():
                nonlocal chunk_idx
                if not chunk:
                    return
                body = ("[" + ",".join(chunk) + "]").encode()
                send_hdrs = dict(hdrs)
                if label_prefix is not None and batch_id is not None:
                    send_hdrs["label"] = (
                        f"{label_prefix}_{batch_id}_{pid}_{chunk_idx}"
                    )
                chunk_idx += 1
                last = None
                for attempt in range(retries):
                    try:
                        req = urllib.request.Request(
                            url, data=body, headers=send_hdrs, method="PUT"
                        )
                        with urllib.request.urlopen(req) as resp:
                            result = json.loads(resp.read().decode())
                        if result.get("Status") != "Success":
                            raise StreamLoadError(str(result.get("Message")))
                        return
                    except Exception as e:  # noqa: BLE001
                        last = e
                        if attempt + 1 < retries:
                            sleep(interval * (attempt + 1))
                raise StreamLoadError(str(last)) from last

            for r in it:
                chunk.append(r.value)
                if len(chunk) >= size:
                    flush()
                    chunk.clear()
            flush()

        rows.foreachPartition(_post_partition)

    def foreach_batch(self):
        """Adapter for ``writeStream.foreachBatch`` /
        ``CdcStreamRoute``-style wiring."""
        return lambda df, batch_id: self.load_batch(df, batch_id)


class DorisStreamLoad(StarRocksStreamLoad):
    """Doris-dialect stream-load channel (A23): identical envelope, but
    delete rows are signalled with ``merge_type: MERGE`` + ``delete:
    _delete_sign_=1`` headers instead of StarRocks' ``__op`` columns
    mapping — outputs/doris/doris.go:136-210, doris_utils.go:13-22."""

    def __init__(self, **kwargs):
        kwargs.setdefault("dialect", "doris")
        if kwargs["dialect"] != "doris":
            raise ValueError("DorisStreamLoad is always dialect='doris'")
        super().__init__(**kwargs)
