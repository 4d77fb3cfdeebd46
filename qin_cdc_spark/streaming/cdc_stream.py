"""Structured Streaming CDC apply — the reference's full pipeline, live.

Reference parity (SURVEY §3.2): binlog tail → channel → transforms →
micro-batch buffer → per-table apply → position checkpoint maps to
``readStream`` → Catalyst plan → trigger micro-batch → ``foreachBatch``
LWW merge → Spark checkpoint (offsets+commits).  The reference's
batch-size / batch-interval-ms knobs (outputs/*/…_utils.go defaults
10240 rows / 3000 ms) map to ``maxFilesPerTrigger``-style source rate
limits and ``trigger(processingTime=…)``.

Delivery semantics: Spark's checkpoint gives exactly-once offsets per
batch; the merge itself is idempotent under replay (max-seq wins), so
at-least-once re-delivery after a crash — the reference's model,
inputs/mysql/mysql_position.go:150-170 — converges to the same state.

Sink note: locally the target is a parquet directory swapped atomically
per batch (read-merge-rewrite).  On a production deployment the target
is a Delta/Iceberg table and the body of ``_merge_batch`` becomes a
``MERGE INTO`` — file-skipping on pk statistics replaces the rewrite, so
per-batch cost scales with touched files, not table size.
"""

from __future__ import annotations

import os
import re
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType

from qin_cdc_spark.cdc.apply import decode_envelope, latest_by_key

# Routes default to the bucketed target: per-batch merge cost must scale
# with |batch keys|, not |table| — the flat full-rewrite table is the
# explicit opt-out (n_buckets=0) for tiny reference/dimension tables.
DEFAULT_N_BUCKETS = 32


def _align_to_incoming(current: DataFrame, incoming: DataFrame) -> DataFrame:
    """Cast the STORED side's columns to the incoming batch's types
    where they differ — the merge half of MODIFY-column schema
    evolution (A12).  Evolution direction is always toward the
    registry's current (incoming) schema; without this, the union's
    implicit coercion picks an arbitrary common type and a widened
    int→varchar column crashes the stream on the first non-numeric
    value."""
    inc = {f.name: f.dataType for f in incoming.schema.fields}
    cols = []
    for f in current.schema.fields:
        t = inc.get(f.name)
        if t is not None and t != f.dataType:
            cols.append(F.col(f.name).cast(t).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return current.select(*cols)


def _rename_forward(df: DataFrame, renames: dict[str, str]) -> DataFrame:
    """Rename a decoded segment's columns forward through a later
    rename, so every segment of a DDL-split batch presents the FINAL
    column names to the single merge.  Simultaneous application — a
    SWAP mapping must not collide mid-way."""
    from qin_cdc_spark.streaming.rename_plan import rename_frame

    return rename_frame(df, renames)


def egress_hwm(egress_dir: str) -> int:
    """Largest emitted v_to — parsed from the final dir names, so
    progress is exactly the set of fully-published emissions."""
    if not os.path.isdir(egress_dir):
        return 0
    hwm = 0
    for d in os.listdir(egress_dir):
        if d.startswith("v") and "-" in d and ".stage-" not in d:
            try:
                hwm = max(hwm, int(d.split("-", 1)[1]))
            except ValueError:
                continue
    return hwm


# Per-publication schema sidecar: the payload schema the publication's
# messages were produced under.  The leading underscore keeps Spark's
# parquet listing from reading it as data.
EGRESS_SCHEMA_NAME = "_egress_schema.json"


def _read_egress_schema(pub_dir: str) -> list | None:
    p = os.path.join(pub_dir, EGRESS_SCHEMA_NAME)
    if not os.path.exists(p):
        return None  # pre-feature publication: schema unknown
    import json

    with open(p) as f:
        return json.load(f)["columns"]


def _write_egress_schema(pub_dir: str, columns: list) -> None:
    import json

    with open(os.path.join(pub_dir, EGRESS_SCHEMA_NAME), "w") as f:
        json.dump({"columns": columns}, f)


_RENAME_TABLE_RE = re.compile(
    r"^RENAME TABLE `[^`]*`\.`(?P<a>[^`]*)` TO `[^`]*`\.`(?P<b>[^`]*)`$"
)


def emit_store_egress(
    store,
    egress_dir: str,
    *,
    fmt: str = "default",
    database: str,
    table_name: str,
) -> tuple[int, int] | None:
    """Wire-format egress for ANY versioned store (a synced target, an
    MV's bucketed state, a partitioned fact): emit its CDF since the
    directory's high-water mark as reference-format messages into a
    range-named publication.  Crash-safe by construction — see
    CdcStreamRoute.emit_egress, which delegates here.  Streaming a
    DERIVED view downstream is the same call over ``mv.store``.

    DDL OVER THE WIRE: each publication records the payload schema it
    was produced under (``_egress_schema.json``, written inside the
    stage dir so it publishes atomically with the messages).  When the
    store's schema has CHANGED since the previous publication — an
    upstream ALTER flowed into the store mid-stream — the emission
    prepends one DDL control message (``schema_change_ddl``: the exact
    ALTER the consumer's registry needs) so a relay consumer evolves
    its bound schema instead of silently nulling the new column.  The
    reference carries DDL as first-class events and decodes in-flight
    rows with their producing-time schema (core/msg.go:24-28,
    outputs/kafka/kafka.go:135-141); its kafka formatter drops them
    (isDdl hard-false) — this closes that relay-loop gap.  A previous
    publication without a sidecar (pre-feature) emits no DDL message
    and starts recording from this one."""
    v_cur = store.current_version()
    hwm = egress_hwm(egress_dir)
    if v_cur <= hwm:
        return None
    from qin_cdc_spark.cdc.ddl_parse import evolve_simple_cols
    from qin_cdc_spark.sinks.kafka import (
        cdf_canal_messages,
        cdf_json_messages,
        ddl_canal_message,
        ddl_json_message,
        requalify_alter,
        schema_change_ddl,
    )

    cdf = store.changes_between(hwm, v_cur, include_preimage=True)
    if fmt == "canal":
        msgs = cdf_canal_messages(
            store, hwm, v_cur, database=database, table_name=table_name, cdf=cdf
        )
    else:
        msgs = cdf_json_messages(
            store, hwm, v_cur, database=database, table_name=table_name, cdf=cdf
        )
    # the sidecar schema comes from the CDF's POSTIMAGE columns — the
    # to-snapshot's schema, resolved by the same inference the message
    # plan needs anyway.  A separate store.read().schema would re-infer
    # over every current dir (a partitioned store unions ALL partitions
    # — measured ~×1.4 on cdc_partitioned_drop_egress before this).
    cur_cols = [
        [f.name, f.dataType.simpleString()]
        for f in cdf.schema.fields
        if f.name != "_change" and not f.name.startswith("_pre_")
    ]
    prev_cols = None
    cover = _egress_coverage(egress_dir)
    if cover:
        prev_cols = _read_egress_schema(os.path.join(egress_dir, cover[-1]))
    if prev_cols is not None:
        # VERBATIM-FIRST (VERDICT r8 #1): upstream DDL recorded against
        # the emitted version range forwards as-is (re-qualified under
        # the egress names), so a RENAME COLUMN crosses the wire as a
        # rename — values intact downstream — instead of the diff's
        # DROP+ADD.  The name-based diff remains as the RESIDUAL: the
        # previous sidecar schema evolves through the forwarded
        # statements, and any remaining movement (a transform change, a
        # statement lost to a pre-attach crash) still emits, so the
        # consumer's registry can never silently diverge.
        #
        # RENAME TABLE (VERDICT r9 #3): a window spanning a table
        # rename requalifies each statement under the name the feed had
        # AT THAT STATEMENT — ALTERs ledgered before the rename carry
        # the old table, the rename itself forwards with the egress
        # database on both sides, later ALTERs carry the new table.
        # The start name unwinds from the emission-time name through
        # the window's rename statements.
        raw = (
            store.ddl_between(hwm, v_cur)
            if hasattr(store, "ddl_between")
            else []
        )
        rt = [(_RENAME_TABLE_RE.match(s), s) for s in raw]
        start_name = table_name
        for m, _s in reversed(rt):
            if m and m.group("b") == start_name:
                start_name = m.group("a")
        stmts = []
        evolved = prev_cols
        cur_name = start_name
        for m, s in rt:
            if m:
                if m.group("a") == cur_name:
                    stmts.append(
                        f"RENAME TABLE `{database}`.`{cur_name}` "
                        f"TO `{database}`.`{m.group('b')}`"
                    )
                    cur_name = m.group("b")
                continue
            q = requalify_alter(s, database, cur_name)
            stmts.append(q)
            evolved = evolve_simple_cols(evolved, q, database, cur_name)
        residual = schema_change_ddl(database, table_name, evolved, cur_cols)
        if residual is not None:
            stmts.append(residual)
        if stmts:
            # ONE control message carrying the ;-joined statements:
            # order is preserved inside the string (within a
            # publication every message shares the same feed position,
            # so separate messages would lose DDL ordering), and both
            # the registry path and the route segmentation path apply
            # multi-statement SQL atomically in sequence.
            sql_all = "; ".join(stmts)
            spark = msgs.sparkSession
            ctl = (
                ddl_canal_message(
                    spark, database=database, table=table_name, sql=sql_all
                )
                if fmt == "canal"
                else ddl_json_message(
                    spark, database=database, table=table_name, sql=sql_all
                )
            )
            msgs = ctl.unionByName(msgs)
    os.makedirs(egress_dir, exist_ok=True)
    final = os.path.join(egress_dir, f"v{hwm}-{v_cur}")
    if os.path.isdir(final):
        return None  # replayed emission: already published
    stage = f"{final}.stage-{uuid.uuid4().hex[:8]}"
    # _v_to is the broker-offset analog: the wire bytes live in `value`,
    # but a consumer folding per-key diffs needs each message's position
    # in the feed, and the dir NAME stops carrying it the moment
    # compaction combines ranges — the column survives compaction.
    msgs.withColumn("_v_to", F.lit(int(v_cur)).cast("long")).write.parquet(stage)
    _write_egress_schema(stage, cur_cols)  # atomic with the rename below
    os.rename(stage, final)
    return (hwm, v_cur)


def _egress_ranges(egress_dir: str) -> list[tuple[int, int, str]]:
    """Published (v_from, v_to, dirname) tuples, stage residue excluded."""
    if not os.path.isdir(egress_dir):
        return []
    out = []
    for d in os.listdir(egress_dir):
        if not d.startswith("v") or ".stage-" in d:
            continue
        try:
            a, b = d[1:].split("-", 1)
            out.append((int(a), int(b), d))
        except ValueError:
            continue
    return sorted(out, key=lambda t: (t[0], -t[1]))


def _egress_coverage(egress_dir: str) -> list[str]:
    """Maximal non-overlapping publication set covering [0, hwm] —
    widest range wins at each boundary, subsumed ranges (compaction
    crash residue) are ignored.  Every publication starts at the
    then-current hwm, so ranges always align on boundaries."""
    picked, end = [], 0
    for a, b, d in _egress_ranges(egress_dir):
        if a == end and b > end:
            picked.append(d)
            end = b
        # a < end → subsumed by a wider earlier pick; a > end cannot
        # occur (emissions are contiguous from the hwm)
    return picked


# Every egress publication file carries exactly this shape; declaring
# it (instead of mergeSchema) spares a footer-merge job per read and
# still reads pre-feature publications (a missing _v_to yields nulls).
EGRESS_WIRE_SCHEMA = "key string, value string, _v_to long"


def read_store_egress(spark: SparkSession, egress_dir: str) -> DataFrame | None:
    """All published egress messages (key, value, _v_to) under
    ``egress_dir`` (coverage-selected, so compaction crash residue never
    double-reads)."""
    dirs = [os.path.join(egress_dir, d) for d in _egress_coverage(egress_dir)]
    if not dirs:
        return None
    return spark.read.schema(EGRESS_WIRE_SCHEMA).parquet(*dirs)


def egress_coverage_until(
    ranges: list[tuple[int, int, str]], v_to: int
) -> tuple[list[str] | None, str | None]:
    """THE boundary-reconstruction rule — the single source of truth
    shared by the reader (``read_store_egress_until``) and the checker
    (``fsck._boundary_reconstructible``), so the two can never diverge
    on crash residue again: ``ranges`` sorted by ``(v_from, -v_to)``,
    widest publication wins at each coverage boundary, and if the
    widest candidate at a boundary CROSSES ``v_to`` the boundary is
    unreadable (a narrower subsumed dir underneath it is compaction
    residue the reader never falls back to — the next compaction
    deletes it).  Returns ``(picked_dirs, None)`` when publications
    with the rule tile ``[0, v_to]`` exactly, else ``(None, reason)``."""
    picked, end = [], 0
    for a, b, d in ranges:
        if a == end and b > end:
            if b > v_to:
                return None, (
                    f"publication {d} crosses it (compacted past the "
                    "coordinate?)"
                )
            picked.append(d)
            end = b
        if end == v_to:
            return picked, None
    if end != v_to:
        return None, f"publications cover [0, {end}]"
    return picked, None


def read_store_egress_until(
    spark: SparkSession, egress_dir: str, v_to: int
) -> DataFrame | None:
    """Published egress messages covering EXACTLY ``[0, v_to]`` — the
    consistent-replay read: a consumer rebuilding a table as of a
    coordinator-stamped batch boundary must stop at that boundary, and
    a publication whose range CROSSES it cannot be cut (per-key diffs
    don't decompose).  Raises when compaction has subsumed the boundary
    — the retention statement a consumer needs to hear, exactly like
    ``read_at`` on a gc-expired version."""
    if v_to <= 0:
        return None
    picked, reason = egress_coverage_until(_egress_ranges(egress_dir), v_to)
    if picked is None:
        raise ValueError(
            f"egress boundary {v_to} not reconstructible at "
            f"{egress_dir}: {reason}"
        )
    return spark.read.schema(EGRESS_WIRE_SCHEMA).parquet(
        *[os.path.join(egress_dir, d) for d in picked]
    )


def replay_egress_state(
    msgs: DataFrame, data_schema, keys: list[str]
) -> DataFrame:
    """Consumer-side state fold over default-format wire messages: the
    table's live rows as of the feed's end.  Each publication carries at
    most one diff per key, so the state is the LATEST message per key in
    feed order (``_v_to``, the broker-offset analog), minus deletes —
    the same LWW fold every reference consumer applies.  ``data_schema``
    may be a SUBSET of the emitted columns (project what you need; the
    JSON parse ignores the rest) but must include ``keys``.  One shuffle
    on the keys; scale is O(messages).

    Latest-per-key is ``max_by`` over ``_v_to`` (OPTIMIZATION_r10), not
    a window ``row_number``: partial (map-side) aggregation means the
    key shuffle carries at most one row per key per input partition and
    there is no per-partition sort — the repo-wide ``latest_by_key``
    doctrine (cdc/apply.py) applied to the consumer fold.  Ties cannot
    happen: each publication carries at most one diff per key, so
    (key, _v_to) is unique by construction."""
    from pyspark.sql.types import StringType, StructField

    parse_schema = StructType(
        [StructField("type", StringType()), StructField("data", data_schema)]
    )
    parsed = msgs.select(
        F.from_json(F.col("value"), parse_schema).alias("m"), "_v_to"
    ).select("m.type", "m.data.*", "_v_to")
    # DDL control messages are keyless metadata, never state rows —
    # without this filter a feed carrying one would fold a spurious
    # null-key row into the state
    parsed = parsed.filter(F.col("type") != "ddl")
    payload = [c for c in parsed.columns if c not in {*keys, "_v_to"}]
    last = parsed.groupBy(*keys).agg(
        F.max_by(
            F.struct(*[F.col(c) for c in payload]), F.col("_v_to")
        ).alias("_last")
    )
    # reassemble in the parsed column order (minus type/_v_to), so the
    # output schema is identical to the window formulation's
    out_cols = [c for c in parsed.columns if c not in {"type", "_v_to"}]
    return last.filter(F.col("_last.type") != "delete").select(
        *[
            F.col(c) if c in keys else F.col(f"_last.{c}").alias(c)
            for c in out_cols
        ]
    )


def envelope_from_egress(
    msgs: DataFrame, *, db: str | None = None, table: str | None = None
) -> DataFrame:
    """Default-format wire messages → CDC envelope rows: the CONSUMER
    half of the relay loop, so a second ``CdcStreamRoute`` (or any
    engine pipeline) can apply another store's egress feed through the
    normal decode → transform → merge path — store → wire → store, the
    reference's MySQL → Kafka → warehouse chain closed entirely
    engine-side.  All JVM-side ``get_json_object`` (``data`` must stay
    a raw JSON string for the envelope; delete messages already name
    the removed row, exactly what ``decode_envelope`` expects).

    ``seq`` = the message's ``_v_to`` (feed order — each publication
    carries at most one diff per key, so per-key LWW over ``_v_to`` is
    exact; ties across keys are irrelevant to LWW).  ``db``/``table``
    override the wire values to re-route the feed (the reference's
    target-table mapping).

    DDL control messages (``type='ddl'``, statement under
    ``data.sql``) become ``op='ddl'`` envelope rows with the raw SQL
    in ``data`` — exactly what ``handle_ddl_rows`` applies to a
    registry, so a relay consumer evolves its schema mid-chain from
    the wire alone."""
    # ONE json_tuple parse per message (OPTIMIZATION_r10): the previous
    # form ran a get_json_object per extracted field — each a full parse
    # of the message — and the envelope is consumed lazily by several
    # downstream jobs, so every job re-paid all of them.  json_tuple
    # parses once and emits all fields; only the (much smaller) data
    # subtree pays a second parse, for the DDL sql unwrap.
    t = msgs.select(
        F.col("_v_to"),
        F.json_tuple(
            F.col("value"), "database", "table", "type", "data", "old"
        ).alias("_db", "_tbl", "_type", "_data", "_old"),
    )
    op = F.col("_type")
    return t.select(
        (F.lit(db) if db else F.col("_db")).alias("db"),
        (F.lit(table) if table else F.col("_tbl")).alias("table"),
        op.alias("op"),
        F.col("_v_to").cast("long").alias("seq"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.lit(None).cast("int").alias("schema_version"),
        F.when(op == "ddl", F.get_json_object(F.col("_data"), "$.sql"))
        .otherwise(F.col("_data"))
        .alias("data"),
        F.col("_old").alias("old"),
    )


def envelope_from_canal_egress(
    msgs: DataFrame, *, db: str | None = None, table: str | None = None
) -> DataFrame:
    """Canal-format sibling of :func:`envelope_from_egress`: canal wraps
    the row in a 1-element ``data`` array, uppercases ``type``, and
    STRINGIFIES every value — the stringified numerics decode correctly
    because ``decode_envelope`` parses schema-tolerantly
    (cdc/apply.py::parse_row).  ``seq`` = ``_v_to`` feed order, NOT the
    canal ``id`` the live-source decoder uses
    (sources/kafka_source.py::decode_canal_envelope) — egress stamps
    ``id: 0`` on every message, so feed order is the only total order
    on the wire.

    ``isDdl: true`` messages become ``op='ddl'`` rows carrying the raw
    statement from the wire's ``sql`` field (the canal DDL convention),
    feeding the same ``handle_ddl_rows`` → registry path as a live
    canal source."""
    # ONE json_tuple parse per message (OPTIMIZATION_r10) — canal
    # messages are the big ones (per-message sqlType/mysqlType maps),
    # and the previous 8 get_json_object calls each re-parsed the full
    # message in EVERY job that consumed the lazy envelope (measured:
    # the relay consumer's DDL scan alone burned 300 s of executor CPU
    # at sf0.1; ~40 s after).  Only the 1-element data/old arrays pay a
    # second parse, on their own (small) subtree, for the [0] unwrap.
    t = msgs.select(
        F.col("_v_to"),
        F.json_tuple(
            F.col("value"), "database", "table", "type", "isDdl", "sql",
            "data", "old",
        ).alias("_db", "_tbl", "_type", "_isddl", "_sql", "_data", "_old"),
    )
    is_ddl = F.col("_isddl") == F.lit("true")
    return t.select(
        (F.lit(db) if db else F.col("_db")).alias("db"),
        (F.lit(table) if table else F.col("_tbl")).alias("table"),
        F.when(is_ddl, F.lit("ddl"))
        .otherwise(F.lower(F.col("_type")))
        .alias("op"),
        F.col("_v_to").cast("long").alias("seq"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.lit(None).cast("int").alias("schema_version"),
        F.when(is_ddl, F.col("_sql"))
        .otherwise(F.get_json_object(F.col("_data"), "$[0]"))
        .alias("data"),
        F.get_json_object(F.col("_old"), "$[0]").alias("old"),
    )


def _combine_publications(
    spark: SparkSession, egress_dir: str, seg: list[tuple[int, int, str]]
) -> tuple[int, int]:
    """Combine one contiguous run of publications into a single
    ``v{lo}-{hi}`` dir.  Crash-safe in the same model as emission: the
    combined dir publishes by rename FIRST, subsumed dirs delete after
    — a crash in between leaves residue that reads ignore (coverage
    rule) and the next compaction removes."""
    lo, hi = seg[0][0], seg[-1][1]
    combined = spark.read.schema(EGRESS_WIRE_SCHEMA).parquet(
        *[os.path.join(egress_dir, d) for _a, _b, d in seg]
    )
    final = os.path.join(egress_dir, f"v{lo}-{hi}")
    stage = f"{final}.stage-{uuid.uuid4().hex[:8]}"
    combined.write.parquet(stage)
    # the combined publication ends where the newest input ended, so it
    # carries that input's schema sidecar (DDL control messages inside
    # the range survive as ordinary rows)
    newest_schema = _read_egress_schema(os.path.join(egress_dir, seg[-1][2]))
    if newest_schema is not None:
        _write_egress_schema(stage, newest_schema)
    os.rename(stage, final)
    # delete everything the combined publication subsumes — the source
    # dirs AND any crash residue inside the range
    for a, b, d in _egress_ranges(egress_dir):
        if d != f"v{lo}-{hi}" and a >= lo and b <= hi:
            shutil.rmtree(os.path.join(egress_dir, d), ignore_errors=True)
    return (lo, hi)


def compact_egress_segments(
    spark: SparkSession, egress_dir: str, boundaries: list[int]
) -> list[tuple[int, int]]:
    """Small-files compaction that PRESERVES named replay boundaries:
    publications combine only WITHIN segments delimited by
    ``boundaries`` (ascending v coordinates — e.g. the coordinator's
    retained stamped v_to's), so ``read_store_egress_until`` keeps
    working for every named boundary after maintenance.  A publication
    already straddling a boundary (from an earlier unrestricted
    compaction) is left alone — there is nothing left to preserve
    inside it.  Returns the combined ranges (segments of one
    publication combine nothing)."""
    bset = {int(x) for x in boundaries}
    cover = set(_egress_coverage(egress_dir))
    ranges = sorted(
        (a, b, d) for a, b, d in _egress_ranges(egress_dir) if d in cover
    )
    segments: list[list[tuple[int, int, str]]] = []
    cur: list[tuple[int, int, str]] = []

    def flush():
        if len(cur) >= 2:
            segments.append(list(cur))
        cur.clear()

    for a, b, d in ranges:
        if a in bset:
            flush()
        if any(a < x < b for x in bset):
            # straddles a boundary (pre-existing) — its own island
            flush()
            continue
        cur.append((a, b, d))
    flush()
    return [_combine_publications(spark, egress_dir, seg) for seg in segments]


def compact_egress(spark: SparkSession, egress_dir: str) -> tuple[int, int] | None:
    """Collapse the accumulated per-batch publications into ONE
    ``v0-{hwm}`` publication — the small-files maintenance a
    long-running relay needs (one dir per micro-batch otherwise grows
    forever).  Unrestricted: replay boundaries inside the combined
    range stop being reconstructible (``read_store_egress_until``
    raises) — use :func:`compact_egress_segments` (or
    ``SnapshotCoordinator.compact_egress``) to preserve them.  Returns
    the combined range, or None when there is nothing to combine."""
    done = compact_egress_segments(spark, egress_dir, [])
    if done:
        return done[0]
    # nothing to combine — but clean any residue a crashed compaction
    # left behind (subsumed dirs under the single cover)
    cover = _egress_coverage(egress_dir)
    for _a, _b, d in _egress_ranges(egress_dir):
        if cover and d != cover[0]:
            shutil.rmtree(os.path.join(egress_dir, d), ignore_errors=True)
    return None


class ParquetUpsertTable:
    """A primary-keyed table materialized as a parquet directory with
    atomic swap-on-write — the local stand-in for a MERGE-capable sink.

    Cross-batch ordering guard (SURVEY §7 "hard parts"): the table
    persists ``_seq`` (the max applied event seq per key) and keeps
    deletes as ``_deleted`` tombstones instead of physically dropping
    them.  Without this, at-least-once redelivery or out-of-order
    micro-batches resurrect rows: a delete applied in batch N would be
    forgotten, and the same key's older insert redelivered in batch N+1
    would win against a target that no longer remembers seq N.  With the
    guard, merge is a pure max-seq LWW over (stored ∪ incoming) and is
    idempotent and order-insensitive across batches.  Tombstones are
    GC-able once the source can no longer redeliver below their seq
    (the reference's 3-second position-lag window,
    inputs/mysql/mysql_position.go:150-170)."""

    def __init__(self, spark: SparkSession, path: str, keys: list[str]):
        self.spark = spark
        self.path = path
        self.keys = keys

    def exists(self) -> bool:
        """True only if the table holds actual data files: an all-
        quarantined (empty) first batch writes a directory with no
        parquet parts, and reading that explodes with
        UNABLE_TO_INFER_SCHEMA — treat it as not-yet-created so the
        next merge takes the bootstrap path."""
        self._recover()
        if not os.path.isdir(self.path):
            return False
        for _root, _dirs, files in os.walk(self.path):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

    def _recover(self) -> None:
        """Crash-window repair.  A swap renames live → ``.old-*`` then
        staged → live; dying between the two renames leaves only the
        ``.old-*`` copy (of the whole table, or of one bucket directory
        in the bucketed subclass).  Restore it before any read or merge,
        so the at-least-once replay sees the pre-crash state instead of
        a missing table/bucket."""
        parent, name = os.path.split(self.path.rstrip("/"))
        if parent and os.path.isdir(parent) and not os.path.exists(self.path):
            olds = sorted(
                d for d in os.listdir(parent) if d.startswith(name + ".old-")
            )
            if olds:
                os.rename(os.path.join(parent, olds[-1]), self.path)
        if os.path.isdir(self.path):
            for d in os.listdir(self.path):
                if ".old-" not in d:
                    continue
                base = os.path.join(self.path, d.split(".old-")[0])
                src = os.path.join(self.path, d)
                if os.path.exists(base):
                    shutil.rmtree(src, ignore_errors=True)  # swap completed
                else:
                    os.rename(src, base)  # swap died mid-flight: restore

    def read(self) -> DataFrame | None:
        """Visible rows (tombstones and bookkeeping columns hidden)."""
        full = self.read_internal()
        if full is None:
            return None
        return full.filter(~F.col("_deleted")).drop("_seq", "_deleted")

    def read_internal(self) -> DataFrame | None:
        if not self.exists():
            return None
        # PLAIN read is safe on the FLAT table: every merge is a whole-
        # directory rewrite, so the files are always schema-uniform.
        # (The bucketed subclass rewrites only touched buckets and
        # reads through its schema manifest instead.)
        return self.spark.read.parquet(self.path)

    def merge(self, changes: DataFrame, *, op_col: str = "op", seq_col: str = "seq") -> None:
        """LWW-merge a (op, seq, *cols) change batch into the table."""
        incoming = changes.select(
            *self.keys,
            *[c for c in changes.columns if c not in {op_col, seq_col, *self.keys}],
            F.col(seq_col).cast("long").alias("_seq"),
            (F.col(op_col) == "delete").alias("_deleted"),
        )
        current = self.read_internal()
        # allowMissingColumns: schema evolution support — a batch decoded
        # under a NEWER schema version (added column) merges into an older
        # table (old rows take NULL), and vice versa for dropped columns;
        # type alignment covers MODIFY-column widening
        # (A12 DDL-apply semantics at the sink).
        union = (
            incoming
            if current is None
            else _align_to_incoming(current, incoming).unionByName(
                incoming, allowMissingColumns=True
            )
        )
        merged = latest_by_key(union, self.keys, seq_col="_seq")
        self._swap_write(merged)

    def gc_tombstones(self, min_live_seq: int) -> None:
        """Drop tombstones no longer reachable by redelivery (their seq
        is below the source's committed low-water mark)."""
        full = self.read_internal()
        if full is None:
            return
        self._swap_write(full.filter(~(F.col("_deleted") & (F.col("_seq") < min_live_seq))))

    RENAME_MARKER = "_last_rename.json"

    def _rename_already_applied(self, stmt_id) -> bool:
        import json

        if stmt_id is None:
            return False
        p = os.path.join(self.path, self.RENAME_MARKER)
        if not os.path.exists(p):
            return False
        with open(p) as f:
            return json.load(f).get("stmt_id") == stmt_id

    def rename_columns(
        self,
        mapping: dict[str, str],
        *,
        missing_ok: bool = False,
        stmt_id=None,
    ) -> None:
        """Value-preserving column rename: the upstream RENAME COLUMN
        applied to the local store, so historical rows keep their data
        under the new name (a unionByName merge alone would strand the
        old column and null the new one — the DROP+ADD failure).  One
        full aligned rewrite (the rule MODIFY already charges — parquet
        column names are physical, so unlike ADD there is no
        metadata-only rename for a plain parquet dir).  Key
        columns may be renamed — ``keys`` follows, and the bucketed
        subclass's placement hashes VALUES, so no row moves.

        The mapping applies SIMULTANEOUSLY (rename_plan.py — ADVICE r9
        + the round-10 swap finding): identity retypes no-op,
        freed-name chains like ``a→b; c→a`` apply, column SWAPS
        ({a: b, b: a} from a legal 3-op ALTER) work, and with
        ``missing_ok=True`` a column added-then-renamed before ever
        materializing skips instead of raising.  Replay idempotence:
        acyclic mappings are detected from the column set; a SWAP's
        replay is not set-detectable, so ``stmt_id`` (the upstream DDL
        row's seq) persists in a marker file STAGED with the rewrite
        (atomic) and a matching replay returns untouched."""
        from qin_cdc_spark.streaming.rename_plan import (
            plan_renames,
            rename_frame,
        )

        if self._rename_already_applied(stmt_id):
            return
        full = self.read_internal()
        if full is None:
            self.keys = [mapping.get(k, k) for k in self.keys]
            return
        applied = plan_renames(full.columns, mapping, missing_ok=missing_ok)
        self.keys = [mapping.get(k, k) for k in self.keys]
        if not applied:
            return
        import json

        marker = None
        if stmt_id is not None:
            marker = {self.RENAME_MARKER: json.dumps({"stmt_id": stmt_id})}
        self._swap_write(rename_frame(full, applied), stage_files=marker)

    def _swap_write(self, df: DataFrame, *, stage_files: dict | None = None) -> None:
        stage = f"{self.path}.stage-{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(stage)
        for name, content in (stage_files or {}).items():
            with open(os.path.join(stage, name), "w") as f:
                f.write(content)
        old = f"{self.path}.old-{uuid.uuid4().hex[:8]}"
        # os.path.exists, not self.exists(): a dataless directory (empty
        # first batch) must still be renamed away or the stage rename fails
        if os.path.exists(self.path):
            os.rename(self.path, old)
        os.rename(stage, self.path)
        if os.path.exists(old):
            shutil.rmtree(old)


class BucketedUpsertTable(ParquetUpsertTable):
    """Hash-bucketed variant: rows land in ``bucket=pmod(hash(pk), N)``
    partitions and a merge rewrites ONLY the buckets touched by the
    batch — per-batch cost scales with |batch keys| not |table|
    (PLANS.md gap #1).  This is the parquet stand-in for what Delta/
    Iceberg MERGE achieves with file-skipping on PK statistics; the
    same hash-bucket layout also makes target-side joins co-located.

    SCHEMA MANIFEST (VERDICT r8 #3): the table's logical schema lives
    in an engine-owned ``_table_schema.json`` beside the data, and
    every read declares it explicitly (``spark.read.schema(…)``) — old
    files missing an added column read typed NULLs with no footer-merge
    job, so ADD COLUMN is a manifest edit plus the normal touched-bucket
    merge: O(delta), not the round-8 O(store) full rewrite (and not the
    measured-2× per-read mergeSchema either).  This is exactly how a
    table format makes evolution a metadata operation, scaled to a
    parquet dir.  Only a TYPE change (MODIFY) still pays the full
    aligned rewrite — parquet files are physically typed, and no
    declared schema can read an int file as a string.

    Dynamic partition overwrite is per-partition, not transactional
    across buckets (a crash mid-write can leave a batch half-applied);
    replaying the batch converges because the merge is idempotent —
    the same at-least-once contract as the rest of the engine.  The
    manifest is crash-consistent the same way: full-dir rewrites stage
    it inside the swap (atomic with the data); the ADD path flips it
    after the bucket swaps, so a crash in between hides the new column
    (a consistent pre-DDL view) until the replay heals it.
    """

    BUCKET_COL = "_bucket"
    SCHEMA_NAME = "_table_schema.json"

    def __init__(self, spark: SparkSession, path: str, keys: list[str], *, n_buckets: int = 32):
        super().__init__(spark, path, keys)
        self.n_buckets = n_buckets

    def _bucket_expr(self):
        return F.pmod(F.hash(*[F.col(k) for k in self.keys]), F.lit(self.n_buckets))

    # -- schema manifest -----------------------------------------------------

    def _read_schema_manifest(self):
        import json

        p = os.path.join(self.path, self.SCHEMA_NAME)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return StructType.fromJson(json.load(f))

    def _write_schema_manifest(self, schema: StructType, dir_path: str | None = None) -> None:
        """Atomic manifest publish (tmp + os.replace).  ``dir_path``
        lets full-rewrite paths stage it INSIDE the pre-swap directory
        so data and schema flip together."""
        import json

        schema = StructType(
            [f for f in schema.fields if f.name != self.BUCKET_COL]
        )
        d = dir_path or self.path
        tmp = os.path.join(d, f".{self.SCHEMA_NAME}.tmp-{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as f:
            json.dump(schema.jsonValue(), f)
        os.replace(tmp, os.path.join(d, self.SCHEMA_NAME))

    def _stored_schema(self):
        """The table's logical schema: the manifest when present, else
        (legacy dir written before the manifest existed) the plan
        schema of a plain read — self-healed into a manifest so the
        probe never runs twice."""
        man = self._read_schema_manifest()
        if man is not None:
            return man
        probe = StructType(
            [
                f
                for f in self.spark.read.parquet(self.path).schema.fields
                if f.name != self.BUCKET_COL
            ]
        )
        self._write_schema_manifest(probe)
        return probe

    def _read_full(self, schema: StructType | None = None) -> DataFrame:
        """Declared-schema read WITH the bucket partition column —
        planning-time metadata only, no footer sampling or merging."""
        if schema is None:
            schema = self._stored_schema()
        full = StructType(
            [*schema.fields, StructField(self.BUCKET_COL, IntegerType())]
        )
        return self.spark.read.schema(full).parquet(self.path)

    def read_internal(self) -> DataFrame | None:
        if not self.exists():
            return None
        return self._read_full().drop(self.BUCKET_COL)

    def read(self) -> DataFrame | None:
        full = self.read_internal()
        if full is None:
            return None
        return full.filter(~F.col("_deleted")).drop("_seq", "_deleted")

    def _pruned_current(self, evolved, incoming: DataFrame) -> DataFrame:
        """Stored rows of exactly the batch's buckets, without a driver
        probe: a broadcast SEMI-JOIN on the bucket partition column that
        dynamic partition pruning turns into a scan-level
        PartitionFilter (``dynamicpruning#...`` — plan-pinned in
        tests/test_opt_internals.py), so only touched bucket dirs are
        opened.  Declared-schema read under the EVOLVED schema: stored
        files missing an added column read typed nulls."""
        bset = incoming.select(self.BUCKET_COL).distinct()
        return self._read_full(evolved).join(
            F.broadcast(bset), self.BUCKET_COL, "left_semi"
        )

    def merge(self, changes: DataFrame, *, op_col: str = "op", seq_col: str = "seq") -> None:
        incoming = changes.select(
            *self.keys,
            *[c for c in changes.columns if c not in {op_col, seq_col, *self.keys}],
            F.col(seq_col).cast("long").alias("_seq"),
            (F.col(op_col) == "delete").alias("_deleted"),
        ).withColumn(self.BUCKET_COL, self._bucket_expr())

        if not self.exists():
            merged = latest_by_key(
                incoming, [*self.keys, self.BUCKET_COL], seq_col="_seq"
            )
            # _swap_write stages the schema manifest inside the swap —
            # data and schema publish together
            self._swap_write(merged)
            return

        stored = self._stored_schema()
        stored_types = {f.name: f.dataType for f in stored.fields}
        inc_fields = [
            f for f in incoming.schema.fields if f.name != self.BUCKET_COL
        ]
        type_changed = any(
            f.name in stored_types and stored_types[f.name] != f.dataType
            for f in inc_fields
        )
        added = [f for f in inc_fields if f.name not in stored_types]
        if type_changed:
            # MODIFY is TABLE-WIDE: parquet files are physically typed —
            # no declared schema can read an int file as a string, so a
            # touched-buckets-only rewrite would leave a directory no
            # single schema can read.  One full aligned rewrite; the
            # manifest flips atomically with the swap.
            current_all = self._read_full(stored).drop(self.BUCKET_COL)
            union = _align_to_incoming(
                current_all, incoming.drop(self.BUCKET_COL)
            ).unionByName(
                incoming.drop(self.BUCKET_COL), allowMissingColumns=True
            )
            merged = latest_by_key(union, self.keys, seq_col="_seq")
            self._swap_write(merged)
            return
        # ADD COLUMN is O(delta): read the stored side under the UNION
        # schema (old files yield typed nulls for the added columns —
        # declared-schema read, no footer merge), run the normal
        # touched-bucket merge, then flip the manifest.  Untouched
        # buckets keep their old physical files and read correctly
        # under the new manifest forever.
        evolved = StructType([*stored.fields, *added]) if added else stored

        # ONE Spark action per merge (OPTIMIZATION_r11, guide §1
        # per-action cost; VERDICT r10 #6): the stored side is pruned to
        # the batch's buckets by a BROADCAST SEMI-JOIN on the bucket
        # partition column instead of a driver-side probe collect —
        # dynamic partition pruning pushes the broadcast bucket set into
        # the scan (a `dynamicpruning` PartitionFilter, plan-asserted in
        # tests), so only touched bucket dirs are opened, exactly like
        # the old isin(touched) literal but without the extra action.
        # The touched set itself is recovered AFTER the write from the
        # stage listing: merged holds at least one row per touched
        # bucket by construction (latest_by_key keeps every key's last
        # row, tombstones included, and each touched bucket has ≥1
        # incoming row), so the staged dirs ARE the touched set.  This
        # is safe for the FLAT store only — the versioned store must
        # know its touched set before minting (and a fully-redelivered
        # batch must mint NO version), which is why it keeps the probe
        # (see versioned.merge).
        incoming = incoming.persist()  # decode once: DPP build + union
        try:
            current = self._pruned_current(evolved, incoming)
            # allowMissingColumns: an incoming batch missing a STORED
            # column keeps it (new rows read null); retyped columns
            # never reach this path (type_changed full rewrite above)
            union = _align_to_incoming(current, incoming).unionByName(
                incoming, allowMissingColumns=True
            )
            merged = latest_by_key(union, [*self.keys, self.BUCKET_COL], seq_col="_seq")
            # co-locate each bucket into one output file (otherwise every
            # shuffle partition writes a sliver of every bucket — 32×32
            # small files per batch and metadata blowup over time)
            merged = merged.repartition(self.n_buckets, F.col(self.BUCKET_COL))
            # one job: write merged buckets to a staging dir (target untouched,
            # so the lazy read of `current` is safe), then swap only the
            # touched bucket directories in — no persist/count materialization
            # pass and no in-place dynamic overwrite hazard
            stage = f"{self.path}.stage-{uuid.uuid4().hex[:8]}"
            merged.write.partitionBy(self.BUCKET_COL).parquet(stage)
            prefix = f"{self.BUCKET_COL}="
            touched = [
                d[len(prefix):]
                for d in os.listdir(stage)
                if d.startswith(prefix)
            ]
            for b in touched:
                src = os.path.join(stage, f"{self.BUCKET_COL}={b}")
                dst = os.path.join(self.path, f"{self.BUCKET_COL}={b}")
                old = f"{dst}.old-{uuid.uuid4().hex[:6]}"
                if os.path.exists(dst):
                    os.rename(dst, old)
                os.rename(src, dst)
                if os.path.exists(old):
                    shutil.rmtree(old)
            shutil.rmtree(stage, ignore_errors=True)
            if added:
                # the O(delta) evolution flip: after the touched-bucket
                # swaps, the manifest gains the added columns — a crash
                # before this line leaves a consistent pre-DDL view (the
                # new column is hidden) that the replayed batch heals
                self._write_schema_manifest(evolved)
        finally:
            incoming.unpersist()

    def _swap_write(self, df: DataFrame, *, stage_files: dict | None = None) -> None:
        # keep the bucket layout on full rewrites (gc_tombstones path)
        if self.BUCKET_COL not in df.columns:
            df = df.withColumn(self.BUCKET_COL, self._bucket_expr())
        stage = f"{self.path}.stage-{uuid.uuid4().hex[:8]}"
        df.write.partitionBy(self.BUCKET_COL).mode("overwrite").parquet(stage)
        for name, content in (stage_files or {}).items():
            with open(os.path.join(stage, name), "w") as f:
                f.write(content)
        # schema manifest STAGED with the data: the directory rename
        # below publishes both atomically (no stale-manifest window on
        # any full-rewrite path — bootstrap, MODIFY, rename, GC)
        self._write_schema_manifest(df.schema, dir_path=stage)
        old = f"{self.path}.old-{uuid.uuid4().hex[:8]}"
        if os.path.exists(self.path):
            os.rename(self.path, old)
        os.rename(stage, self.path)
        if os.path.exists(old):
            shutil.rmtree(old)


class CdcStreamRoute:
    """One route (db.table → target) of a streaming CDC pipeline."""

    def __init__(
        self,
        spark: SparkSession,
        *,
        db: str,
        table: str,
        schema: StructType,
        keys: list[str],
        target_path: str,
        transform=None,
        n_buckets: int | None = DEFAULT_N_BUCKETS,
        dlq_path: str | None = None,
        sink=None,
        versioned: bool = False,
        table_opts: dict | None = None,
        history_path: str | None = None,
        partition_col: str | None = None,
        partition_keep_latest: int | None = None,
        egress_format: str | None = None,
        egress_dir: str | None = None,
        egress_database: str | None = None,
        egress_table: str | None = None,
        tombstone_gc_lag: int | None = None,
        history_expire_lag: int | None = None,
    ):
        self.spark = spark
        self.db = db
        self.table = table
        self.schema = schema
        self.keys = keys
        self.target = None  # lazily bound so transform can change columns
        self.target_path = target_path
        self.transform = transform
        self.n_buckets = n_buckets
        self.dlq_path = dlq_path
        # Remote sink callable (decoded_batch_df) -> None, e.g.
        # StarRocksStreamLoad.load_batch — replaces the local parquet
        # target exactly like the reference's output plugins push to the
        # remote store instead of materializing locally.
        self.sink = sink
        # versioned=True: the target retains every batch as a snapshot
        # (VersionedBucketedTable) — time travel + audit on the synced
        # table; batch-id replay guard means a redelivered batch mints
        # no duplicate version.
        self.versioned = versioned
        # layout options forwarded to a versioned target's constructor
        # (bloom_cols=… for secondary-column data skipping, sort_cols=…
        # for within-bucket range clustering) — the streaming path gets
        # the same physical-layout levers as a hand-built table.
        self.table_opts = dict(table_opts or {})
        # history_path: maintain an SCD Type-2 history table
        # (streaming/scd2.py) from the SAME decoded batches the target
        # consumes — event-grain validity intervals, which a CDF-driven
        # consumer cannot reconstruct (the CDF nets out intermediate
        # versions within a batch).  Crash between the target merge and
        # the history merge is safe: each store has its own batch-id
        # replay guard, so the redelivered batch no-ops on whichever
        # side already applied and folds into the other.
        self.history_path = history_path
        self.history = None
        # partition_col: the target becomes a PartitionedVersionedTable
        # (streaming/partitioned.py) — partition-grain retention and
        # partition-pruned reads for 100 TB fact tables.  The column
        # must be immutable per key (the static-partitioning contract).
        # partition_keep_latest=N applies the retention policy after
        # every batch: drop all but the newest N partitions, a manifest
        # edit that no-ops when nothing is droppable (replay-safe).
        self.partition_col = partition_col
        self.partition_keep_latest = partition_keep_latest
        if partition_keep_latest is not None and partition_col is None:
            raise ValueError("partition_keep_latest requires partition_col")
        # egress_format ∈ {default, canal}: after every batch lands, the
        # target's change feed since the egress high-water mark re-emits
        # as reference wire-format (key, value) messages — the relay
        # loop the reference exists for (MySQL → Kafka), closed
        # IN-STREAM over the engine's own tables.  Messages land as
        # parquet dirs named v{from}-{to} under egress_dir (the
        # broker stand-in; write_kafka_stream is the live wiring), the
        # range naming making emission CRASH-SAFE: the high-water mark
        # is the largest emitted `to`, so a crash between the merge and
        # the emit heals on the next batch (the gap rides into its
        # range), and a replayed batch re-emits nothing (staged rename,
        # skip-if-exists).  Requires a versioned target (CDF source).
        if egress_format is not None:
            if egress_format not in ("default", "canal"):
                raise ValueError(f"unknown egress format {egress_format!r}")
            if not versioned and partition_col is None:
                raise ValueError("egress requires a versioned target")
        self.egress_format = egress_format
        self.egress_dir = egress_dir or (target_path + "_egress")
        self.egress_database = egress_database
        self.egress_table = egress_table
        # tombstone_gc_lag = N: after every batch, physically drop
        # delete tombstones below max(applied seq) - N — the in-stream
        # analog of the reference's 3-second position-lag GC window
        # (mysql_position.go:150-170).  N must cover the source's
        # redelivery horizon in SEQ units.  Discovery is driver-side
        # footer stats, so batches without droppable tombstones pay
        # one tiny agg job and nothing else.
        self.tombstone_gc_lag = tombstone_gc_lag
        # history_expire_lag = N: after every batch, expire SCD2 history
        # versions that closed below max(applied seq) - N
        # (ScdType2Table.expire_history) — in-stream retention for the
        # history store itself, same lag contract as tombstone_gc_lag
        # (N must cover the source's redelivery horizon in seq units,
        # because the retention floor replaces the per-key hwm the
        # expired rows supplied).
        if history_expire_lag is not None and history_path is None:
            raise ValueError("history_expire_lag requires history_path")
        self.history_expire_lag = history_expire_lag
        # in-band DDL state: canonical ALTER statements awaiting egress
        # attachment, and the per-batch schema rewind map that makes a
        # replayed DDL batch decode its segments under the same
        # schema vintages as the first attempt
        self._pending_ddl: list[str] = []
        self._ddl_batches: dict[int, tuple] = {}
        # rename listeners: callables invoked with the old→new column
        # mapping AFTER the route's own stores renamed — the pipeline
        # registers one per declared materialized view so derived state
        # follows wire-relayed renames automatically (VERDICT r9 #2)
        self.rename_listeners: list = []
        # in-session DDL-statement dedup (keyed by the DDL row's seq):
        # fences store/listener re-mutation on replayed batches — a
        # SWAP rename's replay is not detectable from the column set
        self._applied_rename_stmts: set = set()

    def _malformed_pred(self):
        """Rows whose ``data`` cannot decode to a keyed row under the
        route's CURRENT schema.  PERMISSIVE parsing turns
        partially-broken JSON into an all-null struct (not a null
        struct) — a null primary key is equally malformed for a CDC
        row.  Uses the same schema-tolerant parse as decode_envelope
        (cdc/apply.py::parse_row): a canal-stringified numeric PK
        ("id": "1") is NOT malformed — quarantining it here while
        decode recovers it would DLQ every row of a canal feed."""
        from qin_cdc_spark.cdc.apply import parse_row

        parsed = parse_row(F.col("data"), self.schema)
        null_key = parsed.isNull()
        for k in self.keys:
            null_key = null_key | parsed.getField(k).isNull()
        # op='ddl' control rows carry SQL in `data` by contract — never
        # a malformed data row (decode_envelope drops them; with a
        # registry, handle_ddl_rows consumes them first)
        return F.col("data").isNotNull() & null_key & (F.col("op") != "ddl")

    def _decode_slice(self, env_batch: DataFrame) -> DataFrame:
        """DLQ-quarantine + decode one envelope slice under the route's
        CURRENT schema/keys (the whole batch normally; one schema
        vintage's seq range when in-band DDL splits the batch)."""
        # Dead-letter quarantine: rows whose `data` fails to parse are
        # appended to the DLQ instead of killing the stream (the
        # reference log.Fatalfs on decode errors,
        # inputs/mysql/mysql_replication.go:89 — we keep flowing and
        # preserve the evidence).
        if self.dlq_path is not None:
            malformed = self._malformed_pred()
            routed = env_batch.filter(
                (F.col("db") == self.db) & (F.col("table") == self.table)
            )
            bad = routed.filter(malformed)
            # Unconditional append: a clean batch writes an empty file in
            # the same single job a dirty one uses — the round-1
            # `bad.limit(1).count()` probe cost an EXTRA Spark job per
            # route per batch even when every batch was clean.
            bad.write.mode("append").parquet(self.dlq_path)
            env_batch = routed.filter(~malformed)
        return decode_envelope(
            env_batch, self.schema, db=self.db, table=self.table, keys=self.keys
        )

    def _ddl_row_matches(self, r) -> bool:
        """Does an ``op='ddl'`` envelope row belong to this route?
        Primary match is the row's (db, table) naming; the fallback
        parses the statement's OWN table qualifiers — an egress
        publication whose window spans a ``RENAME TABLE`` names its
        control message for the NEW table at emission time, while the
        consumer is still bound to the OLD name until it applies that
        very statement."""
        if r["db"] == self.db and r["table"] == self.table:
            return True
        from qin_cdc_spark.cdc.ddl_parse import parse_ddl

        try:
            return any(
                (p.db, p.table) == (self.db, self.table)
                for p in parse_ddl(r["data"], self.db)
            )
        except ValueError:
            return False

    def apply_ddl_statements(
        self,
        stmts: list[str],
        *,
        evolve_schema: bool = True,
        stmt_id=None,
    ) -> dict[str, str]:
        """Apply upstream DDL statements (``op='ddl'`` envelope rows
        routed to this table) at a segment boundary — the reference
        forwards DDL to its OUTPUT so the remote table ALTERs in place
        (core/msg.go:49-53); the local-store analog is applied here:

        * column RENAMES apply to the target (and history) store as a
          value-preserving ``rename_columns`` — historical rows keep
          their data under the new name instead of nulling (the
          DROP+ADD failure VERDICT r8 #1 names);
        * the route's decode ``schema``/``keys`` evolve (skipped with
          ``evolve_schema=False`` when a stream-level registry already
          owns the schema);
        * each statement's COLUMN ops re-render canonically
          (``render_alter_ops``) and queue for verbatim egress
          forwarding, so the rename intent crosses the wire;
        * ``RENAME TABLE`` RE-BINDS the route (VERDICT r9 #3): the
          route keeps applying to the SAME local store while its
          (db, table) routing follows the upstream name — pre-rename
          keys still LWW-resolve against post-rename events — and the
          statement queues for verbatim egress forwarding unless the
          route publishes under a fixed ``egress_table`` override
          (fixed naming makes the upstream rename invisible
          downstream, by declaration).  The reference re-keys its
          registry the same way (inputs/mysql/mysql_meta.go:108-133).

        DROP/TRUNCATE TABLE remain schema-registry concerns and are
        skipped here.  Returns the cumulative old→new COLUMN rename
        mapping the caller must fold over any frames decoded under the
        PRE-DDL schema."""
        from qin_cdc_spark.cdc.ddl_parse import apply_raw_ddl, parse_ddl
        from qin_cdc_spark.cdc.registry import SchemaRegistry
        from qin_cdc_spark.sinks.kafka import render_alter_ops

        renames: dict[str, str] = {}
        new_table = self.table
        for sql in stmts:
            for parsed in parse_ddl(sql, self.db):
                if (parsed.db, parsed.table) != (self.db, new_table):
                    continue
                col_ops = [
                    op
                    for op in parsed.ops
                    if op.action
                    in ("add-column", "drop-column", "modify-column",
                        "rename-column", "change-column")
                ]
                for op in col_ops:
                    # identity skip (ADVICE r9): a retype-only
                    # `CHANGE COLUMN a a bigint` (MySQL's standard
                    # retype idiom) parses with new_name == column —
                    # no rename happened, only the type moved
                    if op.new_name and op.new_name != op.column:
                        # chain-collapse a→b then b→c into a→c
                        src = next(
                            (k for k, t in renames.items() if t == op.column),
                            None,
                        )
                        if src is not None:
                            renames[src] = op.new_name
                        else:
                            renames[op.column] = op.new_name
                canonical = render_alter_ops(self.db, parsed.table, col_ops)
                if canonical is not None:
                    self._pending_ddl.append(canonical)
                for op in parsed.ops:
                    if op.action == "rename-table" and op.new_table:
                        if self.egress_table is None:
                            self._pending_ddl.append(
                                f"RENAME TABLE `{self.db}`.`{new_table}` "
                                f"TO `{self.db}`.`{op.new_table}`"
                            )
                        new_table = op.new_table
        if evolve_schema:
            reg = SchemaRegistry()
            reg.add(self.db, self.table, self.schema)
            for sql in stmts:
                apply_raw_ddl(reg, sql, self.db)
            try:
                # after a RENAME TABLE the registry holds the schema
                # under the NEW key
                self.schema = reg.get(self.db, new_table)
            except KeyError:
                pass  # table-level drop/truncate: keep the bound schema
        self.table = new_table
        # a rename-back chain (a→b then b→a) collapses to identity —
        # nothing moved end to end
        renames = {o: n for o, n in renames.items() if o != n}
        if renames:
            # in-session statement dedup: a replayed DDL row must not
            # re-mutate stores/listeners (a SWAP mapping would swap
            # back — set-inspection cannot detect its replay); the
            # stores carry their own DURABLE stmt markers for the
            # cross-restart case
            already = (
                stmt_id is not None and stmt_id in self._applied_rename_stmts
            )
            if not already and self.sink is None:
                # local targets rename in place; a REMOTE sink route has
                # no local store — the remote table's ALTER is the
                # operator's (or the downstream relay's) job, exactly as
                # in the reference (outputs execute no DDL themselves)
                tgt = self.bind_target()
                if not hasattr(tgt, "rename_columns"):
                    raise NotImplementedError(
                        f"column rename on a {type(tgt).__name__} target is "
                        "not supported"
                    )
                if tgt.exists():
                    # missing_ok: a column ADDed and renamed within this
                    # same publication never materialized in the store —
                    # the evolved decode schema lands it under the new
                    # name, so the store-side rename legitimately no-ops
                    # (ADVICE r9)
                    tgt.rename_columns(
                        dict(renames), missing_ok=True, stmt_id=stmt_id
                    )
                else:
                    tgt.keys = [renames.get(k, k) for k in tgt.keys]
            if not already and self.history_path is not None:
                h = self.bind_history()
                if h.store.exists():
                    h.rename_columns(
                        dict(renames), missing_ok=True, stmt_id=stmt_id
                    )
                else:
                    h.keys = [renames.get(k, k) for k in h.keys]
            self.keys = [renames.get(k, k) for k in self.keys]
            if not already:
                # declared MVs (and any other registered consumer of
                # this route's column names) follow the rename before
                # their next refresh — each listener is idempotent
                # under acyclic replay (the rename planner skips
                # already-applied entries); cyclic replay is fenced by
                # the stmt dedup above
                for listener in self.rename_listeners:
                    listener(dict(renames))
                if stmt_id is not None:
                    self._applied_rename_stmts.add(stmt_id)
        return renames

    def apply_batch_with_ddl(
        self, env_batch: DataFrame, batch_id: int | None = None
    ) -> None:
        """Direct (non-stream) apply that honors in-band ``op='ddl'``
        envelope rows for this route's table — the one-call form of the
        stream's registry-plus-segmentation path (one driver collect of
        the control rows; DML cost unchanged).

        The envelope persists across the control-row scan and the
        segmented apply (OPTIMIZATION_r10): it is typically a lazy
        extraction over wire messages (envelope_from_*_egress), and
        without the persist every segment slice, DLQ append and merge
        re-ran the whole message parse."""
        env_batch = env_batch.persist()
        try:
            ddl_rows = (
                env_batch.filter(F.col("op") == "ddl")
                .select("db", "table", "seq", "data")
                .orderBy("seq")
                .collect()
            )
            self.apply_batch(env_batch, batch_id=batch_id, ddl_rows=ddl_rows or None)
        finally:
            env_batch.unpersist()

    def _decode_evolving(
        self, env_batch: DataFrame, ddl_rows: list, batch_id: int | None
    ) -> DataFrame:
        """Seq-ordered DDL application WITHIN a batch: envelope rows
        before each DDL's seq decode under the pre-DDL schema, rows
        at-or-after under the post-DDL schema (wire publications stamp
        their DDL and DML with the same ``_v_to``, and a publication's
        DML renders from the post-DDL snapshot — so >= is exact there
        too).  Every earlier segment's decoded frame renames FORWARD
        through each rename, so the union presents one final-name
        schema and the batch still lands in ONE merge.

        Replay safety: a redelivered batch rewinds the route's
        schema/keys/table binding to their pre-batch values first
        (``_ddl_batches``), so segment decode sees the same vintages as
        the first attempt; store-side renames skip already-applied
        entries.

        Row matching is DYNAMIC (re-evaluated per row in seq order):
        a ``RENAME TABLE`` re-binds ``self.table`` mid-batch, so later
        DDL rows arriving under the NEW name still belong to this
        route."""
        if not any(self._ddl_row_matches(r) for r in ddl_rows):
            return self._decode_slice(env_batch)
        if batch_id is not None:
            seen = self._ddl_batches.get(batch_id)
            if seen is not None:
                self.schema, self.keys = seen[0], list(seen[1])
                self.db, self.table = seen[2], seen[3]
            else:
                self._ddl_batches[batch_id] = (
                    self.schema, list(self.keys), self.db, self.table
                )
        parts: list[DataFrame] = []
        prev_seq = None
        for r in sorted(ddl_rows, key=lambda x: x["seq"]):
            if not self._ddl_row_matches(r):
                continue
            s = r["seq"]
            if prev_seq is None:
                sl = env_batch.filter(F.col("seq") < F.lit(s))
            else:
                sl = env_batch.filter(
                    (F.col("seq") >= F.lit(prev_seq)) & (F.col("seq") < F.lit(s))
                )
            parts.append(self._decode_slice(sl))
            renames = self.apply_ddl_statements([r["data"]], stmt_id=r["seq"])
            if renames:
                parts = [
                    _rename_forward(p, renames) for p in parts
                ]
            prev_seq = s
        tail = env_batch.filter(F.col("seq") >= F.lit(prev_seq))
        parts.append(self._decode_slice(tail))
        # align every segment to the FINAL schema's TYPES before the
        # union: a MODIFY mid-batch leaves early segments decoded under
        # the old type, and unionByName's implicit coercion would pick
        # an arbitrary common type (int ∪ string → bigint, killing the
        # stream on the first non-numeric value — the same hazard
        # _align_to_incoming closes on the merge side).  Evolution
        # direction is always toward the evolved schema.
        final_types = {f.name: f.dataType for f in self.schema.fields}
        aligned = []
        for p in parts:
            cols = [
                F.col(c).cast(final_types[c]).alias(c)
                if c in final_types and p.schema[c].dataType != final_types[c]
                else F.col(c)
                for c in p.columns
            ]
            aligned.append(p.select(*cols))
        decoded = aligned[0]
        for p in aligned[1:]:
            decoded = decoded.unionByName(p, allowMissingColumns=True)
        return decoded

    def apply_batch(
        self,
        env_batch: DataFrame,
        batch_id: int | None = None,
        ddl_rows: list | None = None,
    ) -> None:
        if ddl_rows:
            decoded = self._decode_evolving(env_batch, ddl_rows, batch_id)
        else:
            decoded = self._decode_slice(env_batch)
        if self.transform is not None:
            decoded = self.transform(decoded)
        if self.history_path is not None:
            # history wants the RAW event grain (pre-reduction): two
            # same-key events in one batch are two dimension versions
            self.bind_history().apply_batch(decoded, batch_id=batch_id)
        # The merge itself reduces last-event-per-key (A27 analog) over
        # (current ∪ batch) — feeding it the raw decoded batch costs one
        # shuffle total instead of reduce-then-merge's two.
        reduced = decoded
        if self.sink is not None:
            # Remote sinks get the batch REDUCED to its last event per key
            # (A27): rows post from unordered partitions, so two same-key
            # events in one batch could otherwise land at the target in
            # the wrong order.  After reduction keys are disjoint and any
            # posting order is correct; cross-batch order is the stream's.
            self.sink(latest_by_key(reduced, self.keys))
            return
        self.bind_target()
        if self.partition_col is not None:
            self.target.merge(reduced, batch_id=batch_id)
            if self.partition_keep_latest is not None:
                self.target.retain_latest(self.partition_keep_latest)
        elif self.versioned:
            self.target.merge(reduced, batch_id=batch_id)
        else:
            self.target.merge(reduced)
        if self._pending_ddl:
            # durably tie the batch's upstream DDL to the version the
            # merge minted: emit_egress replays it verbatim over the
            # wire (ddl_between) instead of re-deriving a name-based
            # diff.  Targets without a version ledger (flat/bucketed —
            # no egress by contract) just drop the queue; the diff
            # fallback covers any statement lost to a crash here.
            if hasattr(self.target, "attach_ddl"):
                self.target.attach_ddl(self._pending_ddl)
            self._pending_ddl = []
        needs_hw = self.tombstone_gc_lag is not None or (
            self.history_expire_lag is not None
        )
        hw = (
            reduced.agg(F.max(F.col("seq").cast("long"))).first()[0]
            if needs_hw
            else None
        )
        if (
            self.tombstone_gc_lag is not None
            and hw is not None
            and hasattr(self.target, "gc_tombstones")
        ):
            self.target.gc_tombstones(int(hw) - self.tombstone_gc_lag)
        if self.history_expire_lag is not None and hw is not None:
            self.bind_history().expire_history(
                int(hw) - self.history_expire_lag
            )
        if self.egress_format is not None:
            self.emit_egress()

    def replay_dlq(self) -> tuple[int, int]:
        """Re-attempt quarantined envelope rows under the route's
        CURRENT schema — the operational second half of the quarantine:
        after the operator fixes the route (schema correction, DDL
        catch-up), the preserved evidence flows back through the normal
        decode → transform → merge path.  Rows that still fail stay
        quarantined (the DLQ is rewritten to exactly the still-bad set,
        staged-swap like the upsert tables).  Replay is idempotent:
        applied rows merge LWW by seq, so re-running converges.

        Returns (applied, still_quarantined)."""
        if self.dlq_path is None:
            return (0, 0)
        # crash-window recovery, mirroring ParquetUpsertTable._recover:
        # swap died BETWEEN renames → only .old-* exists → restore it;
        # swap COMPLETED but the crash hit before cleanup → live dir
        # exists alongside stale .old-*/.stage-* siblings → drop them
        # (they would otherwise accumulate forever across replays)
        parent, name = os.path.split(self.dlq_path.rstrip("/"))
        if parent and os.path.isdir(parent):
            if not os.path.isdir(self.dlq_path):
                olds = sorted(
                    d for d in os.listdir(parent) if d.startswith(name + ".old-")
                )
                if olds:
                    os.rename(os.path.join(parent, olds[-1]), self.dlq_path)
            if os.path.isdir(self.dlq_path):
                for d in os.listdir(parent):
                    if d.startswith((name + ".old-", name + ".stage-")):
                        shutil.rmtree(os.path.join(parent, d), ignore_errors=True)
        if not os.path.isdir(self.dlq_path):
            return (0, 0)
        quarantined = self.spark.read.parquet(self.dlq_path)
        malformed = self._malformed_pred()
        good = quarantined.filter(~malformed).persist()
        bad = quarantined.filter(malformed).persist()
        try:
            n_good, n_bad = good.count(), bad.count()
            if n_good:
                decoded = decode_envelope(
                    good, self.schema, db=self.db, table=self.table, keys=self.keys
                )
                if self.transform is not None:
                    decoded = self.transform(decoded)
                if self.history_path is not None:
                    # the history contract is "maintained from the SAME
                    # batches the target consumes" — replayed rows are
                    # dimension versions too.  Two paths: apply_batch
                    # folds the rows still above each key's high-water
                    # mark (no batch_id: the hwm absorbs replay
                    # redelivery), then insert_versions retroactively
                    # places the rest — quarantined versions whose keys
                    # saw NEWER events before the replay would otherwise
                    # be silently and permanently missing from history
                    # (apply_batch alone must drop at-or-below-hwm
                    # events; only the replay path knows they are late
                    # first deliveries, not redeliveries).
                    h = self.bind_history()
                    h.apply_batch(decoded)
                    h.insert_versions(decoded)
                if self.sink is not None:
                    self.sink(latest_by_key(decoded, self.keys))
                else:
                    self.bind_target()
                    self.target.merge(decoded)
                # rewrite the DLQ to the still-bad rows only (merge first:
                # if it fails, the quarantine is untouched)
                stage = f"{self.dlq_path}.stage-{uuid.uuid4().hex[:8]}"
                bad.write.parquet(stage)
                old = f"{self.dlq_path}.old-{uuid.uuid4().hex[:8]}"
                os.rename(self.dlq_path, old)
                os.rename(stage, self.dlq_path)
                shutil.rmtree(old, ignore_errors=True)
            return (n_good, n_bad)
        finally:
            good.unpersist()
            bad.unpersist()

    def emit_egress(self) -> tuple[int, int] | None:
        """Emit the target's CDF since the egress high-water mark as
        wire-format messages; returns the emitted (v_from, v_to) range
        or None when already caught up.  Safe to call any time —
        at-least-once delivery with exactly-once PUBLICATION (staged
        rename, skip-if-exists), and a crash-created gap heals on the
        next call because the range always starts at the hwm."""
        self.bind_target()
        if self.target is None or not self.target.exists():
            return None
        return emit_store_egress(
            self.target,
            self.egress_dir,
            fmt=self.egress_format,
            database=self.egress_database or self.db,
            table_name=self.egress_table or self.table,
        )

    def read_egress(self) -> DataFrame | None:
        """All published egress messages (key, value), oldest ranges
        included — the test/audit read of the broker stand-in."""
        return read_store_egress(self.spark, self.egress_dir)

    def bind_history(self):
        """Bind the SCD2 history table lazily (post-transform columns,
        same rule as bind_target)."""
        if self.history is None:
            from qin_cdc_spark.streaming.scd2 import ScdType2Table

            self.history = ScdType2Table(
                self.spark,
                self.history_path,
                keys=self.keys,
                n_buckets=self.n_buckets or DEFAULT_N_BUCKETS,
            )
        return self.history

    def bind_target(self):
        """Bind the target table lazily (so a transform can change the
        column set first).  One binding rule for apply AND read paths —
        a bucketed target must never be read through the flat class."""
        if self.target is None:
            if self.partition_col is not None:
                from qin_cdc_spark.streaming.partitioned import (
                    PartitionedVersionedTable,
                )

                self.target = PartitionedVersionedTable(
                    self.spark,
                    self.target_path,
                    self.keys,
                    partition_col=self.partition_col,
                    n_buckets=self.n_buckets or DEFAULT_N_BUCKETS,
                    table_opts=self.table_opts,
                )
            elif self.versioned:
                from qin_cdc_spark.streaming.versioned import VersionedBucketedTable

                self.target = VersionedBucketedTable(
                    self.spark,
                    self.target_path,
                    self.keys,
                    n_buckets=self.n_buckets or DEFAULT_N_BUCKETS,
                    **self.table_opts,
                )
            elif self.n_buckets:
                self.target = BucketedUpsertTable(
                    self.spark, self.target_path, self.keys, n_buckets=self.n_buckets
                )
            else:
                self.target = ParquetUpsertTable(self.spark, self.target_path, self.keys)
        return self.target


def start_cdc_stream(
    spark: SparkSession,
    envelope_stream: DataFrame,
    routes: list[CdcStreamRoute],
    *,
    checkpoint_dir: str | None = None,
    trigger: dict | None = None,
    registry=None,
    gc_every: int = 0,
    post_batch=None,
):
    """Start the streaming apply: one foreachBatch fanning out to every
    route (per-table grouping, A21 analog — each route filters its own
    (db, table) slice of the batch).

    With a ``registry``, ``op='ddl'`` control rows are applied to it (in
    seq order, batch-id idempotent) BEFORE the DML fan-out, and each
    route's decode schema refreshes from the registry at the start of
    every batch — the reference's handleDDLEvent → meta-update → decode
    loop (inputs/mysql/mysql_replication.go:132-228) as one streaming
    pipeline.  Rows produced under the pre-DDL schema decode fine under
    the post-DDL schema within the same batch (absent fields read as
    NULL; the sink union is allowMissingColumns).

    ``gc_every=N`` (0 = off) runs tombstone GC on every local target
    once per N batches, using the CURRENT batch's min seq as the
    low-water mark.  That bound is only valid for a SEQ-ORDERED source —
    one whose later batches never carry a smaller seq than any earlier
    batch's, which is exactly a binlog/WAL tail (positions are monotone;
    the reference's GC analog is the 3-second position-lag window,
    inputs/mysql/mysql_position.go:150-170).  Replay of the in-flight
    batch after a crash is safe: the replayed rows all have
    seq ≥ that batch's min, and any delete whose tombstone was dropped
    is itself part of the replayed batch, so LWW re-converges.  Do NOT
    enable it on unordered test streams (e.g. a repartitioned envelope
    directory).  Each GC is a full target rewrite — N trades rewrite
    amortization against tombstone accumulation."""
    if checkpoint_dir is None:
        # session_tmp: the default checkpoint is session-scoped scratch —
        # atexit-cleaned, so ad-hoc streams stop leaking cdc_ckpt_* trees.
        # A checkpoint that must survive restarts is ALWAYS caller-named.
        from qin_cdc_spark.session import session_tmp

        checkpoint_dir = session_tmp("cdc_ckpt_")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        ddl_rows: list = []
        if registry is not None:
            ddl_rows = _collect_ddl_rows(batch_df)
            if ddl_rows:
                _apply_ddl_rows_to_registry(ddl_rows, registry, batch_id=batch_id)
                batch_df = batch_df.filter(F.col("op") != "ddl")
            for route in routes:
                if any(route._ddl_row_matches(r) for r in ddl_rows):
                    # this route owns in-band DDL this batch: apply_batch
                    # segments the batch at the DDL seq (pre-DDL rows
                    # decode under the pre-DDL schema — a RENAME must not
                    # null them) and lands the route's schema at exactly
                    # the registry's post-DDL state.  Refreshing here
                    # would skip the segmentation.
                    continue
                try:
                    route.schema = registry.get(route.db, route.table)
                except KeyError:
                    pass  # table not in registry: keep the bound schema
        batch_df.persist()
        try:
            if gc_every and batch_id > 0 and batch_id % gc_every == 0:
                # bounded driver scalar: one min over the (persisted) batch
                low = batch_df.agg(F.min(F.col("seq").cast("long"))).first()[0]
                if low is not None:
                    for route in routes:
                        if route.sink is None:
                            tgt = route.bind_target()
                            # versioned targets keep history by design —
                            # retention is gc(keep_last=…), not tombstone GC
                            if tgt.exists() and hasattr(tgt, "gc_tombstones"):
                                tgt.gc_tombstones(low)
            for route in routes:
                route.apply_batch(batch_df, batch_id=batch_id, ddl_rows=ddl_rows or None)
            # downstream maintenance (derived MVs, index refresh) runs
            # INSIDE the micro-batch, after every route applied: a crash
            # replays the whole batch and both the LWW merge and any
            # version-guarded consumer (DerivedAggTable.refresh,
            # IvfIndex.apply_cdf driven off changes_between) converge.
            if post_batch is not None:
                post_batch(batch_id)
        finally:
            batch_df.unpersist()

    writer = (
        envelope_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    trigger = trigger or {"availableNow": True}
    writer = writer.trigger(**trigger)
    return writer.start()


def file_envelope_stream(
    spark: SparkSession, path: str, *, max_files_per_trigger: int | None = None
) -> DataFrame:
    """readStream over a directory of envelope parquet files — the test
    stand-in for a binlog/Kafka source.  maxFilesPerTrigger is the
    batch-size rate-limit analog (reference `batch-size`, A20)."""
    from qin_cdc_spark.cdc.envelope import ENVELOPE_SCHEMA

    reader = spark.readStream.schema(ENVELOPE_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def _collect_ddl_rows(batch_df: DataFrame, *, sql_field: str = "data") -> list:
    """Driver-side collect of a batch's ``op='ddl'`` control rows in
    seq order — schema changes are rare and the registry is driver-side
    state (the reference's meta maps), so the collect is bounded and
    deliberate."""
    return (
        batch_df.filter(F.col("op") == "ddl")
        .select("db", "table", "seq", sql_field)
        .orderBy("seq")
        .collect()
    )


def _apply_ddl_rows_to_registry(
    ddl_rows: list, registry, *, batch_id: int | None = None,
    sql_field: str = "data",
) -> None:
    """Apply collected DDL rows to the registry, batch-id idempotent
    (see handle_ddl_rows for the redelivery contract)."""
    from qin_cdc_spark.cdc.ddl_parse import apply_raw_ddl

    if batch_id is not None:
        applied = getattr(registry, "_applied_ddl_batches", None)
        if applied is None:
            applied = set()
            registry._applied_ddl_batches = applied
        if batch_id in applied:
            return
        applied.add(batch_id)
    for r in ddl_rows:
        apply_raw_ddl(registry, r[sql_field], r["db"])


def handle_ddl_rows(
    batch_df: DataFrame, registry, *, sql_field: str = "data", batch_id: int | None = None
) -> DataFrame:
    """Split ``op='ddl'`` control rows out of an envelope batch: their
    raw SQL (carried in ``data``) is applied to the schema registry in
    seq order, and only DML rows flow on — the reference's
    handleDDLEvent contract (inputs/mysql/mysql_replication.go:132-228:
    DDL is a metadata side effect, never a data row).  DDL rows are
    collected to the driver deliberately — schema changes are rare and
    the registry is driver-side state, exactly like the reference's
    meta maps.

    ``batch_id`` (the foreachBatch id) makes redelivery safe: a replayed
    batch must not re-apply its DDL (duplicate add-column fields,
    KeyError on re-run renames, version drift vs the versions already
    stamped into DML rows) — the same idempotence guard the upsert and
    rollup paths carry.  The guard is in-memory because the registry
    itself is in-memory driver state, rebuilt (with its DDL re-applied)
    on restart."""
    ddl_rows = _collect_ddl_rows(batch_df, sql_field=sql_field)
    _apply_ddl_rows_to_registry(
        ddl_rows, registry, batch_id=batch_id, sql_field=sql_field
    )
    if not ddl_rows:
        return batch_df
    return batch_df.filter(F.col("op") != "ddl")
