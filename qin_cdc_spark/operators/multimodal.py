"""Multimodal column plumbing (north star, SURVEY §2.C): opaque binary
payloads + typed metadata structs, decoded via Arrow-batched
``mapInPandas``.

The container has no image/audio libraries, so the DECODE KERNEL is
swappable: ``fake_decode_batch`` is a deterministic arithmetic stand-in
(so the whole path is oracle-checkable), and ``real_decode_batch`` is
the clearly-marked stub that a deployment replaces with PIL/ffmpeg.
Everything around the kernel — binary column handling, metadata
structs, Arrow batch shape, partition sizing — is real and is what
matters at 100 TB:

- payloads stay in executor memory as Arrow binary arrays; Python sees
  zero-copy pandas Series of bytes, batch-at-a-time
  (``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds peak memory);
- the decode is a narrow map — no shuffle; partition count follows the
  input, so 100 TB of images is just more partitions;
- metadata lives in a struct column next to the payload (one scan
  serves both filter-on-metadata and decode).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from qin_cdc_spark.sources.tables import load_table


def with_payload(docs: DataFrame) -> DataFrame:
    """Synthesize an image-like binary column from documents.text (the
    fixtures carry no real media): payload = utf-8 bytes, plus a typed
    metadata struct — the storage layout a real multimodal table uses."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("fake/raw").alias("format"),
            F.col("n_chars").cast("int").alias("declared_size"),
            F.col("source").alias("origin"),
        ).alias("media_meta"),
    )


DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("first_byte", IntegerType()),
        StructField("format", StringType()),
    ]
)


def fake_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in decode kernel: derives "image dimensions"
    arithmetically from the payload so the DuckDB oracle can verify the
    full mapInPandas path (schema, batching, binary transfer)."""
    for pdf in batches:
        n_bytes = pdf["payload"].map(len)
        first = pdf["payload"].map(lambda b: b[0] if len(b) else 0)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes.astype("int32"),
                "width": (64 + n_bytes % 512).astype("int32"),
                "height": (64 + (n_bytes * 7 + first) % 512).astype("int32"),
                "first_byte": first.astype("int32"),
                "format": pdf["media_meta"].map(lambda m: m["format"]),
            }
        )


def real_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Real image decode kernel — requires PIL, which this container
    does not ship.  Plug-in point for deployments."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "real image decode needs Pillow; use fake_decode_batch in this environment"
        ) from e
    raise NotImplementedError("wire PIL decode here")  # pragma: no cover


def decode_media(df: DataFrame, kernel=fake_decode_batch) -> DataFrame:
    """Run a decode kernel over (doc_id, payload, media_meta) with
    mapInPandas — Arrow-batched, shuffle-free."""
    return df.mapInPandas(kernel, schema=DECODED_SCHEMA)


def mm_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: full multimodal path — synthesize payloads, decode
    via mapInPandas, join decoded features back to metadata."""
    # repartition: fixture is one file → one partition → ONE Python
    # worker for the decode; spread it (no-op on a many-split input).
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    media = with_payload(docs)
    decoded = decode_media(media)
    # metadata side is (doc_id, int) — broadcast it so the join adds no
    # shuffle over the decoded stream.
    return decoded.join(
        F.broadcast(
            media.select(
                "doc_id", F.col("media_meta.declared_size").alias("declared_size")
            )
        ),
        "doc_id",
    ).select("doc_id", "n_bytes", "width", "height", "first_byte", "format", "declared_size")


# length(text)==n_bytes only if text is pure ASCII; use octet arithmetic
# via encode in the oracle to stay exact for multi-byte (zh) docs.
MM_DECODE_ORACLE = """
WITH b AS (
  SELECT doc_id, n_chars,
         octet_length(encode(text)) AS nb,
         CAST(concat('0x', substr(hex(encode(text)), 1, 2)) AS INTEGER) AS fb
  FROM documents
)
SELECT doc_id,
       CAST(nb AS INTEGER) AS n_bytes,
       CAST(64 + nb % 512 AS INTEGER) AS width,
       CAST(64 + (nb * 7 + fb) % 512 AS INTEGER) AS height,
       CAST(fb AS INTEGER) AS first_byte,
       'fake/raw' AS format,
       CAST(n_chars AS INTEGER) AS declared_size
FROM b
"""


QUERIES = {"mm_decode_meta": mm_decode_meta}
ORACLES = {"mm_decode_meta": MM_DECODE_ORACLE}


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("new_w", IntegerType()),
        StructField("new_h", IntegerType()),
    ]
)

TARGET_BOX = 224


def fake_resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Aspect-preserving fit into a 224×224 box, integer arithmetic only
    (so the oracle is exact): new_dim = dim * 224 // max(w, h).  A real
    deployment swaps in PIL's Image.thumbnail here — the batch contract
    (decoded dims in, resized dims out) is identical."""
    for pdf in batches:
        n_bytes = pdf["payload"].map(len)
        first = pdf["payload"].map(lambda b: b[0] if len(b) else 0)
        w = (64 + n_bytes % 512).astype("int64")
        h = (64 + (n_bytes * 7 + first) % 512).astype("int64")
        m = w.combine(h, max)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": w.astype("int32"),
                "height": h.astype("int32"),
                "new_w": (w * TARGET_BOX // m).astype("int32"),
                "new_h": (h * TARGET_BOX // m).astype("int32"),
            }
        )


def mm_resize_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: decode→resize plumbing via mapInPandas (dims derived
    from the payload, resized with integer box-fit arithmetic)."""
    docs = load_table(spark, sf_dir, "documents")
    return with_payload(docs).mapInPandas(fake_resize_batch, schema=RESIZED_SCHEMA)


MM_RESIZE_ORACLE = """
WITH b AS (
  SELECT doc_id,
         octet_length(encode(text)) AS nb,
         CAST(concat('0x', substr(hex(encode(text)), 1, 2)) AS INTEGER) AS fb
  FROM documents
),
d AS (
  SELECT doc_id, 64 + nb % 512 AS w, 64 + (nb * 7 + fb) % 512 AS h FROM b
)
SELECT doc_id,
       CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       CAST(w * 224 // greatest(w, h) AS INTEGER) AS new_w,
       CAST(h * 224 // greatest(w, h) AS INTEGER) AS new_h
FROM d
"""


FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_off", IntegerType()),
    ]
)

FRAME_SIZE = 100
FRAME_STRIDE = 10


def fake_frame_sample_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Video frame sampling stand-in: payload = n_bytes//100 'frames',
    keep every 10th — demonstrates the 1-row-in/N-rows-out mapInPandas
    shape (a real kernel emits decoded frame tensors the same way)."""
    for pdf in batches:
        out_doc, out_idx = [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_frames = len(payload) // FRAME_SIZE
            for i in range(0, n_frames, FRAME_STRIDE):
                out_doc.append(doc_id)
                out_idx.append(i)
        idx = pd.Series(out_idx, dtype="int32")
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out_doc, dtype="int64"),
                "frame_idx": idx,
                "frame_off": (idx * FRAME_SIZE).astype("int32"),
            }
        )


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: strided frame sampling over 'video' payloads — the
    row-expanding mapInPandas contract."""
    docs = load_table(spark, sf_dir, "documents")
    media = with_payload(docs)
    return media.mapInPandas(fake_frame_sample_batch, schema=FRAMES_SCHEMA)


MM_FRAME_SAMPLE_ORACLE = """
WITH b AS (
  SELECT doc_id, octet_length(encode(text)) // 100 AS n_frames FROM documents
)
SELECT doc_id,
       CAST(unnest(range(0, n_frames, 10)) AS INTEGER) AS frame_idx,
       CAST(unnest(range(0, n_frames, 10)) * 100 AS INTEGER) AS frame_off
FROM b WHERE n_frames > 0
"""


QUERIES["mm_resize_meta"] = mm_resize_meta
QUERIES["mm_frame_sample"] = mm_frame_sample
ORACLES["mm_resize_meta"] = MM_RESIZE_ORACLE
ORACLES["mm_frame_sample"] = MM_FRAME_SAMPLE_ORACLE


def mm_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload audit without decoding: byte size, magic-bytes prefix
    (format sniffing), content digest, declared-vs-actual size mismatch
    (multibyte text makes n_chars != octet length — the synthetic
    analog of a corrupt/truncated media payload).  All JVM binary
    expressions: the 100 TB integrity sweep never crosses into Python."""
    docs = load_table(spark, sf_dir, "documents")
    media = with_payload(docs)
    return media.select(
        "doc_id",
        F.length(F.col("payload")).alias("n_bytes"),
        F.upper(F.substring(F.hex(F.col("payload")), 1, 8)).alias("magic_hex"),
        F.md5(F.col("payload")).alias("payload_md5"),
        (F.length(F.col("payload")) != F.col("media_meta.declared_size")).alias(
            "size_mismatch"
        ),
    )


MM_PAYLOAD_STATS_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       upper(substring(hex(encode(text)), 1, 8)) AS magic_hex,
       md5(text) AS payload_md5,
       octet_length(encode(text)) <> CAST(n_chars AS INTEGER) AS size_mismatch
FROM documents
"""

QUERIES["mm_payload_stats"] = mm_payload_stats
ORACLES["mm_payload_stats"] = MM_PAYLOAD_STATS_ORACLE


# --------------------------------------------------------------------------
# Audio-style DSP kernel — a REAL decode path, fully runnable here
# (numpy only): treat the payload as 8-bit PCM and compute per-window
# RMS energy, the first feature any audio-curation pipeline extracts
# (silence trimming, loudness filtering, VAD pre-gates).  One payload
# row fans out to n_windows feature rows (1-in/N-out mapInPandas, same
# shape as frame sampling).  sum_sq is an exact integer on both engines
# so the oracle comparison never rides on float summation order; rms is
# derived from that exact sum.
# --------------------------------------------------------------------------

AUDIO_WIN = 256  # samples (bytes) per analysis window

AUDIO_RMS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("win_idx", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("sum_sq", LongType()),
        StructField("rms_r", DoubleType()),
    ]
)


def audio_rms_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched PCM windowing kernel: bytes → int64 samples →
    per-window exact sum of squares + derived RMS."""
    import math

    import numpy as np

    for pdf in batches:
        doc_ids: list[int] = []
        win_idx: list[int] = []
        n_samples: list[int] = []
        sum_sq: list[int] = []
        rms_r: list[float] = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            x = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
            for w in range((len(x) + AUDIO_WIN - 1) // AUDIO_WIN):
                seg = x[w * AUDIO_WIN : (w + 1) * AUDIO_WIN]
                ss = int((seg * seg).sum())
                doc_ids.append(int(doc_id))
                win_idx.append(w)
                n_samples.append(len(seg))
                sum_sq.append(ss)
                rms_r.append(round(math.sqrt(ss / len(seg)), 6))
        yield pd.DataFrame(
            {
                "doc_id": pd.array(doc_ids, dtype="int64"),
                "win_idx": pd.array(win_idx, dtype="int32"),
                "n_samples": pd.array(n_samples, dtype="int32"),
                "sum_sq": pd.array(sum_sq, dtype="int64"),
                "rms_r": pd.array(rms_r, dtype="float64"),
            }
        )


def mm_audio_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    return with_payload(docs).select("doc_id", "payload").mapInPandas(
        audio_rms_batch, schema=AUDIO_RMS_SCHEMA
    )


# Oracle windows over BYTES via hex pairs (exact for multi-byte UTF-8
# docs, where character codes != bytes), mirroring the kernel's integer
# arithmetic; only the final rms derives through float ops, from the
# same exact integers on both sides.
MM_AUDIO_RMS_ORACLE = f"""
WITH b AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS nb
  FROM documents
),
w AS (
  SELECT doc_id, nb, hx,
         unnest(range(0, CAST((nb + {AUDIO_WIN} - 1) // {AUDIO_WIN} AS BIGINT)))
           AS win_idx
  FROM b
),
agg AS (
  SELECT doc_id, win_idx,
         least(nb, (win_idx + 1) * {AUDIO_WIN}) - win_idx * {AUDIO_WIN} AS ns,
         list_sum(list_transform(
           list_transform(range(win_idx * {AUDIO_WIN},
                                least(nb, (win_idx + 1) * {AUDIO_WIN})),
                          i -> CAST(concat('0x', substr(hx, 2 * i + 1, 2)) AS BIGINT)),
           v -> v * v)) AS ss
  FROM w
)
SELECT doc_id,
       CAST(win_idx AS INTEGER) AS win_idx,
       CAST(ns AS INTEGER) AS n_samples,
       CAST(ss AS BIGINT) AS sum_sq,
       round(sqrt(CAST(ss AS DOUBLE) / ns), 6) AS rms_r
FROM agg
"""

QUERIES["mm_audio_rms"] = mm_audio_rms
ORACLES["mm_audio_rms"] = MM_AUDIO_RMS_ORACLE


# --------------------------------------------------------------------------
# Byte-histogram kernel — the image-curation sibling of the RMS kernel
# (exposure / entropy screening runs on exactly this shape): 16-bin
# histogram of the payload's byte high-nibbles, one row per payload,
# bins as a typed array column.  All-integer → oracle-exact.
# --------------------------------------------------------------------------

HIST_BINS = 16

BYTE_HIST_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        # bins flattened to CSV: gate outputs are scalar-only by policy
        # (the driver's pandas canonicalizer can't hash ndarray cells).
        StructField("bins_csv", StringType()),
    ]
)


def byte_hist_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        rows = {"doc_id": [], "n_bytes": [], "bins_csv": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            x = np.frombuffer(payload, dtype=np.uint8)
            hist = np.bincount(x >> 4, minlength=HIST_BINS).astype("int32")
            rows["doc_id"].append(int(doc_id))
            rows["n_bytes"].append(len(x))
            rows["bins_csv"].append(",".join(str(int(c)) for c in hist))
        out = pd.DataFrame(rows)
        out["doc_id"] = out["doc_id"].astype("int64")
        out["n_bytes"] = out["n_bytes"].astype("int32")
        yield out


def mm_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    return with_payload(docs).select("doc_id", "payload").mapInPandas(
        byte_hist_batch, schema=BYTE_HIST_SCHEMA
    )


# high nibble of byte i == hex digit at position 2i of hex(payload)
MM_BYTE_HIST_ORACLE = f"""
WITH b AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS nb
  FROM documents
)
SELECT doc_id,
       CAST(nb AS INTEGER) AS n_bytes,
       array_to_string(list_transform(range(0, {HIST_BINS}), k ->
         CAST(len(list_filter(range(0, nb),
           i -> CAST(concat('0x', substr(hx, 2 * i + 1, 1)) AS INTEGER) = k))
           AS INTEGER)), ',') AS bins_csv
FROM b
"""

QUERIES["mm_byte_histogram"] = mm_byte_histogram
ORACLES["mm_byte_histogram"] = MM_BYTE_HIST_ORACLE


# --------------------------------------------------------------------------
# Perceptual near-dup over the payload itself (average-hash).  Image
# dedup at corpus scale runs a perceptual hash (aHash/pHash) + hamming
# banding; the aHash recipe — resample to a fixed grid, threshold each
# cell against the global mean, band the sign bits — needs only integer
# byte arithmetic, so here it runs ENTIRELY JVM-side over the payload
# bytes (hex-decoded, 64-cell resample) and the DuckDB oracle
# reproduces every bit.  A real deployment swaps the byte grid for the
# pixel grid from the mapInPandas decode kernel; the signature/banding/
# verify stages below are unchanged — they never know what the 64 cells
# were computed from.
#
# Scale shape: signatures are row-local; banding shuffles short
# (band, bits) keys; hamming verify touches candidate pairs only (the
# same candidate-bounded contract as the MinHash/SimHash family).

AHASH_CELLS = 64
AHASH_BANDS = 8
AHASH_HAMMING_MAX = 6


def ahash_signatures(media: DataFrame) -> DataFrame:
    """(doc_id, bits array<int>, bands array<string>), MATERIALIZED.

    Two projection stages with a persist barrier between them: stage 1
    hex-parses the payload ONCE per row into byte values and per-cell
    (sum, n) stats; stage 2 derives the 64 sign bits and band keys from
    those bound columns.  Without the barrier CollapseProject would
    inline the parse into all 64 bit expressions (the same hazard the
    MinHash pipeline hit — see PLANS.md)."""
    hx = F.hex(F.col("payload"))
    nb = F.length(F.col("payload"))
    vals = F.transform(
        F.sequence(F.lit(0), nb - 1),
        lambda i: F.conv(F.substring(hx, i * 2 + 1, 2), 16, 10).cast("long"),
    )
    stage = (
        media.filter(F.length("payload") > 0)
        .select("doc_id", vals.alias("vals"), nb.cast("long").alias("nb"))
        .select(
            "doc_id",
            "nb",
            F.aggregate(
                "vals", F.lit(0).cast("long"), lambda a, x: a + x
            ).alias("ts"),
            F.transform(
                F.sequence(F.lit(0), F.lit(AHASH_CELLS - 1)),
                lambda j: F.struct(
                    F.aggregate(
                        F.filter(
                            F.sequence(F.lit(0), F.size("vals") - 1),
                            # exact integer floor-div: (x - x%nb)/nb; a bare
                            # double floor(i*64/nb) can misround at exact
                            # multiples and disagree with DuckDB's // by 1
                            lambda i: (
                                i * AHASH_CELLS
                                - F.pmod(i * AHASH_CELLS, F.size("vals"))
                            )
                            / F.size("vals")
                            == j,
                        ),
                        F.lit(0).cast("long"),
                        lambda a, i: a + F.element_at(F.col("vals"), i + 1),
                    ).alias("s"),
                    (
                        F.least(
                            F.size("vals"),
                            F.ceil((j + 1) * F.size("vals") / AHASH_CELLS),
                        )
                        - F.ceil(j * F.size("vals") / AHASH_CELLS)
                    ).cast("long").alias("n"),
                ),
            ).alias("st"),
        )
        .persist()
    )
    bits = F.transform(
        F.col("st"),
        lambda s: F.when(
            (s["n"] > 0) & (s["s"] * F.col("nb") >= F.col("ts") * s["n"]),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    rows_per_band = AHASH_CELLS // AHASH_BANDS
    sigs = stage.select("doc_id", bits.alias("bits"))
    bands = F.array(
        *[
            F.concat_ws(
                ":",
                F.lit(str(b)),
                F.concat_ws(
                    "",
                    *[
                        F.element_at(F.col("bits"), b * rows_per_band + r + 1).cast(
                            "string"
                        )
                        for r in range(rows_per_band)
                    ],
                ),
            )
            for b in range(AHASH_BANDS)
        ]
    )
    out = sigs.withColumn("bands", bands).persist()
    out.count()
    stage.unpersist()
    return out


def mm_ahash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup payload pairs across two corpus revisions: shared aHash
    band → hamming ≤ 6 verify.

    The fixture corpus has no byte-identical payloads, so the query
    unions a deterministic second revision (doc_id + 1_000_000, an
    in-place same-length edit) — the re-crawl scenario perceptual dedup
    exists for: the revised payload's cell means barely move, so the
    (orig, rev) pairs survive banding + hamming while unrelated
    payloads don't."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    # SAME-LENGTH in-place edit (spaces→underscores in the first 40
    # chars): cell boundaries stay put, only the leading cells' means
    # move — a revision pHash-style dedup must still catch.  A
    # length-changing edit shifts every cell window and is the aHash
    # family's known blind spot (content-defined chunking covers that).
    rev2 = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(
            F.translate(F.substring(F.col("text"), 1, 40), " ", "_"),
            F.expr("substring(text, 41)"),
        ).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    both = docs.unionByName(rev2)
    sigs = ahash_signatures(with_payload(both))  # returns materialized
    bands = sigs.select("doc_id", F.explode("bands").alias("bk"))
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), "bk")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("bits").alias("bits_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("bits").alias("bits_b"))
    verified = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "hamming",
            F.aggregate(
                F.zip_with(
                    "bits_a", "bits_b", lambda x, y: (x != y).cast("long")
                ),
                F.lit(0).cast("long"),
                lambda a, x: a + x,
            ),
        )
        .filter(F.col("hamming") <= AHASH_HAMMING_MAX)
        .select("doc_a", "doc_b", "hamming")
    )
    out = verified.persist()
    out.count()
    sigs.unpersist()
    return out


_AHASH_BITS_SQL = """
  list_transform(range(0, 64), j -> CASE WHEN
      coalesce(list_sum(list_transform(
        list_filter(range(0, nb), i -> (i * 64) // nb = j),
        i -> vals[i + 1])), 0) * nb
      >= ts * len(list_filter(range(0, nb), i -> (i * 64) // nb = j))
     AND len(list_filter(range(0, nb), i -> (i * 64) // nb = j)) > 0
    THEN 1 ELSE 0 END)
"""

MM_AHASH_ORACLE = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
         concat(replace(substr(text, 1, 40), ' ', '_'), substr(text, 41)) AS text
  FROM documents),
b AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS nb
  FROM corpus WHERE octet_length(encode(text)) > 0),
v AS (
  SELECT doc_id, nb,
         list_transform(range(0, nb),
           i -> CAST(concat('0x', substr(hx, 2 * i + 1, 2)) AS BIGINT)) AS vals
  FROM b),
t AS (
  SELECT doc_id, nb, vals, coalesce(list_sum(vals), 0) AS ts FROM v),
sigs AS (
  SELECT doc_id, {_AHASH_BITS_SQL} AS bits FROM t),
bands AS (
  SELECT doc_id, u.b AS band,
         concat(CAST(u.b AS VARCHAR), ':',
                array_to_string(bits[u.b * 8 + 1 : u.b * 8 + 8], '')) AS bk
  FROM sigs, unnest(range(0, 8)) AS u(b)),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, bb.doc_id AS doc_b
  FROM bands a JOIN bands bb ON a.bk = bb.bk AND a.doc_id < bb.doc_id),
verified AS (
  SELECT c.doc_a, c.doc_b,
         CAST(len(list_filter(range(1, 65),
           i -> sa.bits[i] <> sb.bits[i])) AS BIGINT) AS hamming
  FROM cand c JOIN sigs sa ON c.doc_a = sa.doc_id
              JOIN sigs sb ON c.doc_b = sb.doc_id)
SELECT doc_a, doc_b, hamming FROM verified WHERE hamming <= 6
"""

QUERIES["mm_ahash_neardup"] = mm_ahash_neardup
ORACLES["mm_ahash_neardup"] = MM_AHASH_ORACLE
