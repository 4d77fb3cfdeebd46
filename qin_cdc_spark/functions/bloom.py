"""Packed Bloom-filter building blocks shared by the file-skipping
index (operators/scale_joins.py) and the versioned table's secondary-
column skipping (streaming/versioned.py).

The filter is a plain relation ``(unit, word, bits)`` — ``unit`` names
the prunable granule (a parquet file, a versioned table's data dir),
``word``/``bits`` pack the unit's m-bit Bloom bitset into int64 words
via a mergeable bit_or aggregate.  Probe bits come from the repo's
engine-portable md5-derived hash60, computable bit-identically on the
driver (hashlib), in Spark, and in DuckDB — so pruning decisions are
pure metadata math with no false negatives by construction.
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from qin_cdc_spark.functions.text import hash60

BLOOM_M_BITS = 1 << 20
BLOOM_N_HASHES = 3


def _render_key(key) -> str:
    """Driver-side rendering of a probe key, restricted to the types whose
    Python ``str()`` agrees with Spark's ``cast("string")`` byte-for-byte
    (int and str).  bool (``True`` vs ``true``), float (``1e+20`` vs
    ``1.0E20``) and timestamp keys render differently in the two engines,
    which would silently divert probe bits from the built bits — a FALSE
    NEGATIVE that drops true units from candidate_units.  Fail loudly
    instead; callers with other key types must cast the key column to
    string on the build side and pass the same string here."""
    if isinstance(key, bool) or not isinstance(key, (int, str)):
        raise TypeError(
            f"bloom probe keys must be int or str (got {type(key).__name__}); "
            "cast the key column to string on the build side and probe with "
            "the identical string rendering"
        )
    return str(key)


def probe_bits(
    key, m_bits: int = BLOOM_M_BITS, n_hashes: int = BLOOM_N_HASHES
) -> list[int]:
    """Driver-side probe bits for one key — must mirror the Spark-side
    expression in :func:`packed_bloom` exactly: int64 of the first 15
    hex digits of md5('<i>:<key>').  Key types are restricted by
    :func:`_render_key` so both sides share one rendering."""
    rendered = _render_key(key)
    return [
        int(hashlib.md5(f"{i}:{rendered}".encode()).hexdigest()[:15], 16) % m_bits
        for i in range(n_hashes)
    ]


def packed_bloom(
    df: DataFrame,
    unit_col: str,
    key_col: str,
    m_bits: int = BLOOM_M_BITS,
    n_hashes: int = BLOOM_N_HASHES,
) -> DataFrame:
    """``(unit, word, bits)`` packed Bloom bitsets: one map-side-
    combinable bit_or agg keyed by (unit, word) — a single scan of
    ``df`` whatever m is."""
    probes = F.array(
        *[
            F.pmod(
                hash60(
                    F.concat_ws(":", F.lit(str(i)), F.col(key_col).cast("string"))
                ),
                F.lit(m_bits),
            )
            for i in range(n_hashes)
        ]
    )
    bits = df.select(F.col(unit_col).alias("unit"), F.explode(probes).alias("bit"))
    return bits.groupBy("unit", F.expr("bit div 64").alias("word")).agg(
        F.bit_or(F.expr("shiftleft(1L, CAST(bit % 64 AS INT))")).alias("bits")
    )


def probe_rows(
    keys: list, m_bits: int = BLOOM_M_BITS, n_hashes: int = BLOOM_N_HASHES
) -> list[tuple[int, int, int]]:
    """(key_index, word, mask) rows for a broadcast probe relation."""
    rows = []
    for kid, key in enumerate(keys):
        for bit in probe_bits(key, m_bits, n_hashes):
            word, r = bit // 64, bit % 64
            mask = (1 << r) - ((1 << 64) if r == 63 else 0)
            rows.append((kid, word, mask))
    return rows


def candidate_units(
    spark,
    index: DataFrame,
    keys: list,
    m_bits: int = BLOOM_M_BITS,
    n_hashes: int = BLOOM_N_HASHES,
) -> list[str]:
    """Units that may contain ANY of ``keys`` (no false negatives):
    a unit qualifies for a key iff every one of its probe bits is set.
    Output bounded by the unit count — planning-time metadata."""
    probes = spark.createDataFrame(
        probe_rows(keys, m_bits, n_hashes), "kid long, word long, mask long"
    )
    hits = (
        index.join(F.broadcast(probes), "word")
        .filter(F.expr("(bits & mask) = mask"))
        .groupBy("unit", "kid")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .filter(F.col("n_hit") >= n_hashes)
        .select("unit")
        .distinct()
    )
    return [r.unit for r in hits.collect()]
