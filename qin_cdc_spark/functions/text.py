"""Text-analysis column functions — all JVM-side built-ins, zero UDFs.

Everything here is a Column→Column expression usable inside
whole-stage codegen; nothing crosses into Python at execution time.
Deterministic hashing uses md5 (stable across engines) with the top 15
hex digits reinterpreted as a 60-bit non-negative int64 — the same
construction the DuckDB oracles use (`('0x'||substr(md5(x),1,15))::BIGINT`).

Scale design: per-document features (tokens, shingles, MinHash
signatures, SimHash) are ROW-LOCAL — computed with higher-order array
functions inside the row, no explode, no shuffle.  The only shuffles in
the dedup pipelines are the final candidate-pair joins on band keys.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# 2^31 - 1 (prime): modulus for the MinHash permutation family.
MERSENNE31 = 2147483647


def normalize_text(text: Column) -> Column:
    """Whitespace-collapse + trim + lowercase — the canonical form for
    exact dedup (reference has no text ops; this is north-star §2.C)."""
    return F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))


def md5_fingerprint(text: Column) -> Column:
    """128-bit content fingerprint as hex."""
    return F.md5(text)


def hash60(col: Column) -> Column:
    """md5-derived 60-bit non-negative int64, engine-portable."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def words(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def window_joins(w: Column, k: int, keep: Column) -> Column:
    """Space-joined k-word windows at every start position (stride 1),
    built by k-1 ``zip_with`` passes over shifted copies of the words
    array instead of a per-position
    ``transform(sequence(...), i -> concat_ws(slice(w, i, k)))``:
    higher-order lambdas run INTERPRETED (no whole-stage codegen), so
    per-element work dominates — the slice shape pays an array
    allocation + copy per window position, while zip_with pays k-1
    whole-array traversals with one string concat per element (measured
    3× faster on the shingle-explode kernel at sf0.1, byte-identical
    output — OPTIMIZATION_r10, guide §1/§4 "per-task work").

    ``zip_with`` pads the shorter side with NULL and ``concat_ws``
    skips NULLs, so entry i (1-based) is the join of
    w[i .. min(i+k-1, n)] — a PARTIAL window when fewer than k words
    remain, exactly like ``concat_ws`` over a truncated slice.
    ``keep`` bounds the output: callers pass the positional count of
    the sequence-based definition they replace (e.g. n-k+1 for full
    windows only, max(1, n-k+1) to keep one partial window for short
    docs).
    """
    n = F.size(w)
    out = w
    for j in range(1, k):
        shifted = F.slice(w, j + 1, F.greatest(F.lit(0), n - j))
        out = F.zip_with(out, shifted, lambda a, b: F.concat_ws(" ", a, b))
    return F.slice(out, 1, keep)


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-word shingles, row-local — ``window_joins`` with the
    max(1, n-k+1) bound (a document shorter than k words yields its
    single partial shingle) and a distinct pass."""
    w = words(text)
    return F.array_distinct(
        window_joins(w, k, F.greatest(F.lit(1), F.size(w) - (k - 1)))
    )


def _perm_params(i: int) -> tuple[int, int]:
    """Deterministic MinHash permutation family: a_i, b_i in [1, M)."""
    a = (1103515245 * (i + 1) + 12345) % MERSENNE31
    if a == 0:
        a = 1
    b = (2654435761 * (i + 1) + 1013904223) % MERSENNE31
    return a, b


def perm_params_sql(n: int) -> list[tuple[int, int]]:
    """The (a_i, b_i) family, for inlining into oracle SQL."""
    return [_perm_params(i) for i in range(n)]


def shingle_hashes(shingles: Column) -> Column:
    """hash60 % M of each shingle — materialize this ONCE (own projection
    + persist) before fanning out to the permutation family: inlining it
    into each of the 64 array_mins re-runs every md5 64×."""
    return F.transform(shingles, lambda s: hash60(s) % MERSENNE31)


def minhash_from_hashes(hashed: Column, n_hashes: int = 64) -> Column:
    """MinHash signature as array<bigint> from precomputed shingle
    hashes, fully row-local.

    For each permutation i: min over hashes of (a_i * h + b_i) % M,
    with M = 2^31-1 so the product stays under 2^62 (no int64 overflow —
    DuckDB would error, Java would silently wrap; staying exact keeps
    both engines identical).
    """
    params = perm_params_sql(n_hashes)

    def _perm(a: int, b: int):
        # closure (not default-args) — PySpark inspects lambda arity
        return lambda h: (F.lit(a) * h + F.lit(b)) % MERSENNE31

    return F.array(
        *[F.array_min(F.transform(hashed, _perm(a, b))) for a, b in params]
    )


def minhash_signature(shingles: Column, n_hashes: int = 64) -> Column:
    """Convenience form; prefer shingle_hashes + minhash_from_hashes with
    a materialization barrier between them (see dedup_minhash_lsh)."""
    return minhash_from_hashes(shingle_hashes(shingles), n_hashes)


def lsh_band_keys(signature: Column, n_bands: int, rows_per_band: int) -> Column:
    """Slice a signature into band-key strings: docs sharing any band key
    are near-dup candidates.  Banding turns all-pairs O(n²) similarity
    into |bucket|² joins — the 100 TB path."""
    return F.array(
        *[
            F.concat_ws(
                ",",
                F.lit(str(band)),
                *[
                    F.element_at(signature, band * rows_per_band + r + 1).cast("string")
                    for r in range(rows_per_band)
                ],
            )
            for band in range(n_bands)
        ]
    )


def token_hashes(tokens: Column) -> Column:
    """hash60 of each distinct token — materialize once before
    simhash_from_hashes (same 60× md5-recompute hazard as MinHash)."""
    return F.transform(F.array_distinct(tokens), lambda t: hash60(t))


def simhash_from_hashes(hashed: Column) -> Column:
    """60-bit SimHash from precomputed token hashes, row-local.

    bit j of the result = 1 iff sum over tokens of (+1 if bit j of
    hash60(token) else -1) > 0.
    """

    def _bit_sum(j: int) -> Column:
        # bit positions are plan-time constants (shiftright needs an int)
        return F.aggregate(
            hashed,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    bit_vals = F.array(
        *[
            F.when(_bit_sum(j) > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
            for j in range(60)
        ]
    )
    return F.aggregate(bit_vals, F.lit(0).cast("long"), lambda acc, x: acc + x)


def simhash60(tokens: Column) -> Column:
    """Convenience form; prefer token_hashes + simhash_from_hashes with
    a materialization barrier between them."""
    return simhash_from_hashes(token_hashes(tokens))


# Language-marker word lists for the n-gram/stopword language heuristic.
# Shared (inlined) with the DuckDB oracle — keep in sync with
# operators/llm_text.py::LANG_MARKERS_SQL.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "es": ["el", "la", "de", "que", "y", "los", "en", "un", "por", "con"],
    "de": ["der", "die", "und", "das", "nicht", "von", "sie", "ist", "des", "ein"],
    "fr": ["le", "la", "les", "des", "est", "vous", "une", "dans", "qui", "pas"],
}

EN_STOPWORDS = LANG_MARKERS["en"]


def marker_hits(text_lower: Column, markers: list[str]) -> Column:
    """Count of tokens that are marker words (JVM-side regexp count)."""
    pattern = r"\b(" + "|".join(markers) + r")\b"
    return F.size(F.regexp_extract_all(text_lower, F.lit(pattern), F.lit(0)))


def cjk_char_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(r"[\x{4e00}-\x{9fff}]"), F.lit(0)))
