"""Vector column functions for embedding similarity — JVM higher-order
functions (zip_with/aggregate), no Python in the execution path.

Floats are cast to double element-wise before multiply/accumulate and
summed left-to-right, matching the DuckDB oracle expression
``list_sum(list_transform(list_zip(a,b), x -> CAST(x[1] AS DOUBLE) *
CAST(x[2] AS DOUBLE)))`` bit-for-bit.
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from pyspark.sql import Column


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def hyperplanes(n_planes: int, dim: int) -> list[list[int]]:
    """Deterministic ±1 random-hyperplane matrix for sign-LSH, generated
    from md5 so the DuckDB oracle can inline the identical literals."""
    planes = []
    for j in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"plane:{j}:{d}".encode()).hexdigest()
            row.append(1 if int(h[0], 16) < 8 else -1)
        planes.append(row)
    return planes


def signature_bits(emb: Column, planes: list[list[int]]) -> Column:
    """Sign-LSH signature: bit j = 1 iff dot(emb, plane_j) > 0.
    Returned as array<int> of 0/1 — row-local, shuffle-free."""
    return F.array(
        *[
            F.when(
                F.aggregate(
                    F.zip_with(
                        emb,
                        F.array(*[F.lit(float(w)) for w in plane]),
                        lambda x, w: x.cast("double") * w,
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                > 0,
                1,
            ).otherwise(0)
            for plane in planes
        ]
    )
