"""Parquet table loaders for the driver fixtures (TESTDATA.md).

At 100 TB these reads stay efficient because everything downstream is
declared on the DataFrame API: Catalyst pushes filters and column pruning
into the parquet scan (check ``PushedFilters`` / ``ReadSchema`` in
``.explain``), and partition-count is governed by
``spark.sql.files.maxPartitionBytes`` rather than file count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale factor
# (region/nation are fixed-size; supplier/part grow slowly with SF).
BROADCASTABLE = frozenset({"region", "nation", "supplier", "part"})

# Primary keys per table — drives CDC MERGE keys and dedup identities.
PRIMARY_KEYS: dict[str, tuple[str, ...]] = {
    "region": ("r_regionkey",),
    "nation": ("n_nationkey",),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey",),
    "lineitem": ("l_orderkey", "l_linenumber"),
    "events": ("event_id",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}


def ensure_session_defaults(spark: SparkSession) -> None:
    """Runtime-settable session invariants the engine depends on, applied
    defensively because the correctness driver supplies its own session:
    UTC timestamps (DuckDB-oracle parity) and Arrow-batched pandas UDFs.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    # Fixture parquet writes naive timestamp[us]; read it as TimestampType
    # (session-tz UTC ⇒ wall clock == instant), not TIMESTAMP_NTZ.  Keeps
    # ANSI casts (ts → long) legal, parquet filter pushdown on date columns
    # intact, and matches how the DuckDB oracle reads the same files.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; expected one of {TABLES}")
    ensure_session_defaults(spark)
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects.  Read it as raw nanos (legacy conf) and floor-convert
    to a microsecond TimestampType — same truncation DuckDB applies when
    surfacing ns timestamps, so oracle parity holds."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes)["ts"] == "bigint":
        # integer `div`, not `/1000`: epoch-nanos exceed double's 2^53
        # mantissa, so float division is off by ±1 µs
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
