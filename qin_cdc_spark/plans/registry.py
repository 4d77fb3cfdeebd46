"""Central query/oracle registry.

Collects every operator module's ``QUERIES`` (name → (spark, sf_dir) →
DataFrame) and ``ORACLES`` (name → DuckDB SQL) into the flat dicts the
driver consumes through ``__spark_entry__``.  A query without an oracle
entry is a declared non-SQL-expressible operator (weaker rows-only
check, per the driver contract).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def _collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}

    import qin_cdc_spark.operators.relational as relational
    import qin_cdc_spark.operators.relational_ext as relational_ext

    import qin_cdc_spark.operators.tpch_ext as tpch_ext

    modules = [relational, relational_ext, tpch_ext]

    try:
        import qin_cdc_spark.operators.llm_text as llm_text

        modules.append(llm_text)
    except ImportError:
        pass
    try:
        import qin_cdc_spark.operators.llm_ext as llm_ext

        modules.append(llm_ext)
    except ImportError:
        pass
    try:
        import qin_cdc_spark.operators.scale_joins as scale_joins

        modules.append(scale_joins)
    except ImportError:
        pass
    try:
        import qin_cdc_spark.operators.similarity as similarity

        modules.append(similarity)
    except ImportError:
        pass
    try:
        import qin_cdc_spark.operators.curation as curation

        modules.append(curation)
    except ImportError:
        pass
    try:
        import qin_cdc_spark.operators.multimodal as multimodal

        modules.append(multimodal)
    except ImportError:
        pass
    try:
        import qin_cdc_spark.operators.udf_surface as udf_surface

        modules.append(udf_surface)
    except ImportError:
        pass
    try:
        import qin_cdc_spark.operators.ivf as ivf

        modules.append(ivf)
    except ImportError:
        pass
    try:
        import qin_cdc_spark.cdc.queries as cdc_queries

        modules.append(cdc_queries)
    except ImportError:
        pass
    try:
        import qin_cdc_spark.streaming.queries as streaming_queries

        modules.append(streaming_queries)
    except ImportError:
        pass

    for mod in modules:
        for name, fn in getattr(mod, "QUERIES", {}).items():
            if name in queries:
                raise ValueError(f"duplicate query name {name!r} in {mod.__name__}")
            queries[name] = fn
        for name, sql in getattr(mod, "ORACLES", {}).items():
            oracles[name] = sql

    unknown = set(oracles) - set(queries)
    if unknown:
        raise ValueError(f"oracle without query: {sorted(unknown)}")
    return queries, oracles


def all_queries() -> dict[str, QueryFn]:
    return _collect()[0]


def all_oracles() -> dict[str, str]:
    return _collect()[1]
