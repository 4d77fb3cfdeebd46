from qin_cdc_spark.sources.tables import TABLES, load_table, load_all, register_views  # noqa: F401
