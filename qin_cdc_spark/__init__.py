"""qin_cdc_spark — a PySpark-native analytics + CDC engine.

A from-scratch re-expression of the data-processing capabilities of the
reference CDC pipeline (sqlpub/qin-cdc, surveyed in /root/repo/SURVEY.md)
as an idiomatic Spark engine:

- CDC envelope stream (db, table, op, seq, ts, data, old) → routed,
  transformed, last-writer-wins-merged managed tables (batch + Structured
  Streaming `foreachBatch`).
- A full relational query surface over the synced tables (joins, aggs,
  windows, set ops, scalar functions) — Catalyst does the optimization.
- LLM-data-pipeline operators designed for 100 TB scale: dedup (exact,
  MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine), similarity
  search, text analysis, multimodal column plumbing.
"""

__version__ = "0.1.0"

from qin_cdc_spark.session import get_spark  # noqa: F401
