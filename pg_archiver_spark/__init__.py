"""pg_archiver_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference tool (pg-archiver: a
Postgres→Parquet→S3 time-series archiver, /root/reference/main.go) as an
idiomatic Spark engine: declarative DataFrame/SQL plans optimized by
Catalyst, partitioned Parquet sinks, Structured Streaming archival, plus
the LLM-data-pipeline operator family (dedup, similarity search,
multimodal columns, text analysis) designed for 100 TB scale.

Package layout:
    session     — SparkSession builders tuned for local testing / cluster scale
    catalog     — fixture table loading (one call per table, schema-stable)
    registry    — the operator contract: name → (spark fn, oracle SQL)
    operators/  — relational operator implementations (joins, aggs, windows, ...)
    functions/  — scalar/text/similarity function implementations
    sources/    — JDBC + Parquet sources
    streaming/  — Structured Streaming ops + the archival pipeline
    plans/      — plan inspection helpers (explain capture, shuffle counting)
"""

from pg_archiver_spark.registry import QUERIES, ORACLES, register

__all__ = ["QUERIES", "ORACLES", "register"]
