"""Projection / filter / predicate / cast operators.

Reference parity: A2 projection (main.go:89), A3 range cutoff filter
(main.go:91), A6 literal lineage column (main.go:25,114), A9 epoch cast
(main.go:39), plus the README-documented downstream predicates:
conjunctions (README.md:93-95) and IN-lists (README.md:100).

Every predicate here is a plain Catalyst expression, so it pushes down
to the Parquet scan (and, for a JDBC source, into the remote SQL) —
the Spark-native version of the reference writing its WHERE clause into
the SQL string it sends to Postgres.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_archiver_spark.catalog import load, ts_literal
from pg_archiver_spark.registry import register


@register(
    "project_prune",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_quantity > 45
    """,
)
def project_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-of-11 column projection + selective filter (reference A2).

    .explain shows ReadSchema with exactly these columns and
    PushedFilters: [GreaterThan(l_quantity,45.0)].
    """
    return (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@register(
    "select_literal",
    oracle="""
    SELECT event_id, 'iot_data' AS table_name
    FROM events
    WHERE event_type = 'signup'
    """,
)
def select_literal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineage literal tagging (reference A6, main.go:25,114)."""
    return (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "signup")
        .select("event_id", F.lit("iot_data").alias("table_name"))
    )


@register(
    "filter_range_cutoff",
    oracle="""
    SELECT COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    WHERE ts < TIMESTAMP '2024-01-15 00:00:00'
    """,
)
def filter_range_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The archival cutoff predicate (reference A3, main.go:91).

    Filter is on the ``ts`` scan attribute so Parquet row-group stats
    prune; both engines compare the same µs-precision values.
    """
    events = load(spark, sf_dir, "events")
    return events.filter(
        F.col("ts") < F.lit(ts_literal("2024-01-15 00:00:00"))
    ).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "filter_conjunction",
    oracle="""
    SELECT event_id
    FROM events
    WHERE event_type = 'purchase'
      AND value >= 100
      AND ts >= TIMESTAMP '2024-01-10 00:00:00'
    """,
)
def filter_conjunction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive predicate (README.md:93-95 downstream query shape)."""
    events = load(spark, sf_dir, "events")
    return events.filter(
        (F.col("event_type") == "purchase")
        & (F.col("value") >= 100)
        & (F.col("ts") >= F.lit(ts_literal("2024-01-10 00:00:00")))
    ).select("event_id")


@register(
    "filter_in_list",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY o_orderstatus
    """,
)
def filter_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list predicate (README.md:100 downstream query shape)."""
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "filter_null_safe",
    oracle="""
    SELECT COALESCE(NULLIF(l_returnflag, 'N'), 'NONE') AS flag,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY flag
    """,
)
def filter_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null propagation semantics: NULLIF introduces NULLs, COALESCE
    collapses them — verifies three-valued logic matches ANSI."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("NONE")).alias(
            "flag"
        )
    ).agg(F.count("*").alias("n_rows"))


@register(
    "cast_epoch_ms",
    oracle="""
    SELECT event_id, epoch_ms(ts) AS epoch_ms
    FROM events
    """,
)
def cast_epoch_ms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp → epoch milliseconds (reference A9, main.go:39 — the
    reference erases to epoch-ns at write time; we expose the cast as an
    explicit operator and keep the stored type intact, fixing D5).

    Floor(ns→ms) on the raw long == DuckDB epoch_ms on the ns value.
    """
    return load(spark, sf_dir, "events").select(
        "event_id", F.expr("ts_ns DIV 1000000").alias("epoch_ms")
    )
