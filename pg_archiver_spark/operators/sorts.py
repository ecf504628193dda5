"""Sort / limit / top-k operators.

The reference's whole extraction query is one sorted-limit scan:
``SELECT id, timestamp, device_id, value FROM <t> WHERE timestamp < $1
ORDER BY timestamp DESC LIMIT $2`` plus a lineage literal
(reference main.go:88-93, main.go:114). Spark expresses the same shape as
filter → orderBy → limit, which the physical planner collapses into
``TakeOrderedAndProject`` — a per-partition top-k + single k-row merge,
no global sort shuffle. That plan is 100 TB-safe: each task keeps only k
rows regardless of input size.

Determinism: sort on epoch-ms, never raw ns-timestamps (SURVEY.md §8 G1),
and always include a unique tiebreak key (G5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pg_archiver_spark.catalog import load, ts_literal
from pg_archiver_spark.registry import register

# Archival cutoff anchored to a literal inside the events data range
# ([2024-01-01, 2024-01-31)) — not wall-clock (G9; contrast main.go:177).
CUTOFF = "2024-01-15 00:00:00"


def archive_selection(spark: SparkSession, sf_dir: str, limit: int = 100) -> DataFrame:
    """The pg-archiver extraction query, Spark-first (main.go:88-93,114).

    filter < cutoff → order by (epoch-ms desc, event_id) → limit →
    project → tag lineage literal. The cutoff predicate is on the ``ts``
    scan attribute so it reaches the Parquet row-group stats; sort+limit
    become TakeOrderedAndProject (per-partition top-k, no global sort).
    """
    events = load(spark, sf_dir, "events")
    return (
        events.filter(F.col("ts") < F.lit(ts_literal(CUTOFF)))
        .withColumn("epoch_ms", F.expr("ts_ns DIV 1000000"))
        .orderBy(F.col("epoch_ms").desc(), F.col("event_id"))
        .limit(limit)
        .select(
            "event_id",
            "epoch_ms",
            "user_id",
            "value",
            F.lit("iot_data").alias("table_name"),
        )
    )


@register(
    "orderby_limit_topk",
    oracle=f"""
    SELECT event_id,
           epoch_ms(ts) AS epoch_ms,
           user_id,
           value,
           'iot_data' AS table_name
    FROM events
    WHERE ts < TIMESTAMP '{CUTOFF}'
    ORDER BY epoch_ms DESC, event_id
    LIMIT 100
    """,
)
def orderby_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return archive_selection(spark, sf_dir)


@register(
    "global_topk_orders",
    oracle="""
    SELECT o_orderkey,
           o_custkey,
           CAST(o_totalprice AS DOUBLE) AS totalprice,
           o_orderstatus
    FROM orders
    ORDER BY totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def global_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            F.col("o_totalprice").cast("double").alias("totalprice"),
            "o_orderstatus",
        )
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


BOTTOMK_K = 10


@register(
    "sample_bottomk_sketch",
    oracle=f"""
    WITH ranked AS (
        SELECT event_type, event_id,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type
                   ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
               ) AS pos
        FROM events
    )
    SELECT event_type, CAST(pos AS BIGINT) AS pos, event_id
    FROM ranked WHERE pos <= {BOTTOMK_K}
    """,
)
def sample_bottomk_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k hash sketch per group — the MERGEABLE uniform sample: a
    row is kept iff its content hash ranks among the group's k
    smallest. Because "k smallest hashes" commutes with union, per-day
    (or per-shard) sketches merge into exactly the global sketch — the
    property (proven in tests) that makes this the retry-safe,
    incremental alternative to rand()-reservoir sampling, and the same
    sketch doubles as a distinct-count estimator (k-th smallest hash ≈
    k/|D| of the hash space — the KMV estimator).

    Plan: one shuffle on the group key, per-group top-k by hash rank —
    at 100 TB, map-side partial top-k (each task keeps ≤ k per group
    before the exchange) bounds the shuffle at tasks×groups×k rows.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string")), "event_id"
    )
    return (
        ev.select(
            "event_type",
            "event_id",
            F.row_number().over(w).cast("bigint").alias("pos"),
        )
        .filter(F.col("pos") <= BOTTOMK_K)
        .select("event_type", "pos", "event_id")
    )
