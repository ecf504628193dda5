"""JDBC source — the reference's Postgres extraction (A1, main.go:88-121),
Spark-native.

The reference opens one connection and walks a cursor row-at-a-time
(main.go:108-121). Spark's JDBC source replaces that with partitioned
parallel reads plus pushdown: the projection, the cutoff predicate, and
the limit all execute inside the remote database — exactly what the
reference achieves by writing its SQL string by hand, but across
``numPartitions`` concurrent range-split cursors.

No database ships in this harness, so ``read_table`` degrades to the
staging-parquet path when no URL is configured; the op reports which
path ran (SURVEY.md §7.4 #5: must not fail the suite).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_archiver_spark.catalog import load
from pg_archiver_spark.registry import register

# Standard PG JDBC env configuration; unset in this harness.
_URL_ENV = "PG_ARCHIVER_JDBC_URL"


def read_table(
    spark: SparkSession,
    table: str,
    sf_dir: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
) -> tuple[DataFrame, str]:
    """Read one source table via JDBC when configured, else parquet.

    JDBC path mirrors the reference's extraction contract with pushdown
    enabled and, when a numeric partition column is given, range-split
    parallel cursors (lowerBound/upperBound probed with one min/max
    round-trip — the scale replacement for the single cursor loop).
    """
    url = os.environ.get(_URL_ENV)
    if not url:
        return load(spark, sf_dir, table), "parquet-fallback"

    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("pushDownPredicate", "true")
        .option("pushDownLimit", "true")
    )
    if partition_column:
        bounds = (
            spark.read.format("jdbc")
            .option("url", url)
            .option(
                "query",
                f"SELECT MIN({partition_column}) lo, MAX({partition_column}) hi FROM {table}",
            )
            .load()
            .first()
        )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(bounds["lo"]))
            .option("upperBound", str(bounds["hi"]))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load(), "jdbc"


def delete_archived(spark: SparkSession, table: str, key_df: DataFrame) -> int:
    """Delete-behind (reference A13, main.go:131-145) — D1-fixed contract.

    The reference deletes everything below the cutoff even though it
    archived at most 100 rows. The correct contract is: delete exactly
    the archived keys. With a JDBC sink this runs inside foreachBatch as
    `DELETE FROM t WHERE id = ANY(keys)` per partition; without a
    database we only expose the key-set computation (see
    streaming.archival's ledger).
    """
    if not os.environ.get(_URL_ENV):
        return 0
    raise NotImplementedError(
        "JDBC delete-behind requires a live database; wire via foreachBatch"
    )


@register("source_jdbc")  # rows-only: environment-dependent source
def source_jdbc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JDBC round-trip profile: reads events through read_table (JDBC
    when PG_ARCHIVER_JDBC_URL is set, else the parquet fallback) and
    runs the reference's extraction shape over it."""
    df, mode = read_table(spark, "events", sf_dir, partition_column="event_id")
    extracted = df.filter(
        F.col("ts") < F.lit("2024-01-15 00:00:00").cast("timestamp")
    )
    return extracted.agg(
        F.lit(mode).alias("source_mode"),
        F.count("*").alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
    )
