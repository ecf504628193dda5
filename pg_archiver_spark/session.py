"""SparkSession construction.

The reference is single-threaded and row-at-a-time (main.go:54 writer np=1,
main.go:181-187 sequential table loop). Here every knob is set for the
opposite: partition-parallel scans, AQE re-planning, Arrow-batched Python
boundaries. The same builder works on a real cluster — only `master` and
memory change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Local test default. On a cluster these come from spark-submit / the
# cluster manager; everything below that is master-independent.
_LOCAL_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "pg_archiver_spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or get) a SparkSession tuned for this engine.

    shuffle_partitions: default = local core count. At 100 TB this should
    be ~2-3x total executor cores (or left to AQE coalescing from a high
    initial value); at sf0.1 on one box a small value avoids tiny-task
    overhead.
    """
    n_shuffle = str(shuffle_partitions or _LOCAL_CPUS)
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", n_shuffle)
        # AQE: runtime re-plan — coalesce small shuffle partitions, convert
        # sort-merge→broadcast when a side turns out small, split skewed
        # partitions. All three matter at 100 TB and cost nothing locally.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for any pandas_udf / toPandas boundary (10-100x vs pickle).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Deterministic timestamps across engines (SURVEY.md §8 G1).
        .config("spark.sql.session.timeZone", "UTC")
        # events.ts is Parquet timestamp[ns]; Spark has no ns type — read as
        # long and convert explicitly (catalog.load normalizes).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Dimension tables (region/nation/supplier/part) stay broadcast-able.
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        # Small local fixture files would otherwise become one scan task
        # (default 128m); at cluster scale files are many and this only
        # caps per-task input.
        .config("spark.sql.files.maxPartitionBytes", "16m")
        # Keep catalog-managed table metadata out of the repo cwd.
        .config("spark.sql.warehouse.dir", "/tmp/pg_archiver_spark/warehouse")
        .config("spark.ui.enabled", "false")
    )
    if not os.environ.get("SPARK_GRAFT_ON_CLUSTER"):
        builder = builder.master(f"local[{_LOCAL_CPUS}]").config("spark.driver.memory", "48g")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
