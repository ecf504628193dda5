"""Fixture-table catalog.

One loader per table, reading the driver-generated Parquet under a
scale-factor directory (TESTDATA.md). The reference hardcodes one schema
(main.go:20-26 IoTRecord); here the schema travels with the Parquet footer
and Catalyst prunes columns/row-groups from the declarative plan — no
schema code needed per table.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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

# Small dimension tables that should always broadcast in joins. At 100 TB
# the facts (orders/lineitem/events) grow; these stay ~fixed size.
DIM_TABLES = frozenset({"region", "nation", "supplier", "part"})


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Lazy — no I/O until an action runs.

    ``events.ts`` is Parquet ``timestamp[ns]``, which Spark cannot
    represent — we read it as a long (ns since epoch) and expose BOTH:
      - ``ts_ns`` long — the raw value; range predicates on it push down
        to Parquet row-group min/max stats (filter on this for pruning),
      - ``ts`` TimestampType — µs-floored, for window/date functions.
    Floor(ns→µs)∘floor(µs→ms) == floor(ns→ms), so epoch-ms derived from
    either column matches DuckDB's ``epoch_ms`` exactly (SURVEY.md §8 G1).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # Runtime-settable; needed even when the caller built the session
        # (the driver harness passes its own SparkSession). UTC pins the
        # window/day-boundary math of downstream ops to the oracle's
        # timezone-naive arithmetic regardless of the host JVM zone.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumnRenamed("ts", "ts_ns").withColumn(
            "ts", F.timestamp_micros(F.expr("ts_ns DIV 1000"))
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def ts_ns_literal(cutoff: str) -> int:
    """Epoch-nanoseconds of a 'YYYY-MM-DD[ HH:MM:SS]' UTC literal, for
    pushdown-friendly predicates on events.ts_ns."""
    fmt = "%Y-%m-%d %H:%M:%S" if " " in cutoff else "%Y-%m-%d"
    dt = datetime.strptime(cutoff, fmt).replace(tzinfo=timezone.utc)
    return int(dt.timestamp()) * 1_000_000_000


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}
