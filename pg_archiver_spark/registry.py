"""The operator contract registry.

Every operator declared in SURVEY.md §2.B registers here exactly once:
a name, a Spark query function (spark, sf_dir) -> DataFrame, and (when
SQL-expressible) the equivalent DuckDB oracle SQL. ``__spark_entry__.py``
exposes these to the driver harness.

Register with the decorator:

    @register("project_prune", oracle="SELECT ... FROM lineitem ...")
    def project_prune(spark, sf_dir):
        ...

Rows-only ops (no DuckDB equivalent) pass oracle=None.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate operator registration: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all_operators() -> None:
    """Import every module that registers operators (idempotent)."""
    # Imports are for their registration side effects.
    from pg_archiver_spark.operators import (  # noqa: F401
        aggregates,
        filters,
        joins,
        scans,
        setops,
        sorts,
        subqueries,
        windows,
    )
    from pg_archiver_spark.functions import (  # noqa: F401
        dedup,
        multimodal,
        pipeline,
        scalars,
        similarity,
        text,
        udfs,
    )
    from pg_archiver_spark.streaming import windows as stream_windows  # noqa: F401
    from pg_archiver_spark.streaming import archival  # noqa: F401
    from pg_archiver_spark.sources import jdbc  # noqa: F401
