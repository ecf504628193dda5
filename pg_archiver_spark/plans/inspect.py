"""Physical-plan inspection helpers.

Used by tests and the perf pass to assert the plans we designed for are
the plans Catalyst actually produces: filters/projections reaching the
Parquet scan, dimensions broadcast, no stray cross products.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def assert_in_plan(df: DataFrame, *needles: str) -> None:
    plan = physical_plan(df)
    for needle in needles:
        assert needle in plan, f"{needle!r} not in plan:\n{plan}"


def assert_not_in_plan(df: DataFrame, *needles: str) -> None:
    plan = physical_plan(df)
    for needle in needles:
        assert needle not in plan, f"{needle!r} unexpectedly in plan:\n{plan}"


def count_shuffles(df: DataFrame) -> int:
    """Number of exchange (shuffle) operators in the physical plan."""
    plan = physical_plan(df)
    return sum(
        line.strip().startswith("Exchange") or "ShuffleExchange" in line
        for line in plan.splitlines()
        if "Exchange" in line and "reuse" not in line.lower()
    )
