"""Subquery operators — scalar, correlated EXISTS, NOT IN.

Catalyst rewrites all of these into joins (scalar → cross join of a
1-row aggregate; EXISTS → left-semi; NOT IN → null-aware left-anti), so
their scale behavior is the join section's. Declared through spark.sql
to exercise the SQL front-end path of the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pg_archiver_spark.catalog import load
from pg_archiver_spark.registry import register


@register(
    "subquery_scalar",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n_orders
    FROM orders
    WHERE CAST(o_totalprice AS DECIMAL(18,2)) >
          (SELECT MAX(CAST(o_totalprice AS DECIMAL(18,2))) - 10000 FROM orders)
    GROUP BY o_orderstatus
    """,
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery threshold (decimal-exact, so the comparison has
    no fp boundary; a double AVG threshold would flake rows near it)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_sq")
    return spark.sql(
        """
        SELECT o_orderstatus, COUNT(*) AS n_orders
        FROM orders_sq
        WHERE CAST(o_totalprice AS DECIMAL(18,2)) >
              (SELECT MAX(CAST(o_totalprice AS DECIMAL(18,2))) - 10000 FROM orders_sq)
        GROUP BY o_orderstatus
        """
    )


@register(
    "subquery_exists_correlated",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderstatus = 'F'
          AND CAST(o_totalprice AS DECIMAL(18,2)) > 200000
    )
    GROUP BY c_mktsegment
    """,
)
def subquery_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS — Catalyst decorrelates to a left-semi join on
    the correlation key."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_sq")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_sq2")
    return spark.sql(
        """
        SELECT c_mktsegment, COUNT(*) AS n_customers
        FROM customer_sq
        WHERE EXISTS (
            SELECT 1 FROM orders_sq2
            WHERE o_custkey = c_custkey
              AND o_orderstatus = 'F'
              AND CAST(o_totalprice AS DECIMAL(18,2)) > 200000
        )
        GROUP BY c_mktsegment
        """
    )


@register(
    "subquery_not_in",
    oracle="""
    SELECT COUNT(*) AS n_customers
    FROM customer
    WHERE c_custkey NOT IN (
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    """,
)
def subquery_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN — null-aware anti-join (o_custkey has no NULLs in the
    fixture, so both engines agree on the ANSI three-valued semantics)."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_sq3")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_sq3")
    return spark.sql(
        """
        SELECT COUNT(*) AS n_customers
        FROM customer_sq3
        WHERE c_custkey NOT IN (
            SELECT o_custkey FROM orders_sq3 WHERE o_orderpriority = '1-URGENT'
        )
        """
    )
