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


@register(
    "subquery_lateral_topn",
    oracle="""
    SELECT c.c_custkey,
           o.o_orderkey,
           CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
               AS total_price
    FROM customer c,
    LATERAL (
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 2
    ) o
    """,
)
def subquery_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY … LIMIT — the
    'top 2 orders for EACH customer' spelling SQL users reach for.
    Catalyst's DecorrelateInnerQuery rewrites the per-customer re-scan
    into one join plus a per-key rank filter, so the plan is the same
    shuffle-once shape as `window_topk_per_group` — no N re-executions
    of the inner query (the lateral is syntax, not execution strategy;
    that is the whole 100 TB point). Inner customers with no orders
    drop out (inner lateral), matching the oracle."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_lat")
    return spark.sql(
        """
        SELECT c.c_custkey,
               o.o_orderkey,
               CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
                   AS total_price
        FROM customer_lat c,
        LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM orders_lat
            WHERE o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 2
        ) o
        """
    )
