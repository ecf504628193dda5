"""Two-pass bucket-offset replacements for global (unpartitioned)
window functions.

``Window.orderBy(...)`` with no ``partitionBy`` makes WindowExec move
the ENTIRE input frame to one task — the one operator class whose cost
explodes silently at 100 TB (the plan carries no CartesianProduct, no
BroadcastNestedLoopJoin, just a 1-partition exchange). These helpers
implement the standard two-phase rewrite (the window_ntile_scalable /
pipeline_token_budget trick, factored out so corpus-cardinality ops can
share it):

1. assign each row to one of ``n_buckets`` range buckets with
   ``width_bucket`` over the order key — monotone, so bucket order ==
   global order;
2. run the window PARTITIONED by bucket (each task sorts ≤ corpus/256);
3. reconstruct the exact global result by adding a per-bucket offset
   from a ≤``n_buckets``-row prefix frame (the ONLY remaining global
   window runs on that bounded anchor, which planaudit whitelists).

Bucket balance follows the key distribution; for pathological skew swap
the uniform ``width_bucket`` grid for ``percentile_approx`` cutpoints —
the reconstruction is unchanged.

Reference parity: no reference counterpart (main.go:88-241 has no
window functions at all); this is Spark-scale engineering for the ops
SURVEY §2 adds beyond the reference surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_BUCKETS = 256


def bucketed_prefix_sums(
    df: DataFrame,
    order_col: str,
    sum_cols: list[str],
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Exact EXCLUSIVE prefix sums (and grand totals) of ``sum_cols``
    in ``order_col`` order, without a single-task global window.

    ``df`` must be DISTINCT on ``order_col`` (the groupBy(v) frames the
    rank statistics build); ``order_col`` must be numeric. Adds, for
    each c in sum_cols, ``{c}_prefix`` = sum of c over rows with a
    strictly smaller order key (0 for the first row) and ``{c}_tot`` =
    the grand total. Inclusive cumulative sums are
    ``{c}_prefix + c``.

    Plan: 1-row (min, max) anchor broadcast → bucket groupBy (≤
    n_buckets result rows) → global prefix window over THAT bounded
    frame only → broadcast equi-join back → per-bucket window (each
    task holds ≤ |df|/n_buckets rows under a uniform key grid).
    """
    mm = df.agg(
        F.min(order_col).cast("double").alias("__lo"),
        (F.max(order_col).cast("double") + F.lit(1.0)).alias("__hi"),
    )
    bucketed = df.crossJoin(F.broadcast(mm)).withColumn(
        "__bucket",
        F.width_bucket(
            F.col(order_col).cast("double"),
            F.col("__lo"),
            F.col("__hi"),
            F.lit(n_buckets),
        ),
    )
    w_prefix = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    per_bucket = bucketed.groupBy("__bucket").agg(
        *[F.sum(c).alias(f"__b_{c}") for c in sum_cols]
    )
    offsets = per_bucket.select(
        "__bucket",
        *[
            F.coalesce(F.sum(f"__b_{c}").over(w_prefix), F.lit(0)).alias(
                f"__off_{c}"
            )
            for c in sum_cols
        ],
        *[F.sum(f"__b_{c}").over(w_all).alias(f"{c}_tot") for c in sum_cols],
    )
    w_in = Window.partitionBy("__bucket").orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    joined = bucketed.join(F.broadcast(offsets), "__bucket")
    out = joined.select(
        *df.columns,
        *[
            (
                F.col(f"__off_{c}")
                + F.coalesce(F.sum(c).over(w_in), F.lit(0))
            ).alias(f"{c}_prefix")
            for c in sum_cols
        ],
        *[F.col(f"{c}_tot") for c in sum_cols],
    )
    return out


def bucketed_global_rank(
    df: DataFrame,
    bucket_key: Column,
    order_cols: list[Column],
    rank_name: str,
    total_name: str,
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Exact global ``row_number()`` over ``order_cols`` (plus the
    total row count) without a single-task global sort.

    ``bucket_key`` must be a numeric Column MONOTONE NON-DECREASING in
    the total order ``order_cols`` defines (for a descending key pass
    its negation); ties across the bucket boundary are safe because
    equal keys land in the same bucket and the in-bucket sort breaks
    them. Adds ``rank_name`` (1-based global rank) and ``total_name``.
    """
    tagged = df.withColumn("__key", bucket_key.cast("double"))
    mm = tagged.agg(
        F.min("__key").alias("__lo"),
        (F.max("__key") + F.lit(1.0)).alias("__hi"),
    )
    bucketed = tagged.crossJoin(F.broadcast(mm)).withColumn(
        "__bucket",
        F.width_bucket(
            F.col("__key"), F.col("__lo"), F.col("__hi"), F.lit(n_buckets)
        ),
    )
    w_prefix = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = (
        bucketed.groupBy("__bucket")
        .agg(F.count("*").alias("__n"))
        .select(
            "__bucket",
            F.coalesce(F.sum("__n").over(w_prefix), F.lit(0)).alias("__off"),
            F.sum("__n").over(w_all).alias(total_name),
        )
    )
    w_in = Window.partitionBy("__bucket").orderBy(*order_cols)
    return (
        bucketed.join(F.broadcast(offsets), "__bucket")
        .withColumn(rank_name, F.row_number().over(w_in) + F.col("__off"))
        .drop("__bucket", "__key", "__lo", "__hi", "__off")
    )


def ntile_from_rank(rank: Column, total: Column, n: int) -> Column:
    """Closed-form NTILE(n) from an exact 1-based global rank: the
    first ``total mod n`` tiles get ``total div n + 1`` rows (SQL
    NTILE semantics — window_ntile_scalable's tile algebra, factored
    out). Integer-only on non-negative operands; divisions run in
    DECIMAL(38,0) then floor — exact for any int64 (a double `/`
    loses integers past 2^53) — so floor == trunc and both engines
    agree bit-for-bit."""

    def _idiv(a: Column, b: Column) -> Column:
        return F.floor(a.cast("decimal(38,0)") / b).cast("bigint")

    base = _idiv(total, F.lit(n))
    rem = (total % n).cast("bigint")
    cut = rem * (base + 1)
    return (
        F.when(rank <= cut, _idiv(rank - 1, base + 1) + 1)
        .otherwise(
            # base == 0 only when total < n, where rank <= cut always
            # takes the first branch; greatest() keeps the dead branch
            # from evaluating 1/0.
            rem + _idiv(rank - cut - 1, F.greatest(base, F.lit(1))) + 1
        )
        .cast("int")
    )
