"""Aggregation operators.

Reference parity: A8 max() (main.go:194-200 — a manual scan loop) and
A16 counting (main.go:139). Everything else is the north-star analytic
surface. All aggregations here are hash aggregations with map-side
partials (Spark plans partial_X → shuffle-by-key → final_X), so the
shuffle carries one row per (partition × group), not per input row —
the property that makes them survive 100 TB.

Money math follows SURVEY.md §8 G2: cast to DECIMAL(18,2) before SUM in
both engines — exact, order-independent, hash-stable. Averages are
normalized ROUND(CAST(… AS DOUBLE), k) (G3).

G13 (round-2): final output schemas are pandas-stable — BIGINT, DOUBLE,
or VARCHAR only. The driver fetches the DuckDB oracle via ``.df()``,
which coerces DECIMAL and HUGEINT to float64; a Decimal('147.30') then
string-compares unequal to 147.3. So every decimal aggregate keeps its
exact decimal arithmetic internally (order-independent) and takes ONE
final CAST(... AS DOUBLE) in both engines; integer aggregates that
DuckDB would promote to HUGEINT (SUM of ints, ``//``) get a final
CAST(... AS BIGINT) in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pg_archiver_spark.catalog import load
from pg_archiver_spark.registry import register

_DEC = "decimal(18,2)"


@register(
    "agg_global_stats",
    oracle="""
    SELECT COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           MIN(value) AS min_value,
           MAX(value) AS max_value,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    """,
)
def agg_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global stats (reference A8/A16 generalized). min/max of doubles
    select existing values — exact in both engines; the sum is decimal."""
    return load(spark, sf_dir, "events").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.sum(F.col("value").cast(_DEC)).cast("double").alias("sum_value"),
    )


@register(
    "agg_group_pricing",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
           ROUND(CAST(AVG(l_quantity) AS DOUBLE), 2) AS avg_qty,
           ROUND(CAST(AVG(l_extendedprice) AS DOUBLE), 2) AS avg_price,
           ROUND(CAST(AVG(l_discount) AS DOUBLE), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_group_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the canonical scan-heavy grouped aggregation.
    6M rows/SF collapse to 6 groups — the shuffle is 6 rows per map
    task, i.e. the plan is scan-bound, exactly what you want at 100 TB.
    """
    li = load(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast(_DEC)
    disc = F.col("l_discount").cast(_DEC)
    tax = F.col("l_tax").cast(_DEC)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            # Exact decimal sums at the natural product scales, then one
            # final lossy-but-deterministic cast to double (G2 + G13).
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax))
            .cast("double")
            .alias("sum_charge"),
            F.round(F.avg("l_quantity").cast("double"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice").cast("double"), 2).alias("avg_price"),
            F.round(F.avg("l_discount").cast("double"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "sql_pipe_syntax",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS sum_disc_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (`|>`, Spark 4.0 / ZetaSQL-style) — the linear
    query form the reference's users get for free when they switch:
    each stage reads top-to-bottom (FROM → WHERE → AGGREGATE → SELECT
    → ORDER BY) instead of inside-out. The pipe form is pure SYNTAX:
    Catalyst compiles it to exactly the plan of the equivalent nested
    SQL (same scan-bound Q1 aggregate as `agg_group_pricing` — 6
    groups, partial agg map-side, pushdown intact), which the oracle
    verifies by recomputing with classic SQL in DuckDB."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("pipe_lineitem")
    return spark.sql(
        """
        FROM pipe_lineitem
        |> WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |> AGGREGATE
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                   AS sum_disc_price,
               COUNT(*) AS count_order
           GROUP BY l_returnflag, l_linestatus
        |> SELECT l_returnflag, l_linestatus, sum_qty, sum_disc_price,
                  count_order
        |> ORDER BY l_returnflag, l_linestatus
        """
    )


@register(
    "agg_having",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events
    FROM events
    GROUP BY user_id
    HAVING COUNT(*) >= 67
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group + HAVING. 67 ≈ the mean events-per-user at every scale
    factor (events and users scale together), so the predicate stays
    selective-but-nonempty at all sfs."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
        .filter(F.col("n_events") >= 67)
    )


@register(
    "agg_distinct_per_group",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def agg_distinct_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct per group: Spark plans the 2-phase expand+agg;
    partial dedup happens map-side before the shuffle."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@register(
    "agg_approx_distinct",
    # Round-8 conversion (rows-only → sql-checked): the HLL++ estimate
    # itself is engine-specific, but it IS deterministic — registers
    # are a max-merge, insensitive to partitioning and order — so the
    # "within 3·rsd of exact" flag is a fixed fact of the fixture, and
    # the exact per-group distinct is plain SQL. A sketch regression
    # (or a broken merge) now hash-fails instead of passing rows-only.
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS approx_within_rsd
    FROM events
    GROUP BY event_type
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct — the 100 TB substitute for exact distinct:
    fixed-size sketch per group, mergeable, no expand shuffle. The exact
    count rides along only to make the error contract checkable; at
    scale you'd ship the approx column alone."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= F.lit(0.06) * F.col("exact_users")
            ).alias("approx_within_rsd"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT COALESCE(r_name, 'ALL') AS region_name,
           COALESCE(n_name, 'ALL') AS nation_name,
           COUNT(*) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals; grouping nulls coalesced to 'ALL' in both
    engines (SURVEY.md §8 G6 — grouping_id numbering is engine-specific).
    """
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    joined = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.count("*").alias("n_customers"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "n_customers",
        )
    )


@register(
    "agg_cube",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 2² grouping combinations in one
    pass — Spark plans a single Expand (4× row multiplier BEFORE the
    shuffle, partial-agg combined map-side), not four scans; NULL
    grouping markers coalesced to 'ALL' for a NULL-free output (G13c)."""
    return (
        load(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
        )
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS flag,
           COALESCE(l_linestatus, 'ALL') AS status,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((flag), (status), ()) via the SQL surface:
    three independent rollup levels from ONE lineitem scan (Expand 3×,
    map-side partial agg) — the hand-picked-subsets sibling of
    rollup/cube, exact decimal sums with one final DOUBLE cast."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("li_gs")
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, 'ALL') AS flag,
               COALESCE(l_linestatus, 'ALL') AS status,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "agg_max_timestamp",
    oracle="SELECT MAX(epoch_ms(ts)) AS max_epoch_ms FROM events",
)
def agg_max_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's 'latest timestamp' scan (main.go:194-200), as a
    one-expression aggregate over epoch-ms."""
    return load(spark, sf_dir, "events").agg(
        F.max(F.expr("ts_ns DIV 1000000")).alias("max_epoch_ms")
    )


@register(
    "agg_percentile",
    oracle="""
    SELECT l_returnflag,
           ROUND(CAST(median(l_quantity) AS DOUBLE), 4) AS med_qty,
           ROUND(CAST(quantile_cont(l_quantity, 0.9) AS DOUBLE), 4) AS p90_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles per group (Spark `percentile` ==
    DuckDB `quantile_cont`, verified on linear-interpolated values). The
    exact form needs a per-group sort; the 100 TB variant is
    approx_percentile (t-digest sketch, mergeable, no sort)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)").cast("double"), 4).alias(
            "med_qty"
        ),
        F.round(F.expr("percentile(l_quantity, 0.9)").cast("double"), 4).alias(
            "p90_qty"
        ),
        F.count("*").alias("n_rows"),
    )


@register(
    "agg_stats_moments",
    oracle="""
    SELECT l_returnflag,
           ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
           ROUND(var_samp(l_quantity), 4) AS var_qty,
           ROUND(corr(l_quantity, l_extendedprice), 6) + 0.0 AS corr_qty_price,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistics per group: sample stddev/variance and
    Pearson correlation. Spark's single-pass co-moment accumulation
    (Welford-style, mergeable across partitions) matches DuckDB to well
    past 4-6 decimals on this data — verified at all three SFs."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        # + 0.0 normalizes a potential -0.0 round (engines disagree; G13).
        (F.round(F.corr("l_quantity", "l_extendedprice"), 6) + F.lit(0.0)).alias(
            "corr_qty_price"
        ),
        F.count("*").alias("n_rows"),
    )


@register(
    "agg_approx_percentile",
    # Round-8 conversion (rows-only → sql-checked): the sketch VALUES
    # are engine-specific, but the GK contract — the returned element's
    # rank is within n/accuracy of the target rank — is guaranteed
    # regardless of merge order, so the per-quantile rank-bound flags
    # are pinned TRUE and the group sizes are plain SQL. A sketch whose
    # rank error exceeded its advertised bound now hash-fails.
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           TRUE AS p50_rank_ok,
           TRUE AS p90_rank_ok,
           TRUE AS p99_rank_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles per group — the 100 TB substitute for
    agg_percentile's exact per-group sort: a fixed-size mergeable
    sketch, one pass, no sort. The op then VERIFIES the sketch's rank
    contract: each returned value occupies ranks (lt, le] in its group,
    and that interval must come within n/accuracy (+1 slack) of the
    target rank q·n. The probe frame is 3 groups × 3 quantiles = 9
    rows, broadcast back onto the fact table — the check pass is one
    extra scan; at scale you'd ship the sketch pass alone."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    approx = li.groupBy("l_returnflag").agg(
        F.expr(
            "approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), 10000)"
        ).alias("pvs"),
        F.count("*").alias("n_rows"),
    )
    probes = approx.select(
        "l_returnflag",
        "n_rows",
        F.explode(
            F.arrays_zip(
                F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)).alias("q"),
                F.col("pvs").alias("pv"),
            )
        ).alias("z"),
    ).select(
        "l_returnflag",
        "n_rows",
        F.col("z.q").alias("q"),
        F.col("z.pv").alias("pv"),
    )
    ranks = (
        li.join(F.broadcast(probes), "l_returnflag")
        .groupBy("l_returnflag", "q", "n_rows")
        .agg(
            F.sum(
                F.when(F.col("l_extendedprice") < F.col("pv"), 1).otherwise(0)
            ).alias("lt"),
            F.sum(
                F.when(F.col("l_extendedprice") <= F.col("pv"), 1).otherwise(0)
            ).alias("le"),
        )
    )
    slack = F.col("n_rows") / 10000.0 + 1.0
    ok = (F.col("lt") <= F.col("q") * F.col("n_rows") + slack) & (
        F.col("le") >= F.col("q") * F.col("n_rows") - slack
    )
    return (
        ranks.withColumn("ok", ok)
        .groupBy("l_returnflag", "n_rows")
        .agg(
            F.min(F.when(F.col("q") == 0.5, F.col("ok"))).alias("p50_rank_ok"),
            F.min(F.when(F.col("q") == 0.9, F.col("ok"))).alias("p90_rank_ok"),
            F.min(F.when(F.col("q") == 0.99, F.col("ok"))).alias("p99_rank_ok"),
        )
        .select(
            "l_returnflag",
            "n_rows",
            "p50_rank_ok",
            "p90_rank_ok",
            "p99_rank_ok",
        )
        .orderBy("l_returnflag")
    )


_PIVOT_PRIORITIES = {
    "1-URGENT": "urgent",
    "2-HIGH": "high",
    "3-MEDIUM": "medium",
    "4-NOT SPECIFIED": "notspec",
    "5-LOW": "low",
}


@register(
    "agg_pivot",
    oracle="""
    SELECT o_orderstatus,
           COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS urgent,
           COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS high,
           COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS medium,
           COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS notspec,
           COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS low,
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): priority counts per status. The explicit value
    list keeps it a single-pass agg (without it Spark needs an extra job
    to discover the pivot values)."""
    orders = load(spark, sf_dir, "orders")
    wide = (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", list(_PIVOT_PRIORITIES))
        .count()
        .na.fill(0)
    )
    renamed = wide
    for raw, clean in _PIVOT_PRIORITIES.items():
        renamed = renamed.withColumnRenamed(raw, clean)
    return renamed


@register(
    "agg_time_bucket_rollup",
    oracle="""
    SELECT epoch_ms(ts) // 21600000 AS bucket_id,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY bucket_id, event_type
    """,
)
def agg_time_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: fixed 6-hour
    buckets (epoch-ms integer division) per event type. The bucket id is
    a pure function of the row, so the rollup is an ordinary map-side-
    combinable agg — and at rest the bucket id doubles as a partition
    key for pruned reads of the materialized rollup."""
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.expr("ts_ns DIV 1000000 DIV 21600000").alias("bucket_id"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


@register(
    "agg_mode_stats",
    oracle="""
    SELECT event_type, user_id AS mode_user_id, n AS n_occurrences
    FROM (
        SELECT event_type, user_id, COUNT(*) AS n,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type
                   ORDER BY COUNT(*) DESC, user_id
               ) AS rn
        FROM events
        GROUP BY event_type, user_id
    )
    WHERE rn = 1
    """,
)
def agg_mode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group mode (most frequent user per event type,
    smallest id on ties — G5 determinism). Two-level shape: the
    (type, user) count is map-side combinable and reduces the frame to
    group-cardinality before the top-1 window, so the window's input is
    tiny no matter how large events is — mode at 100 TB without
    mode()'s single-reducer trap."""
    events = load(spark, sf_dir, "events")
    counts = events.groupBy("event_type", "user_id").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("n").desc(), F.col("user_id")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("user_id").alias("mode_user_id"),
            F.col("n").alias("n_occurrences"),
        )
    )

@register(
    "agg_unpivot",
    oracle="""
    WITH w AS (
        SELECT l_returnflag,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_price,
               CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_disc
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM w
    UNION ALL
    SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM w
    UNION ALL
    SELECT l_returnflag, 'sum_disc' AS metric, sum_disc AS value FROM w
    """,
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long melt), the inverse of agg_pivot: one metrics
    row per group becomes one row per (group, metric) — the shape
    metric stores and plotting layers want. Spark's native `unpivot`
    is a zero-shuffle expression over the already-aggregated frame, so
    the whole plan costs exactly the one agg shuffle; the oracle's
    UNION ALL re-scan spelling is the same contract."""
    li = load(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
        F.sum(F.col("l_discount").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_disc"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "sum_disc"],
        variableColumnName="metric",
        valueColumnName="value",
    )

@register(
    "agg_hll_partial_merge",
    # Round-8 conversion (rows-only → sql-checked): the DataSketches
    # HLL estimate is implementation-specific but DETERMINISTIC (the
    # union is a register-wise max, insensitive to partitioning), so
    # "merged estimate within 5% of exact" is a fixed fact of the
    # fixture; day count, exact total, and the sum of per-day exacts
    # are plain SQL. A broken sketch merge now hash-fails.
    oracle="""
    WITH d AS (
        SELECT date_trunc('day', ts) AS day,
               COUNT(DISTINCT user_id) AS exact_day
        FROM events
        GROUP BY day
    )
    SELECT COUNT(*) AS n_days,
           (SELECT COUNT(DISTINCT user_id) FROM events) AS exact_total,
           CAST(SUM(exact_day) AS BIGINT) AS sum_daily_exact,
           TRUE AS merge_within_bound
    FROM d
    """,
)
def agg_hll_partial_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeable-sketch distinct story for 100 TB: per-day HLL
    sketches of user_id built in ONE map-side-combinable agg, then
    merged with hll_union_agg — the two-level shape that lets a
    materialized per-partition rollup answer any-range COUNT DISTINCT
    later WITHOUT re-touching raw data (exact distinct cannot merge;
    sketches can). Output compares the merged estimate to the exact
    count so the error contract is visible in the result itself."""
    events = load(spark, sf_dir, "events")
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sketch"),
        F.countDistinct("user_id").alias("exact_day"),
    )
    merged = daily.agg(
        F.count("*").alias("n_days"),
        F.hll_sketch_estimate(
            F.hll_union_agg("sketch")
        ).alias("merged_estimate"),
        F.sum("exact_day").alias("sum_daily_exact"),
    )
    exact_total = events.agg(
        F.countDistinct("user_id").alias("exact_total")
    )
    return merged.crossJoin(exact_total).select(
        "n_days",
        "exact_total",
        "sum_daily_exact",
        (
            F.abs(F.col("merged_estimate") - F.col("exact_total"))
            <= F.lit(0.05) * F.col("exact_total")
        ).alias("merge_within_bound"),
    )


HIST_BUCKETS = 20
HIST_WIDTH = 30_000.0  # o_totalprice ∈ [~850, ~560k] at every SF


@register(
    "analytics_histogram",
    oracle="""
    SELECT LEAST(19, CAST(FLOOR(o_totalprice / 30000.0) AS BIGINT))
               AS bucket,
           LEAST(19, CAST(FLOOR(o_totalprice / 30000.0) AS BIGINT))
               * 30000.0 AS bucket_lo,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price
    FROM orders
    GROUP BY bucket
    """,
)
def analytics_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order value — the distribution profile
    behind every dashboard and data-quality monitor. Bucketing is a
    pure per-row expression (floor-divide, clamp to the top bucket), so
    the whole plan is one partial+final hash agg over at most 20 keys:
    the map-side combine collapses each partition to ≤20 rows and the
    shuffle is bytes, not data — the same plan at 100 TB. Fixed edges
    (not data-dependent quantiles) keep the op a single pass;
    `agg_percentile`/`agg_approx_percentile` are the data-dependent
    twins. Empty buckets are absent rather than zero-filled in both
    engines."""
    orders = load(spark, sf_dir, "orders")
    bucket = F.least(
        F.lit(HIST_BUCKETS - 1),
        F.floor(F.col("o_totalprice") / HIST_WIDTH),
    ).cast("bigint")
    return (
        orders.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .select(
            "bucket",
            (F.col("bucket") * HIST_WIDTH).alias("bucket_lo"),
            "n_orders",
            "sum_price",
        )
    )


@register(
    "agg_bitmap_distinct",
    oracle="""
    WITH per_day AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               COUNT(DISTINCT user_id) AS n_users
        FROM events GROUP BY day
    )
    SELECT day, n_users FROM per_day
    UNION ALL
    SELECT 'ALL' AS day, COUNT(DISTINCT user_id) AS n_users FROM events
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting from mergeable bitmap partials
    (`bitmap_bit_position` / `bitmap_construct_agg` / `bitmap_or_agg`):
    per (day, bucket) each task builds a 32k-bit bitmap of the user ids
    it saw — a fixed-size monoid, so per-day counts AND the global
    count both come from OR-merging the SAME partials, never rescanning
    the fact. This is the exact-arithmetic sibling of the HLL sketch op
    (`agg_hll_partial_merge`): linear memory in the key universe
    instead of the sketch's fixed error, the right trade when the id
    domain is dense and bounded (user ids, item ids). The 'ALL' row is
    computed from the day-level bitmaps — the re-aggregation a
    COUNT(DISTINCT) could never do without a second pass."""
    events = load(spark, sf_dir, "events")
    partials = (
        events.select(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            "user_id",
        )
        .groupBy("day", F.expr("bitmap_bucket_number(user_id)").alias("bucket"))
        .agg(
            F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias(
                "bm"
            )
        )
    )
    per_day = partials.groupBy("day").agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("n_users")
    )
    global_row = (
        partials.groupBy("bucket")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
        .agg(F.sum(F.expr("bitmap_count(bm)")).alias("n_users"))
        .select(F.lit("ALL").alias("day"), "n_users")
    )
    return per_day.unionByName(global_row)


@register(
    "agg_string_concat_groups",
    oracle="""
    SELECT r_name,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           COUNT(*) AS n_nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    ORDER BY r_name
    """,
)
def agg_string_concat_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG / string_agg): the denormal-
    ized "members as one delimited string" report shape. Determinism is
    the whole game for this operator — an unordered collect_list varies
    with partitioning and task order, so the member list is sorted
    INSIDE the aggregate (`array_sort(collect_list(...))`) before
    joining (G5: every nondeterministic-order surface gets an explicit
    total order). Broadcast dim join + 5-group agg; the member arrays
    are group-bounded, never corpus-bounded."""
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "nations"
            ),
            F.count("*").alias("n_nations"),
        )
        .orderBy("r_name")
    )


@register(
    "agg_count_min_sketch",
    # Round-8 conversion (rows-only → sql-checked): CMS cells are
    # integer sums under a fixed seed — commutative, partition- and
    # order-insensitive — so every flag below is a deterministic fact
    # of the fixture: no_undercount is the CMS one-sided guarantee
    # (also raise-guarded), exact_match holds because 5 keys in a
    # ~2000-cell row cannot collide on all depths here, and bound_ok
    # is the ε·N bound. The exact counts are plain SQL.
    oracle="""
    SELECT event_type,
           COUNT(*) AS exact_count,
           TRUE AS no_undercount,
           TRUE AS exact_match,
           TRUE AS bound_ok
    FROM events
    GROUP BY event_type
    """,
)
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation — the third member of the
    mergeable-sketch family (HLL cardinality `agg_hll_partial_merge`,
    exact bitmap `agg_bitmap_distinct`, CMS frequency here): a fixed
    0.1%-error frequency table built in ONE pass with
    `F.count_min_sketch` (JVM-side, mergeable partials — the structure
    a 100 TB heavy-hitters pass keeps per partition and ORs together).

    The CMS guarantee is one-sided — estimate ≥ true count, and
    ≤ true + ε·N with confidence 1−δ — so the op VERIFIES it instead
    of trusting it: the sketch binary is deserialized through Spark's
    own `org.apache.spark.util.sketch.CountMinSketch` reader
    (driver-side, one bounded object) and every event type's estimate
    is checked against the exact per-type counts from a second
    aggregation. An estimate below truth breaks the DETERMINISTIC
    one-sided guarantee and raises; the upper ε·N bound only holds
    with confidence 1−δ=0.99, so it is REPORTED as a `bound_ok`
    column rather than asserted (a spurious tail event on other
    data/seeds must not crash the pipeline). Output: per-type exact
    vs estimated counts + the bound flags."""
    events = load(spark, sf_dir, "events")
    row = events.agg(
        F.count_min_sketch(
            "event_type", F.lit(0.001), F.lit(0.99), F.lit(42)
        ).alias("cms")
    ).first()
    raw = bytes(row["cms"])
    n_total = events.count()
    jvm = spark._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(raw)

    exact = {
        r["event_type"]: r["cnt"]
        for r in events.groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
        .collect()  # bounded: one row per event type (5)
    }
    out = []
    for etype in sorted(exact):
        est = int(cms.estimateCount(etype))
        true = int(exact[etype])
        if est < true:
            # One-sided guarantee is deterministic — never under-count.
            raise RuntimeError(
                f"CMS undercount for {etype}: est={est} true={true}"
            )
        bound_ok = est <= true + int(0.001 * n_total) + 1
        out.append((etype, true, est >= true, est == true, bound_ok))
    return spark.createDataFrame(
        out,
        "event_type string, exact_count long, no_undercount boolean, "
        "exact_match boolean, bound_ok boolean",
    )


@register(
    "agg_corr_matrix",
    oracle="""
    WITH c AS (
        SELECT ROUND(corr(l_quantity, l_extendedprice), 6) + 0.0 AS qp,
               ROUND(corr(l_quantity, l_discount), 6) + 0.0 AS qd,
               ROUND(corr(l_quantity, l_tax), 6) + 0.0 AS qt,
               ROUND(corr(l_extendedprice, l_discount), 6) + 0.0 AS pd,
               ROUND(corr(l_extendedprice, l_tax), 6) + 0.0 AS pt,
               ROUND(corr(l_discount, l_tax), 6) + 0.0 AS dt
        FROM lineitem
    )
    SELECT 'l_quantity' AS x_col, 'l_extendedprice' AS y_col, qp AS corr FROM c
    UNION ALL SELECT 'l_quantity', 'l_discount', qd FROM c
    UNION ALL SELECT 'l_quantity', 'l_tax', qt FROM c
    UNION ALL SELECT 'l_extendedprice', 'l_discount', pd FROM c
    UNION ALL SELECT 'l_extendedprice', 'l_tax', pt FROM c
    UNION ALL SELECT 'l_discount', 'l_tax', dt FROM c
    """,
)
def agg_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix (upper triangle) over the
    lineitem measures — the feature-screening pass a training pipeline
    runs before model fitting.

    All six co-moment accumulators run in ONE partial-aggregate pass
    over the table (mergeable Welford-style state, map-side combined to
    a single row), then the 1-row frame is unpivoted with ``stack`` —
    no second scan, no shuffle beyond the 1-row final merge. At 100 TB
    this is a single map-reduce over the fact table with O(1) state.
    Rounded to 6 (the co-moment merge order differs between engines
    past ~1e-10 relative; G11) and -0.0-normalized (G13).
    """
    li = load(spark, sf_dir, "lineitem")

    def c(a: str, b: str):
        return (F.round(F.corr(a, b), 6) + F.lit(0.0)).alias(
            f"c_{a[2:4]}_{b[2:4]}"
        )

    one = li.agg(
        c("l_quantity", "l_extendedprice"),
        c("l_quantity", "l_discount"),
        c("l_quantity", "l_tax"),
        c("l_extendedprice", "l_discount"),
        c("l_extendedprice", "l_tax"),
        c("l_discount", "l_tax"),
    )
    return one.select(
        F.expr(
            "stack(6, "
            "'l_quantity', 'l_extendedprice', c_qu_ex, "
            "'l_quantity', 'l_discount', c_qu_di, "
            "'l_quantity', 'l_tax', c_qu_ta, "
            "'l_extendedprice', 'l_discount', c_ex_di, "
            "'l_extendedprice', 'l_tax', c_ex_ta, "
            "'l_discount', 'l_tax', c_di_ta) AS (x_col, y_col, corr)"
        )
    )


@register(
    "agg_weighted_median",
    oracle="""
    WITH w AS (
        SELECT l_returnflag,
               CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
               CAST(l_quantity AS DECIMAL(18,2)) AS wt
        FROM lineitem
    ),
    cum AS (
        SELECT l_returnflag, price,
               SUM(wt) OVER (PARTITION BY l_returnflag
                             ORDER BY price
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS cumw,
               SUM(wt) OVER (PARTITION BY l_returnflag) AS totw
        FROM w
    )
    SELECT l_returnflag,
           CAST(MIN(price) AS DOUBLE) AS weighted_median_price,
           CAST(MAX(totw) AS DOUBLE) AS total_weight
    FROM cum
    WHERE cumw * 2 >= totw
    GROUP BY l_returnflag
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted (lower) median: the price at which half the QUANTITY
    mass sits below — the inventory-weighted price statistic a plain
    median (each row weight 1) misstates. Lower-median semantics (the
    first value whose cumulative weight crosses half) keep the whole
    computation in EXACT decimal arithmetic — no interpolation, no
    float reduction, so the oracle compare is bit-exact.

    Plan: one shuffle on the group key; the in-partition sort feeds
    both window sums (cumulative + total share one exchange/sort), and
    the crossing-point pick is an ordinary aggregate. Ties on price are
    harmless: every row that crosses at the same price reports that
    price. At 100 TB this is the same envelope as any per-group window
    — and the documented approx substitute for heavy groups is
    approx_percentile over a weight-expanded stream (agg_approx_
    percentile), the standard trade.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").cast("decimal(18,2)").alias("price"),
        F.col("l_quantity").cast("decimal(18,2)").alias("wt"),
    )
    wp = Window.partitionBy("l_returnflag")
    cum = li.select(
        "l_returnflag",
        "price",
        F.sum("wt")
        .over(
            wp.orderBy("price").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("cumw"),
        F.sum("wt").over(wp).alias("totw"),
    )
    return (
        cum.filter(F.col("cumw") * 2 >= F.col("totw"))
        .groupBy("l_returnflag")
        .agg(
            F.min("price").cast("double").alias("weighted_median_price"),
            F.max("totw").cast("double").alias("total_weight"),
        )
    )


@register(
    "agg_observe_metrics",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
           CAST((COUNT(*) * 1000)
                // CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS BIGINT)
               AS share_pm
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline health metrics piggybacked on a production aggregate
    via the Observation API (``df.observe``): the per-returnflag report
    AND the global row count come out of the SAME single pass — the
    observation's metrics accumulate on the executors alongside the
    grouped aggregate, so the denominator for the share column costs
    zero extra scans, shuffles, or plan nodes (reference README.md:127
    monitoring rollups: every archival query should emit its own volume
    metrics for free).

    This is the Spark-native alternative to the house 1-row-broadcast
    pattern when the total is needed DRIVER-side anyway (alerting,
    logging): observe() attaches an AccumulatorV2-backed listener to an
    existing action instead of adding a second aggregate subtree. The
    collect here is the |returnflag|=3-row report plus one metrics row
    — bounded by the group-key cardinality, documented per the
    bounded-driver contract (same envelope as the k-means codebooks).
    At 100 TB the plan is Q1's: map-side partial agg to 3 rows.
    """
    from pyspark.sql import Observation

    li = load(spark, sf_dir, "lineitem")
    obs = Observation("archive_metrics")
    observed = li.observe(obs, F.count(F.lit(1)).alias("n_rows"))
    flags = observed.groupBy("l_returnflag").agg(
        F.count("*").alias("n_lines"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("qty"),
    )
    rows = flags.collect()  # bounded: |l_returnflag| = 3 groups
    total = obs.get["n_rows"]  # filled by the action above, same pass
    out = [
        (r.l_returnflag, r.n_lines, r.qty, (r.n_lines * 1000) // total)
        for r in sorted(rows, key=lambda r: r.l_returnflag)
    ]
    return spark.createDataFrame(
        out, "l_returnflag string, n_lines long, qty double, share_pm long"
    )


@register(
    "agg_approx_top_k",
    oracle="""
    WITH counts AS (
        SELECT p.p_brand AS item, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand
    )
    SELECT item, cnt FROM counts
    ORDER BY cnt DESC, item
    LIMIT 10
    """,
)
def agg_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``approx_top_k`` — Spark 4.1's built-in space-saving / heavy-
    hitter SKETCH as a single aggregate function: fixed memory
    (maxItemsTracked slots) regardless of key cardinality, mergeable
    across partitions, one pass — the engine-native replacement for
    analytics_heavy_hitters_twopass when an ε-approximate answer is
    acceptable. At fixture cardinality (|brands| = 25 « the 100-slot
    budget given here) the sketch is provably EXACT, which is what
    makes this hash-checkable against the DuckDB exact top-k; the
    docstring contract at 100 TB is the usual space-saving guarantee
    (count overestimate ≤ ε·N, true heavy hitters never evicted).
    Output is re-sorted (count DESC, item) because the sketch's own
    tie order is unspecified."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    brands = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    sk = brands.agg(
        F.expr("approx_top_k(p_brand, 25, 100)").alias("top")
    )
    return (
        sk.select(F.explode("top").alias("e"))
        .select(
            F.col("e.item").alias("item"),
            F.col("e.count").cast("long").alias("cnt"),
        )
        .orderBy(F.desc("cnt"), "item")
        .limit(10)
    )


@register(
    "agg_trimmed_mean",
    oracle="""
    WITH ranked AS (
        SELECT event_type,
               CAST(value AS DECIMAL(18,2)) AS v,
               PERCENT_RANK() OVER (
                   PARTITION BY event_type ORDER BY value, event_id
               ) AS pr
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           ROUND(CAST(SUM(v) AS DOUBLE) / COUNT(*), 4) AS trimmed_mean
    FROM ranked
    WHERE pr >= 0.1 AND pr <= 0.9
    GROUP BY event_type
    """,
)
def agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRIMMED MEAN (10% each tail) per event type — the robust
    central-tendency metric monitoring systems prefer over the plain
    mean (one whale order shifts AVG; it can't shift the 10%-trimmed
    mean) and over the median (which discards all magnitude
    information inside the kept band). The trim boundary is
    PERCENT_RANK over a tie-broken total order (value, event_id —
    G5), so both engines keep exactly the same rows; the kept values
    accumulate as exact decimals and only the final mean division is
    float (rounded 4dp).

    Plan: one shuffle on event_type, in-partition sort for the rank,
    then a map-side-combinable aggregate — the same envelope as any
    per-group window. Per-group sort is partition-bounded: with
    |types| groups of corpus/|types| rows this is the standard window
    cost; for a SINGLE giant group the substitute is
    agg_approx_percentile's sketch bounds (trim at approximate
    quantiles, one pass, no sort)."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.col("value").cast("decimal(18,2)").alias("v"),
        "value",
        "event_id",
    )
    pr = F.percent_rank().over(
        Window.partitionBy("event_type").orderBy("value", "event_id")
    )
    kept = ev.withColumn("pr", pr).filter(
        (F.col("pr") >= 0.1) & (F.col("pr") <= 0.9)
    )
    return kept.groupBy("event_type").agg(
        F.count("*").alias("n_kept"),
        F.round(
            F.sum("v").cast("double") / F.count("*"), 4
        ).alias("trimmed_mean"),
    )


@register(
    "agg_boolean_every_any",
    oracle="""
    SELECT event_type,
           bool_and(value >= 0) AS all_nonneg,
           bool_or(value > 190) AS any_large,
           CAST(COUNT(*) FILTER (WHERE value > 100) AS BIGINT)
               AS n_over_100
    FROM events
    GROUP BY event_type
    """,
)
def agg_boolean_every_any(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate family (``every`` / ``any`` / ``count_if``) —
    the data-quality assertion surface expressed as aggregates: "are
    ALL values non-negative", "did ANY exceed the alert threshold",
    "how many crossed the soft limit" per group, each a one-pass
    map-side-combinable reduction (booleans form trivial monoids —
    AND/OR partials merge losslessly). This is the per-group form of
    maintenance_constraint_audit's table-level checks, and the
    cheapest possible screen at 100 TB: no sort, no distinct, the
    shuffle payload is three booleans and a count per group."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.every(F.col("value") >= 0).alias("all_nonneg"),
        F.some(F.col("value") > 190).alias("any_large"),
        F.count_if(F.col("value") > 100).alias("n_over_100"),
    )


@register(
    "agg_ohlc_candles",
    oracle="""
    SELECT event_type,
           CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day_id,
           arg_min(value, printf('%020d-%020d', epoch_ms(ts), event_id))
               AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           arg_max(value, printf('%020d-%020d', epoch_ms(ts), event_id))
               AS close,
           CAST(COUNT(*) AS BIGINT) AS volume
    FROM events
    GROUP BY event_type, day_id
    ORDER BY event_type, day_id
    """,
)
def agg_ohlc_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candle downsampling — the canonical time-series resample
    (open/high/low/close/volume per instrument per day) every market /
    metrics store serves. High/low/volume are ordinary min/max/count;
    open and close are FIRST/LAST-BY-TIME, expressed as min_by/max_by
    over a zero-padded (epoch_ms, event_id) string key — a total order
    both engines compare identically (event_id breaks timestamp ties),
    which turns 'first per group' into a plain associative aggregate:
    no window, no sort, map-side combinable.

    That is the 100 TB point: the window formulation (row_number = 1
    per group) shuffles every row then sorts each group; min_by folds
    to one candidate per (group × task) before the exchange — the
    shuffle carries |groups|·|tasks| rows, not the data.

    Plan: one scan → single partial+final agg keyed on
    (event_type, day)."""
    events = load(spark, sf_dir, "events")
    key = F.format_string(
        "%020d-%020d", F.expr("ts_ns DIV 1000000"), F.col("event_id")
    )
    return (
        events.groupBy(
            "event_type",
            F.expr("ts_ns DIV 1000000 DIV 86400000").alias("day_id"),
        )
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count("*").cast("bigint").alias("volume"),
        )
        .orderBy("event_type", "day_id")
    )


WINSOR_LO = 0.05
WINSOR_HI = 0.95


@register(
    "agg_winsorized_mean",
    oracle=f"""
    WITH cents AS (
        SELECT o_orderpriority AS priority,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS c
        FROM orders
    ),
    bounds AS (
        SELECT priority,
               CAST(FLOOR(quantile_cont(c, {WINSOR_LO})) AS BIGINT) AS lo,
               CAST(FLOOR(quantile_cont(c, {WINSOR_HI})) AS BIGINT) AS hi
        FROM cents GROUP BY priority
    )
    SELECT c.priority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN c.c < b.lo THEN 1
                         WHEN c.c > b.hi THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clamped,
           CAST(SUM(LEAST(GREATEST(c.c, b.lo), b.hi)) AS BIGINT)
               AS winsor_sum_cents,
           CAST(SUM(LEAST(GREATEST(c.c, b.lo), b.hi)) AS DOUBLE)
               / COUNT(*) / 100 AS winsor_mean
    FROM cents c JOIN bounds b ON c.priority = b.priority
    GROUP BY c.priority
    ORDER BY c.priority
    """,
)
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per order priority — the robust central
    tendency a finance/metrics team reports when a handful of whale
    orders would otherwise swing the average: values below the exact
    5th / above the 95th percentile are CLAMPED to the boundary (not
    dropped — that's trimming, agg_trimmed_mean's contract; the two
    answer different audit questions and both belong in the surface).

    Exactness: prices become integer cents first; the percentile
    boundaries (exact interpolated percentile_cont, proven
    engine-identical in agg_percentile) are FLOORed to integer cents
    before clamping, so the clamped SUM is pure BIGINT — no float
    accumulation; the final mean is one IEEE division (G11). The
    clamp-count column makes the operator auditable (how much mass
    did we touch?).

    Scale: two passes over the fact (percentiles, then clamp+sum),
    both partial-agg shapes; the ≤|priorities|-row bounds frame
    re-attaches as a broadcast equi-join — no sort, no window over
    raw data. At 100 TB swap percentile_cont for approx_percentile
    and the plan is unchanged (the documented sketch twin)."""
    orders = load(spark, sf_dir, "orders")
    cents = orders.select(
        F.col("o_orderpriority").alias("priority"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("c"),
    )
    bounds = cents.groupBy("priority").agg(
        F.floor(F.expr(f"percentile(c, {WINSOR_LO})")).cast("bigint").alias("lo"),
        F.floor(F.expr(f"percentile(c, {WINSOR_HI})")).cast("bigint").alias("hi"),
    )
    clamped = F.least(F.greatest(F.col("c"), F.col("lo")), F.col("hi"))
    return (
        cents.join(F.broadcast(bounds), "priority")
        .groupBy("priority")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(
                F.when((F.col("c") < F.col("lo")) | (F.col("c") > F.col("hi")), 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("n_clamped"),
            F.sum(clamped).cast("bigint").alias("winsor_sum_cents"),
            (
                F.sum(clamped).cast("double") / F.count("*") / 100
            ).alias("winsor_mean"),
        )
        .orderBy("priority")
    )


EQ_BUCKET_CENTS = 250_000  # $2,500-wide histogram buckets (pass 1)


@register(
    "agg_exact_quantile_twopass",
    oracle="""
    WITH cents AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            AS c
        FROM orders
    ),
    counts AS (SELECT c, COUNT(*) AS n FROM cents GROUP BY c),
    cum AS (
        SELECT c,
               SUM(n) OVER (ORDER BY c) AS cum,
               SUM(n) OVER () AS tot
        FROM counts
    )
    SELECT CAST(MAX(tot) AS BIGINT) AS n,
           CAST(MIN(CASE WHEN cum * 2 >= tot THEN c END) AS BIGINT)
               AS p50_cents,
           CAST(MIN(CASE WHEN cum * 100 >= tot * 99 THEN c END) AS BIGINT)
               AS p99_cents,
           CAST(MIN(CASE WHEN cum * 2 >= tot THEN c END) AS DOUBLE)
               / 100 AS p50,
           CAST(MIN(CASE WHEN cum * 100 >= tot * 99 THEN c END) AS DOUBLE)
               / 100 AS p99
    FROM cum
    """,
)
def agg_exact_quantile_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global quantiles (lower p50/p99 order statistics) via the
    two-pass bucketed SELECTION algorithm — the scale-correct way to
    get an exact percentile when agg_percentile's per-group sort is
    too big and agg_approx_percentile's error bound isn't acceptable
    (billing SLAs, regulatory reporting):

      pass 1 — a 1-scan fixed-width bucket histogram (≤ a few hundred
        keys, map-side combined); its ≤|buckets|-row cumsum locates
        the bucket holding each target rank; this tiny frame is the
        ONLY thing the driver sees (bounded-driver contract).
      pass 2 — re-scan ONLY the target buckets (the bucket bounds
        compile to range predicates on o_totalprice — pushed to the
        parquet scan) and count per DISTINCT CENT VALUE: that frame is
        bounded by the bucket's VALUE GRID (width in cents), NOT by
        row count — the property that makes the refinement exact at
        ANY data scale; its cumsum yields the value at the residual
        rank.

    The quantile definition (smallest value with cum ≥ ⌈q·n⌉, stated
    as the cross-multiplied integer predicate cum·100 ≥ 99·n) is
    engine-exact; the oracle states it directly over the distinct-
    value frame. Everything is BIGINT cents until the display /100.
    Deeper recursion (bucket → sub-bucket) extends the same pattern
    when the value grid itself is huge (doubles, strings)."""
    orders = load(spark, sf_dir, "orders")
    cents = orders.select(
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("c")
    )
    hist = (
        cents.groupBy(
            (F.col("c") - F.col("c") % EQ_BUCKET_CENTS).alias("blo")
        )
        .agg(F.count("*").alias("bn"))
        .orderBy("blo")
        .collect()  # bounded: ≤ value_range / EQ_BUCKET_CENTS rows
    )
    tot = sum(r.bn for r in hist)
    targets = {"p50": (tot + 1) // 2, "p99": -(-99 * tot // 100)}
    plan = {}  # name -> (bucket_lo, local_rank)
    for name, k in targets.items():
        below = 0
        for r in hist:
            if below + r.bn >= k:
                plan[name] = (r.blo, k - below)
                break
            below += r.bn
    wanted = sorted({blo for blo, _ in plan.values()})
    in_bucket = [
        (F.col("c") >= blo) & (F.col("c") < blo + EQ_BUCKET_CENTS)
        for blo in wanted
    ]
    pred = in_bucket[0]
    for nxt in in_bucket[1:]:
        pred = pred | nxt
    subset = cents.filter(pred)  # range predicates → parquet pushdown
    grid = (
        subset.groupBy(
            (F.col("c") - F.col("c") % EQ_BUCKET_CENTS).alias("blo"), "c"
        )
        .agg(F.count("*").alias("n"))
    )
    w_cum = Window.partitionBy("blo").orderBy("c").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cumgrid = grid.select(
        "blo", "c", F.sum("n").over(w_cum).alias("local_cum")
    )
    # Both quantiles resolve in ONE refinement job: conditional MINs
    # over the shared cumgrid frame (one scan of the target buckets).
    sel = [
        F.min(
            F.when(
                (F.col("blo") == blo) & (F.col("local_cum") >= local_rank),
                F.col("c"),
            )
        ).alias(name)
        for name, (blo, local_rank) in plan.items()
    ]
    row = cumgrid.agg(*sel).collect()[0]  # bounded: 1 row, 2 scalars
    results = {name: row[name] for name in plan}
    return spark.createDataFrame(
        [
            (
                tot,
                results["p50"],
                results["p99"],
                results["p50"] / 100,
                results["p99"] / 100,
            )
        ],
        "n bigint, p50_cents bigint, p99_cents bigint, p50 double, p99 double",
    )


CMS_DEPTH = 4  # independent salted hash rows
CMS_WIDTH = 64  # buckets per row


def _cms_oracle() -> str:
    return f"""
    WITH keys AS (
        SELECT l_partkey AS k FROM lineitem
    ),
    cells AS (
        SELECT d.d,
               ('0x' || substring(md5('cm' || d.d || '|' ||
                                      CAST(k AS VARCHAR)), 1, 15))::BIGINT
                   % {CMS_WIDTH} AS bucket,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM keys CROSS JOIN (SELECT unnest(range({CMS_DEPTH})) AS d) d
        GROUP BY 1, 2
    ),
    tops AS (
        SELECT k, CAST(COUNT(*) AS BIGINT) AS true_cnt
        FROM keys GROUP BY k
        ORDER BY true_cnt DESC, k
        LIMIT 10
    ),
    est AS (
        SELECT t.k, t.true_cnt,
               CAST(MIN(c.cnt) AS BIGINT) AS est_cnt
        FROM tops t
        CROSS JOIN (SELECT unnest(range({CMS_DEPTH})) AS d) d
        JOIN cells c
          ON c.d = d.d
         AND c.bucket = ('0x' || substring(md5('cm' || d.d || '|' ||
                                               CAST(t.k AS VARCHAR)), 1, 15)
                        )::BIGINT % {CMS_WIDTH}
        GROUP BY t.k, t.true_cnt
    )
    SELECT k AS l_partkey, true_cnt, est_cnt,
           CAST(est_cnt - true_cnt AS BIGINT) AS over_cnt
    FROM est
    ORDER BY true_cnt DESC, l_partkey
    """


@register("agg_countmin_sketch", oracle=_cms_oracle())
def agg_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch point queries (Cormode & Muthukrishnan 2005) —
    the frequency sketch completing the family after HLL (distinct),
    KMV (intersection) and bottom-k (sampling): a CMS_DEPTH x CMS_WIDTH
    (4x64) grid of salted-md5 counters answers "how often did key x occur?"
    in O(1) space-per-key with one-sided error (never under-counts).
    The op builds the sketch over lineitem part keys in ONE pass,
    then reports the exact top-10 parts' true counts next to their
    sketch estimates and the (provably ≥ 0) overestimate — the
    accuracy audit a production rollout of the sketch ships with.

    Determinism: bucket ids are md5-derived integers (engine-identical,
    task-retry-safe, mergeable across partitions/streams — counters
    add), counts are exact bigints, no float anywhere.

    Plan: the sketch build partial-aggs to DEPTH*WIDTH = 256
    cells regardless of corpus size (THE point of the sketch); the
    exact top-10 is TakeOrdered over the per-key agg; probing joins
    the 10×{CMS_DEPTH} probe rows to the broadcast cell frame.

    Reference parity: extends the reference's COUNT-style batch stats
    (main.go:202-223 row-count ledger) with the sketch a 100 TB
    archive uses when exact per-key counts stop fitting anywhere."""
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("k")
    )

    def bucket(d: int, key):
        # bucket = (int(md5[0:15], 16)) % WIDTH. Since 16² ≡ 0
        # (mod 64), only the last two hex chars of the 15-char prefix
        # contribute to the value mod 64 — parse exactly those two
        # (r13, guide §1.2 per-task work: identical bucket ids, 2-char
        # conv instead of 15-char).
        assert CMS_WIDTH == 64
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"cm{d}|"), key.cast("string"))), 14, 2
            ),
            16,
            10,
        ).cast("bigint") % CMS_WIDTH

    # r13 (guide §2.3 "aggregate before you shuffle", §2.4 shared
    # exchange): count per key FIRST, then hash only the distinct keys
    # — the 4 salted md5s run once per DISTINCT part key instead of
    # once per lineitem row (~30× fewer hashes at sf0.1, and |keys| ≪
    # |rows| at any scale). Cell counts are the identical sums
    # (Σ_keys cnt(k)·[bucket(k)=cell]), and the same per-key count
    # frame feeds the exact top-10, so Catalyst reuses ONE keyed
    # exchange for both branches instead of scanning lineitem twice.
    keycnt = li.groupBy("k").agg(
        F.count("*").cast("bigint").alias("true_cnt")
    )
    pairs = keycnt.select(
        "true_cnt",
        F.posexplode(
            F.array(*[bucket(d, F.col("k")) for d in range(CMS_DEPTH)])
        ).alias("d", "bucket"),
    )
    cells = pairs.groupBy("d", "bucket").agg(
        F.sum("true_cnt").cast("bigint").alias("cnt")
    )
    tops = keycnt.orderBy(F.desc("true_cnt"), "k").limit(10)
    probes = tops.select(
        "k",
        "true_cnt",
        F.posexplode(
            F.array(*[bucket(d, F.col("k")) for d in range(CMS_DEPTH)])
        ).alias("d", "bucket"),
    )
    est = (
        probes.join(F.broadcast(cells), ["d", "bucket"])
        .groupBy("k", "true_cnt")
        .agg(F.min("cnt").cast("bigint").alias("est_cnt"))
    )
    return est.select(
        F.col("k").alias("l_partkey"),
        "true_cnt",
        "est_cnt",
        (F.col("est_cnt") - F.col("true_cnt")).cast("bigint").alias("over_cnt"),
    ).orderBy(F.desc("true_cnt"), "l_partkey")


SKEW_Q = 100_000  # cents -> ~$1000 units: 550 shape-resolution levels


@register(
    "agg_skew_kurtosis",
    oracle=f"""
    WITH q AS (
        SELECT o_orderpriority AS priority,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   // {SKEW_Q} AS xq
        FROM orders
    ),
    anchor AS (
        SELECT priority, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(xq) // COUNT(*) AS BIGINT) AS c
        FROM q GROUP BY priority
    ),
    t AS (
        SELECT q.priority, a.n, a.c,
               CAST(SUM(q.xq - a.c) AS BIGINT) AS t1,
               CAST(SUM((q.xq - a.c) * (q.xq - a.c)) AS BIGINT) AS t2,
               CAST(SUM((q.xq - a.c) * (q.xq - a.c) * (q.xq - a.c))
                    AS BIGINT) AS t3,
               CAST(SUM((q.xq - a.c) * (q.xq - a.c) * (q.xq - a.c)
                        * (q.xq - a.c)) AS BIGINT) AS t4
        FROM q JOIN anchor a ON q.priority = a.priority
        GROUP BY q.priority, a.n, a.c
    ),
    m AS (
        SELECT priority, n, c, t1, t2, t3, t4,
               CAST(t1 AS DOUBLE) / n AS d,
               CAST(t2 AS DOUBLE) / n AS r2,
               CAST(t3 AS DOUBLE) / n AS r3,
               CAST(t4 AS DOUBLE) / n AS r4
        FROM t
    )
    SELECT priority, n AS n_orders, c AS q_anchor, t2, t3, t4,
           ROUND((r3 - 3 * d * r2 + 2 * d * d * d)
                 / pow(r2 - d * d, 1.5), 6) + 0.0 AS skewness_g1,
           ROUND((r4 - 4 * d * r3 + 6 * d * d * r2 - 3 * d * d * d * d)
                 / ((r2 - d * d) * (r2 - d * d)) - 3.0, 6) + 0.0
               AS kurtosis_excess
    FROM m
    ORDER BY priority
    """,
)
def agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority skewness and excess kurtosis of order value — the
    distribution-SHAPE profile (heavy tail? lopsided?) that mean/stddev
    reports miss, the screen run before choosing between mean-based
    and robust statistics downstream.

    Exactness via the SHIFTED-MOMENT integer ladder: order cents are
    floor-quantized to ~$1000 units (SKEW_Q — 550 resolution levels,
    ample for a shape statistic), the anchor c = floor(mean) is an
    exact integer, and the four shifted power sums T_k = Σ(x−c)^k are
    exact BIGINTs kept under 2^53 BY CONSTRUCTION (|x−c| ≤ ~550 ⇒
    T4 ≤ n·9e10 — safe to n ≈ 9e4 per group at this spread; raise
    SKEW_Q for bigger groups, the documented knob). The true central
    moments follow exactly from the shift identity with δ = T1/n ∈
    [0,1): m2 = r2−δ², m3 = r3−3δr2+2δ³, m4 = r4−4δr3+6δ²r2−3δ⁴ —
    a fixed IEEE dag over exact integers, ROUND(·,6)+0.0 outputs at
    O(1) magnitude (G13). Naive Σx⁴ would overflow every integer type
    at cents scale (5e7⁴ ≈ 6e30/row); the quantize+shift ladder is
    the standard fix.

    Plan: one scan → per-group (n, Σ) anchor (broadcast back) → one
    partial-agg pass folds all four power sums; nothing after the
    first agg scales with rows.

    Reference parity: no reference counterpart; extends the
    agg_global_stats family with the 3rd/4th moments."""
    orders = load(spark, sf_dir, "orders")
    q = orders.select(
        F.col("o_orderpriority").alias("priority"),
        F.expr(
            f"CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            f" DIV {SKEW_Q}"
        ).alias("xq"),
    )
    anchor = q.groupBy("priority").agg(
        F.count("*").cast("bigint").alias("n"),
        F.expr("SUM(xq) DIV COUNT(*)").cast("bigint").alias("c"),
    )
    dev = F.col("xq") - F.col("c")
    t = (
        q.join(F.broadcast(anchor), "priority")
        .groupBy("priority", "n", "c")
        .agg(
            F.sum(dev).cast("bigint").alias("t1"),
            F.sum(dev * dev).cast("bigint").alias("t2"),
            F.sum(dev * dev * dev).cast("bigint").alias("t3"),
            F.sum(dev * dev * dev * dev).cast("bigint").alias("t4"),
        )
    )
    n_d = F.col("n").cast("double")
    d = F.col("t1").cast("double") / n_d
    r2 = F.col("t2").cast("double") / n_d
    r3 = F.col("t3").cast("double") / n_d
    r4 = F.col("t4").cast("double") / n_d
    m2 = r2 - d * d
    g1 = (r3 - 3 * d * r2 + 2 * d * d * d) / F.pow(m2, 1.5)
    g2 = (r4 - 4 * d * r3 + 6 * d * d * r2 - 3 * d * d * d * d) / (
        m2 * m2
    ) - 3.0
    return t.select(
        "priority",
        F.col("n").alias("n_orders"),
        F.col("c").alias("q_anchor"),
        "t2",
        "t3",
        "t4",
        (F.round(g1, 6) + F.lit(0.0)).alias("skewness_g1"),
        (F.round(g2, 6) + F.lit(0.0)).alias("kurtosis_excess"),
    ).orderBy("priority")
