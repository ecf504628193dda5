"""Window-function operators.

The reference's per-table ``ORDER BY timestamp DESC LIMIT 100``
(main.go:92-93) generalizes to per-group top-k — a window row_number,
not a global sort. All windows here partition by a key, so execution is
one hash shuffle on the partition key followed by an in-partition sort;
no global ordering is ever required (the 100 TB-safe property).

Determinism: every orderBy pins a unique total order via a tiebreak id
(SURVEY.md §8 G5), and time ordering uses epoch-ms (G1). rank/dense_rank
are value-functions of the sort key, so they stay deterministic even on
tied keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pg_archiver_spark.catalog import load
from pg_archiver_spark.registry import register


@register(
    "window_topk_per_group",
    oracle="""
    SELECT event_type, event_id, epoch_ms
    FROM (
        SELECT event_type, event_id, epoch_ms(ts) AS epoch_ms,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type
                   ORDER BY epoch_ms(ts) DESC, event_id
               ) AS rn
        FROM events
    )
    WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 newest events per type — the reference's sorted-limit scan
    (main.go:92-93) applied per group instead of per table."""
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("epoch_ms").desc(), F.col("event_id")
    )
    return (
        events.select(
            "event_type", "event_id", F.expr("ts_ns DIV 1000000").alias("epoch_ms")
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@register(
    "window_rank",
    oracle="""
    SELECT n_name, c_custkey, c_acctbal,
           RANK() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC) AS rnk,
           DENSE_RANK() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC) AS drnk
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    QUALIFY rnk <= 5
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank of customers by balance within nation (top 5).
    Rank values depend only on the sort-key values, so ties don't break
    determinism of the output set."""
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    joined = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    )
    w = Window.partitionBy("n_name").orderBy(F.col("c_acctbal").desc())
    return (
        joined.select("n_name", "c_custkey", "c_acctbal")
        .withColumn("rnk", F.rank().over(w))
        .withColumn("drnk", F.dense_rank().over(w))
        .filter(F.col("rnk") <= 5)
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           COALESCE(CAST(ROUND(CAST(value AS DECIMAL(18,3))
                          - LAG(CAST(value AS DECIMAL(18,3))) OVER w, 2)
                         AS DOUBLE), 0.0) AS delta_prev,
           COALESCE(CAST(ROUND(LEAD(CAST(value AS DECIMAL(18,3))) OVER w
                          - CAST(value AS DECIMAL(18,3)), 2)
                         AS DOUBLE), 0.0) AS delta_next
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Δvalue vs neighboring events (lag/lead). Partition
    boundary rows (no prev/next) emit 0.0, not NULL — a nullable double
    turns into NaN under the driver's pandas oracle fetch while Spark's
    collect keeps None, so nullable numerics are banned from final
    schemas (G13). The difference runs in DECIMAL(18,3) (the
    window_running_sum G2 pattern): a double subtraction of two
    3dp-grid values lands within an ulp of a .xx5 boundary and the
    engines' 2dp ROUNDs split (Spark BigDecimal saw ...4999 where
    DuckDB's scaled floor saw ...5000 — found by the r11 random-fixture
    sweep); exact decimal diffs round identically everywhere."""
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.expr("ts_ns DIV 1000000"), F.col("event_id")
    )
    vdec = F.col("value").cast("decimal(18,3)")
    return events.select(
        "event_id",
        "user_id",
        F.coalesce(
            F.round(vdec - F.lag(vdec).over(w), 2).cast("double"),
            F.lit(0.0),
        ).alias("delta_prev"),
        F.coalesce(
            F.round(F.lead(vdec).over(w) - vdec, 2).cast("double"),
            F.lit(0.0),
        ).alias("delta_next"),
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
               PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_value
    FROM events
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user cumulative decimal sum in event order. Decimal keeps the
    prefix sums exact at any accumulation order (G2); the per-row result
    takes one final deterministic cast to double (G13)."""
    events = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.expr("ts_ns DIV 1000000"), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_value"),
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey, day_int,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey ORDER BY day_int
               RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS rolling_30d
    FROM (
        SELECT o_orderkey, o_custkey, o_totalprice,
               epoch_ms(o_orderdate) // 86400000 AS day_int
        FROM orders
    )
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 30-day spend per customer — a RANGE frame over integer
    epoch-days. RANGE frames are value-based, so same-day ties land in
    the same frame in both engines (deterministic without a tiebreak)."""
    orders = load(spark, sf_dir, "orders")
    # o_orderdate is TIMESTAMP_NTZ; datediff against the epoch date is
    # timezone-free, matching DuckDB's epoch_ms // 86400000.
    day_int = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
    ).cast("long")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day_int")
        .rangeBetween(-30, Window.currentRow)
    )
    return (
        orders.select(
            "o_orderkey", "o_custkey", "o_totalprice", day_int.alias("day_int")
        )
        .select(
            "o_orderkey",
            "o_custkey",
            "day_int",
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .over(w)
            .cast("double")
            .alias("rolling_30d"),
        )
    )


@register(
    "window_cume_dist",
    oracle="""
    SELECT n_name, c_custkey,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume,
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WINDOW w AS (PARTITION BY n_name ORDER BY c_acctbal)
    """,
)
def window_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist — distribution-position functions; like
    rank they depend only on sort-key values, so tied keys stay
    deterministic.

    Deliberately NOT rounded: k/n divisions are IEEE-identical in both
    engines, while ROUND(x, 6) resolves exact-tie values (e.g.
    0.5046875) differently (Spark HALF_UP on the decimal repr vs
    DuckDB rounding the binary value) — observed at sf0.1."""
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    joined = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    )
    w = Window.partitionBy("n_name").orderBy("c_acctbal")
    return joined.select(
        "n_name",
        "c_custkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "window_first_last",
    oracle="""
    SELECT DISTINCT user_id,
           FIRST_VALUE(event_id) OVER w AS first_event,
           LAST_VALUE(event_id) OVER w AS last_event
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value over an unbounded frame: each user's
    first and last event id in time order (unique tiebreak, G5)."""
    events = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.expr("ts_ns DIV 1000000"), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return events.select(
        "user_id",
        F.first("event_id").over(w).alias("first_event"),
        F.last("event_id").over(w).alias("last_event"),
    ).distinct()


@register(
    "window_ntile",
    oracle="""
    SELECT tile, event_type, COUNT(*) AS n_events
    FROM (
        SELECT event_type,
               NTILE(4) OVER (ORDER BY event_id) AS tile
        FROM events
    )
    GROUP BY tile, event_type
    """,
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile bucketing by a unique order key, then a per-(tile,type)
    histogram. Note: an un-partitioned ntile is a single-task sort —
    fine for bucketing samples, not for 100 TB (use percentile-based
    bucketing there)."""
    events = load(spark, sf_dir, "events")
    w = Window.orderBy("event_id")
    return (
        events.select("event_type", F.ntile(4).over(w).alias("tile"))
        .groupBy("tile", "event_type")
        .agg(F.count("*").alias("n_events"))
    )


@register(
    "window_ntile_scalable",
    oracle="""
    SELECT tile, event_type, COUNT(*) AS n_events
    FROM (
        SELECT event_type,
               NTILE(4) OVER (ORDER BY event_id) AS tile
        FROM events
    )
    GROUP BY tile, event_type
    """,
)
def window_ntile_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """window_ntile's 100 TB twin: IDENTICAL output (NTILE(4) by
    event_id, then a per-(tile,type) histogram) with no single-task
    global sort. Same oracle as window_ntile — the driver proves the
    two agree.

    Two-phase global rank (the pipeline_token_budget trick, applied to
    a numeric order key): `width_bucket(event_id, min, max+1, 256)` is
    monotone in event_id, so bucket order == global order; per-bucket
    row_number (a window PARTITIONED by bucket) plus the 256-row
    prefix-sum offset frame reconstructs the exact global rank. The
    tile is then closed-form from (rank, total): NTILE gives the first
    `total mod 4` tiles one extra row. Every partition-sized sort is
    bounded by corpus/256 — bucket balance follows the key
    distribution (swap in percentile_approx cutpoints if it's skewed);
    the only global windows run on the 256-row offset frame."""
    events = load(spark, sf_dir, "events").select("event_id", "event_type")
    n_buckets = 256
    mm = events.agg(
        F.min("event_id").alias("lo"),
        (F.max("event_id") + F.lit(1)).alias("hi"),
    )
    bucketed = events.crossJoin(F.broadcast(mm)).withColumn(
        "bucket",
        F.width_bucket(F.col("event_id"), F.col("lo"), F.col("hi"), F.lit(n_buckets)),
    )
    w_prefix = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_total = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = (
        bucketed.groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .select(
            "bucket",
            F.coalesce(F.sum("n").over(w_prefix), F.lit(0)).alias("offset"),
            F.sum("n").over(w_total).alias("total"),
        )
    )
    w_bucket = Window.partitionBy("bucket").orderBy("event_id")
    ranked = bucketed.join(F.broadcast(offsets), "bucket").withColumn(
        "r", F.row_number().over(w_bucket) + F.col("offset")
    )
    base = F.expr("total DIV 4")
    rem = F.col("total") % 4
    cut = rem * (base + 1)
    tile = F.when(
        F.col("r") <= cut, F.expr("(r - 1) DIV (total DIV 4 + 1) + 1")
    ).otherwise(
        rem + F.expr("(r - (total % 4) * (total DIV 4 + 1) - 1) DIV (total DIV 4)") + 1
    )
    return (
        ranked.select(tile.cast("int").alias("tile"), "event_type")
        .groupBy("tile", "event_type")
        .agg(F.count("*").alias("n_events"))
    )


@register(
    "window_scd2_intervals",
    oracle="""
    SELECT user_id,
           event_type AS state,
           epoch_ms(ts) AS valid_from_ms,
           COALESCE(
               LEAD(epoch_ms(ts)) OVER (
                   PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
               ),
               CAST(253402300800000 AS BIGINT)
           ) AS valid_to_ms
    FROM events
    """,
)
def window_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 (slowly-changing-dimension) interval construction: each
    per-user state change becomes a [valid_from, valid_to) row, the
    history-table form every warehouse keeps for time-travel joins. One
    shuffle on user_id + an in-partition sort — same cost envelope as
    any per-entity window at 100 TB.

    The open interval's end is the year-9999 sentinel, not NULL (G13:
    nullable numerics are banned from final schemas)."""
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.expr("ts_ns DIV 1000000"), F.col("event_id")
    )
    return events.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.expr("ts_ns DIV 1000000").alias("valid_from_ms"),
        F.coalesce(
            F.lead(F.expr("ts_ns DIV 1000000")).over(w),
            F.lit(253402300800000).cast("long"),
        ).alias("valid_to_ms"),
    )


@register(
    "window_ratio_to_report",
    oracle="""
    WITH per_user AS (
        SELECT event_type, user_id,
               SUM(CAST(value AS DECIMAL(18,2))) AS user_value
        FROM events
        GROUP BY event_type, user_id
    )
    SELECT event_type, user_id,
           CAST(user_value AS DOUBLE) AS user_value,
           CAST(user_value AS DOUBLE)
               / CAST(SUM(user_value) OVER (PARTITION BY event_type)
                      AS DOUBLE) AS share
    FROM per_user
    """,
)
def window_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each user's share of their event type's total
    value — the unbounded-window pattern done the 100 TB-safe way:
    AGGREGATE FIRST (one shuffle collapses events to |users × types|
    rows), then the unbounded window runs over the already-small frame,
    partitioned by event_type so there is no single-task global sort.
    The naive spelling (window directly over raw events) would carry
    every event row through the window state; this shape's window input
    is bounded by the user population regardless of event volume.

    Determinism: sums are exact DECIMAL (order-independent, G2), both
    engines cast the SAME exact decimals to DOUBLE before the division,
    and IEEE division is bit-identical — so the raw double `share` needs
    no rounding (G11: avoid ROUND on ratios entirely)."""
    events = load(spark, sf_dir, "events")
    per_user = events.groupBy("event_type", "user_id").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("user_value")
    )
    w = Window.partitionBy("event_type")
    return per_user.select(
        "event_type",
        "user_id",
        F.col("user_value").cast("double").alias("user_value"),
        (
            F.col("user_value").cast("double")
            / F.sum("user_value").over(w).cast("double")
        ).alias("share"),
    )


@register(
    "window_percent_rank",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS r
        FROM lineitem GROUP BY l_suppkey
    )
    SELECT l_suppkey,
           CAST(r AS DOUBLE) AS revenue,
           percent_rank() OVER (ORDER BY r, l_suppkey) AS pr
    FROM rev ORDER BY l_suppkey
    """,
)
def window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank over per-supplier revenue — the relative-standing
    score ((rank−1)/(n−1)), built from the two-pass bucket-offset rank
    (scalable.py) instead of a partition-less window: a supplier
    population is corpus-cardinality at 100 TB, so even the AGGREGATED
    frame must not funnel through one task. The unique (revenue,
    suppkey) order makes row_number == rank (no shared ties), so
    percent_rank is exactly (global_rank−1)/(n−1) — an IEEE division
    of identical integers on both engines, bit-deterministic. The
    bucket key is the revenue decimal cast to double inside the helper
    (decimal→double rounding is monotone, so bucket order preserves
    the total order; in-bucket sort on the exact decimal breaks any
    collisions). n==1 guard matches SQL percent_rank's 0.0
    convention."""
    from pg_archiver_spark.operators.scalable import bucketed_global_rank

    li = load(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("r")
    )
    ranked = bucketed_global_rank(
        rev,
        F.col("r"),
        [F.col("r"), F.col("l_suppkey")],
        "__rk",
        "__n",
    )
    pr = F.when(F.col("__n") == 1, F.lit(0.0)).otherwise(
        (F.col("__rk") - 1).cast("double") / (F.col("__n") - 1).cast("double")
    )
    return (
        ranked.select(
            "l_suppkey",
            F.col("r").cast("double").alias("revenue"),
            pr.alias("pr"),
        )
        .orderBy("l_suppkey")
    )


@register(
    "window_max_drawdown",
    oracle="""
    WITH daily AS (
        SELECT o_orderdate AS d,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100)
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1
    ),
    cums AS (
        SELECT d, SUM(cents) OVER (ORDER BY d) AS cum
        FROM daily
    ),
    curve AS (
        SELECT d, cum, MAX(cum) OVER (ORDER BY d) AS peak
        FROM cums
    )
    SELECT d AS trough_day,
           CAST(peak - cum AS BIGINT) AS drawdown_cents,
           CAST(cum AS BIGINT) AS cum_cents,
           CAST(peak AS BIGINT) AS peak_cents
    FROM curve
    ORDER BY drawdown_cents DESC, trough_day ASC
    LIMIT 1
    """,
)
def window_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the cumulative daily-revenue curve — the
    risk metric every financial / capacity dashboard tracks: the
    largest peak-to-trough fall, found as max over days of
    (running-max-of-cumsum − cumsum). Stacked windows over the SAME
    ordering share one sort: Catalyst evaluates cumsum and
    running-max-of-cumsum in a single Window operator pass.

    Exactness: the curve is integer cents end to end (DECIMAL→BIGINT
    daily sums, integer prefix sums and maxima) — no floats at all;
    the earliest-trough tiebreak makes the reported day total-ordered.

    Plan: one scan → groupBy(date) collapses to the ≤|days| frame →
    one ordered window pass → TakeOrderedAndProject(1). The ordered
    window runs on the aggregated frame (window_running_sum
    precedent; two-pass prefix-sum swap documented there for when
    even that frame is huge)."""
    orders = load(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents")
    )
    w = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    curve = daily.select(
        "d",
        F.sum("cents").over(w).alias("cum"),
    ).select("d", "cum", F.max("cum").over(w).alias("peak"))
    return (
        curve.select(
            F.col("d").alias("trough_day"),
            (F.col("peak") - F.col("cum")).cast("bigint").alias(
                "drawdown_cents"
            ),
            F.col("cum").cast("bigint").alias("cum_cents"),
            F.col("peak").cast("bigint").alias("peak_cents"),
        )
        .orderBy(F.desc("drawdown_cents"), F.asc("trough_day"))
        .limit(1)
    )


@register(
    "window_running_sum_scalable",
    oracle="""
    SELECT o_orderkey,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT))
                OVER (ORDER BY o_orderdate, o_orderkey)
                AS BIGINT) AS cum_cents
    FROM orders
    ORDER BY o_orderdate, o_orderkey
    """,
)
def window_running_sum_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global running sum over EVERY order row WITHOUT a single-task
    window — the two-pass partition-offset prefix sum, executed with
    semantic range buckets: (1) bucket each row by month id (a pure
    function of the sort key, so bucketing needs no sampling shuffle
    and is fully deterministic), compute the within-bucket cumsum with
    an ordinary partitioned window; (2) aggregate per-bucket totals
    (≤|months| rows), turn them into bucket offsets with a cumulative
    window over that tiny frame, and broadcast the offsets back:
    global cum = bucket offset + local cum. Identical output to
    `SUM() OVER (ORDER BY ...)` — the oracle states exactly that — but
    the largest task holds one month, not the table.

    This is the row-scale proof of the pattern window_ntile_scalable /
    analytics_ks_test only document: at 100 TB pick the bucket
    granularity to match task sizing (days instead of months) — the
    offset frame stays metadata-sized.

    Plan: one hash shuffle on bucket id (the only data movement), one
    in-bucket sort; the offset side is a ≤|months|-row agg + window +
    broadcast equi-join. Exact integer cents throughout."""
    orders = load(spark, sf_dir, "orders")
    rows = orders.select(
        "o_orderkey",
        F.col("o_orderdate").alias("d"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias(
            "bucket"
        ),
    )
    w_local = (
        Window.partitionBy("bucket")
        .orderBy("d", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = rows.withColumn("local_cum", F.sum("cents").over(w_local))
    totals = rows.groupBy("bucket").agg(F.sum("cents").alias("tot"))
    w_off = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "bucket", F.coalesce(F.sum("tot").over(w_off), F.lit(0)).alias("off")
    )
    return (
        local.join(F.broadcast(offsets), "bucket")
        .select(
            "o_orderkey",
            (F.col("off") + F.col("local_cum")).cast("bigint").alias(
                "cum_cents"
            ),
        )
        .orderBy("cum_cents")
    )


ROLLREG_WINDOW = 14  # trailing days


@register(
    "window_rolling_regression",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(date_diff('day', DATE '1992-01-01',
                              CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
               CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                    AS BIGINT) AS cents
        FROM orders GROUP BY CAST(o_orderdate AS DATE)
    ),
    winsums AS (
        SELECT day, t, cents,
               COUNT(*) OVER w AS n,
               SUM(t) OVER w AS st,
               SUM(t * t) OVER w AS stt,
               SUM(cents) OVER w AS sy,
               SUM(t * cents) OVER w AS sty
        FROM daily
        WINDOW w AS (ORDER BY t RANGE BETWEEN {ROLLREG_WINDOW - 1} PRECEDING
                     AND CURRENT ROW)
    )
    SELECT day, t, cents, CAST(n AS BIGINT) AS n_window,
           CAST(n * sty - st * sy AS DOUBLE)
               / CAST(n * stt - st * st AS DOUBLE) AS slope_cents_per_day
    FROM winsums
    WHERE n >= 2
    ORDER BY day
    """,
)
def window_rolling_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-window least-squares trend — the 'is the last two weeks
    trending up' line every ops dashboard draws, computed properly:
    for each day, the OLS slope of daily revenue over the trailing
    14-day RANGE frame (range, not rows — gap days shrink the sample
    instead of silently stretching the window back in time). All five
    sufficient statistics are INTEGER window sums over the frame; the
    slope is the one closed-form IEEE division per row. Degenerate
    single-point windows (only the first calendar day can be one) are
    EXCLUDED (n >= 2) on both engines rather than emitted as NULL —
    oracle NULLs round-trip as NaN through the driver's pandas fetch
    (G13), so filtering is the hash-stable form of the guard.

    The window-stack sibling of window_ewma (exponential weighting)
    and the sliding twin of analytics_linreg_trend (global per-group
    fit) / analytics_forecast_backtest (train/test split): same exact
    arithmetic, different temporal scope.

    Scale: the fact-sized work is one partial-agg to the daily frame;
    the five window sums share ONE sort over ≤|calendar| rows. At
    100 TB the daily frame is still |calendar|-bounded — this op's
    cost never grows with raw event volume."""
    orders = load(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.col("o_orderdate").alias("day"))
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("cents")
        )
        .select(
            "day",
            F.datediff("day", F.lit("1992-01-01")).cast("bigint").alias("t"),
            "cents",
        )
    )
    w = (
        Window.orderBy("t")
        .rangeBetween(-(ROLLREG_WINDOW - 1), Window.currentRow)
    )
    winsums = daily.select(
        "day",
        "t",
        "cents",
        F.count("*").over(w).alias("n"),
        F.sum("t").over(w).alias("st"),
        F.sum(F.col("t") * F.col("t")).over(w).alias("stt"),
        F.sum("cents").over(w).alias("sy"),
        F.sum(F.col("t") * F.col("cents")).over(w).alias("sty"),
    )
    den = F.col("n") * F.col("stt") - F.col("st") * F.col("st")
    num = F.col("n") * F.col("sty") - F.col("st") * F.col("sy")
    return (
        winsums.filter(F.col("n") >= 2)
        .select(
            "day",
            "t",
            "cents",
            F.col("n").cast("bigint").alias("n_window"),
            (num.cast("double") / den.cast("double")).alias(
                "slope_cents_per_day"
            ),
        )
        .orderBy("day")
    )


@register(
    "window_gap_fill_locf",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_diff('day', DATE '1992-01-01',
                              CAST(o_orderdate AS DATE)) AS BIGINT) AS d,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                    AS BIGINT) AS cents
        FROM orders GROUP BY CAST(o_orderdate AS DATE)
    ),
    spine AS (
        SELECT unnest(generate_series(
            (SELECT MIN(d) FROM daily), (SELECT MAX(d) FROM daily)
        )) AS d
    ),
    joined AS (
        SELECT s.d, daily.cents FROM spine s
        LEFT JOIN daily ON s.d = daily.d
    )
    SELECT d,
           CAST(LAST_VALUE(cents IGNORE NULLS) OVER (
               ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cents_filled,
           CASE WHEN cents IS NULL THEN 1 ELSE 0 END AS is_filled
    FROM joined
    ORDER BY d
    """,
)
def window_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling by LAST OBSERVATION CARRIED FORWARD over a
    generated calendar spine — the step-function twin of
    analytics_interpolate_linear (same topology, different fill
    semantics; LOCF is correct for STATE-like series — a price or
    config holds until changed — where linear interpolation would
    invent values nobody set). The spine is `sequence(min_day,
    max_day)` exploded from the 1-row extremes aggregate (gap days
    EXIST as rows — a dashboard that skips missing days lies about
    them); observed days left-join on, and the fill is
    `last_value(IGNORE NULLS)` over the ordered frame, with an
    `is_filled` audit flag so filled and observed values stay
    distinguishable downstream. The spine starts AT the first
    observed day, so the fill is total — no leading NULL ever reaches
    the output (the G13 NULL/NaN trap is avoided structurally).

    Scale: one fact pass to the daily frame; the spine is
    |calendar|-bounded and the LOCF window is one ordered pass over
    it — swap in the bucket-offset prefix pattern if |calendar| ever
    outgrows a task (it doesn't)."""
    orders = load(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.datediff("o_orderdate", F.lit("1992-01-01"))
        .cast("bigint")
        .alias("d")
    ).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("cents")
    )
    spine = daily.agg(
        F.min("d").alias("lo"), F.max("d").alias("hi")
    ).select(F.explode(F.expr("sequence(lo, hi)")).alias("d"))
    joined = spine.join(daily, "d", "left")
    w = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return joined.select(
        "d",
        F.last("cents", ignorenulls=True)
        .over(w)
        .cast("bigint")
        .alias("cents_filled"),
        F.when(F.col("cents").isNull(), 1).otherwise(0).alias("is_filled"),
    ).orderBy("d")
