"""Join operators.

The reference has no joins — its delete-behind (main.go:131-145) is the
only set-complement semantics it ships (anti-join here). The rest is the
north-star relational surface, each shaped for its 100 TB physical plan:

- fact ⋈ fact  → sort-merge / shuffled-hash on the equi key (Catalyst +
  AQE choose; AQE also splits skewed partitions),
- fact ⋈ dim   → explicit ``F.broadcast`` on the dimension side: no
  shuffle of the fact table at all,
- theta joins  → always given an equi-prefix (brand, user_id) so the
  planner hash-partitions on it instead of falling into a full
  BroadcastNestedLoopJoin cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_archiver_spark.catalog import load
from pg_archiver_spark.registry import register


@register(
    "join_inner_equi",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ customer equi-join. Both sides shuffle on custkey; at
    scale AQE converts to broadcast if the customer side is small."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


@register(
    "join_broadcast_dim",
    oracle="""
    SELECT p_brand,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ broadcast dimension: the lineitem side never shuffles for
    the join — each task hash-probes the broadcast part table. The only
    shuffle is the final 25-group aggregation (map-side partials first).

    The decimal product sums exactly at scale 4, then takes one final
    deterministic cast to DOUBLE (G13: pandas-stable output schema; a
    lossy downcast to scale 2 would also hit engine-specific
    tie-rounding — Spark HALF_UP vs DuckDB's cast truncation).
    """
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    disc_price = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.sum(disc_price).cast("double").alias("revenue"))
    )


@register(
    "join_star_multiway",
    oracle="""
    SELECT r_name, COUNT(*) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def join_star_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way star: both dims broadcast, so the whole join pipeline is one
    scan of customer with two in-memory hash probes (zero shuffles before
    the 5-group agg)."""
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_customers"))
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT n_orders, COUNT(*) AS n_customers
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    )
    GROUP BY n_orders
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (count 0 bucket
    included) — the classic per-entity activity histogram."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count("*").alias("n_customers"))


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey
    FROM customer
    WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
    )
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers with ≥1 finished order. Semi joins
    never duplicate the left side — no post-join dedup needed."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey
    FROM customer
    WHERE NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
    )
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: the delete-behind complement (reference
    main.go:132-134 deletes `WHERE timestamp < cutoff`; the correct
    'rows NOT archived' set is this anti-join — SURVEY.md §4.4 D1).

    Restricted to urgent orders so the result is non-degenerate at
    every scale factor (with all orders, no customer qualifies)."""
    customer = load(spark, sf_dir, "customer")
    urgent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return customer.join(
        urgent, customer.c_custkey == urgent.o_custkey, "left_anti"
    ).select("c_custkey")


@register(
    "join_theta_range",
    oracle="""
    SELECT p1.p_brand AS brand, COUNT(*) AS n_pairs
    FROM part p1 JOIN part p2
      ON p1.p_brand = p2.p_brand AND p1.p_size < p2.p_size
    GROUP BY brand
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + theta join. The brand equi-key keeps this a hash join with
    a residual `<` filter — without it the planner degenerates to a
    nested-loop cross product (quadratic at 100 TB). Within-brand pair
    counts stay bounded because brands are low-cardinality groups."""
    part = load(spark, sf_dir, "part")
    p1 = part.select(
        F.col("p_brand").alias("brand"), F.col("p_size").alias("size1")
    )
    p2 = part.select(
        F.col("p_brand").alias("brand2"), F.col("p_size").alias("size2")
    )
    return (
        p1.join(p2, (p1.brand == p2.brand2) & (p1.size1 < p2.size2))
        .groupBy("brand")
        .agg(F.count("*").alias("n_pairs"))
    )


@register(
    "join_asof",
    oracle="""
    SELECT COUNT(*) AS n_matched,
           CAST(SUM(gap_ms) // (COUNT(*) * 60) AS BIGINT) AS avg_gap_millimin
    FROM (
        SELECT epoch_ms(e.ts) - epoch_ms(s.ts) AS gap_ms
        FROM (SELECT * FROM events WHERE event_type = 'error') e
        ASOF JOIN (SELECT * FROM events WHERE event_type = 'signup') s
          ON e.user_id = s.user_id AND e.ts >= s.ts
    )
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each error event matched to the latest prior signup of
    the same user. Spark has no native as-of on DataFrames; we compose it
    as union + last(ignorenulls) over a per-user time-ordered window
    (SURVEY.md §7.3): one shuffle on user_id, one in-partition sort,
    O(events) work — no error×signup pair materialization, so a user
    with millions of events costs millions of rows, not trillions of
    pairs. `is_error` sorts signups before errors at equal timestamps,
    giving the ASOF `e.ts >= s.ts` inclusive boundary.

    Oracle: DuckDB native ASOF JOIN (≥ semantics on both sides).
    """
    from pyspark.sql import Window

    events = load(spark, sf_dir, "events")
    tagged = events.filter(
        F.col("event_type").isin("error", "signup")
    ).select(
        "user_id",
        F.expr("ts_ns DIV 1000000").alias("ms"),
        (F.col("event_type") == "error").cast("int").alias("is_error"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ms", "is_error")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_signup_ms = F.last(
        F.when(F.col("is_error") == 0, F.col("ms")), ignorenulls=True
    ).over(w)
    matched = (
        tagged.withColumn("last_s_ms", last_signup_ms)
        .filter((F.col("is_error") == 1) & F.col("last_s_ms").isNotNull())
        .select((F.col("ms") - F.col("last_s_ms")).alias("gap_ms"))
    )
    # Mean gap in exact milli-minutes: Σgap_ms / (n·60) floor-divided —
    # int-ratio ROUND ties resolve differently across engines (G11).
    return matched.agg(
        F.count("*").alias("n_matched"),
        F.expr("SUM(gap_ms) DIV (COUNT(*) * 60)").alias("avg_gap_millimin"),
    )


@register(
    "join_bucketed_colocated",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderstatus = 'F'
    GROUP BY c_mktsegment
    """,
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join via bucketed tables: both sides bucketed 8-ways
    on the join key at write time, so the join needs NO exchange at all
    (asserted in tests/test_plans.py). This is the 100 TB pattern for a
    repeatedly-joined key: pay one shuffle at ingest, never again."""
    import os
    import tempfile

    base = os.path.join(tempfile.gettempdir(), f"pg_archiver_spark-{os.getpid()}", "bucketed")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    customer = load(spark, sf_dir, "customer")
    for name, df, key in (
        ("b_orders", orders, "o_custkey"),
        ("b_customer", customer, "c_custkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .option("path", os.path.join(base, name))
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(name)
        )
    b_orders = spark.table("b_orders")
    b_customer = spark.table("b_customer")
    return (
        b_orders.join(b_customer, b_orders.o_custkey == b_customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


@register(
    "join_skew_salted",
    oracle="""
    WITH fact AS (
        SELECT event_id,
               CASE WHEN user_id % 2 = 0 THEN 0 ELSE user_id END AS skew_key,
               value
        FROM events
    ),
    dim AS (
        SELECT DISTINCT CASE WHEN user_id % 2 = 0 THEN 0 ELSE user_id END AS skew_key,
               concat('u', CASE WHEN user_id % 2 = 0 THEN 0 ELSE user_id END) AS label
        FROM events
    )
    SELECT label,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM fact JOIN dim USING (skew_key)
    GROUP BY label
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salting for skewed join keys: half the fact rows share one hot
    key (synthetic skew). The fact side appends salt = event_id % 8; the
    dim side explodes ×8; the join runs on (key, salt), spreading the
    hot key over 8 tasks. Result is identical to the unsalted join (the
    oracle). At 100 TB this (or AQE skew-join splitting) is what keeps
    one executor from running the whole hot key alone."""
    events = load(spark, sf_dir, "events")
    skew_key = F.when(F.col("user_id") % 2 == 0, F.lit(0)).otherwise(
        F.col("user_id")
    )
    fact = events.select(
        "event_id",
        skew_key.alias("skew_key"),
        "value",
        (F.col("event_id") % 8).alias("salt"),
    )
    dim = (
        events.select(skew_key.alias("skew_key"))
        .distinct()
        .select(
            "skew_key",
            F.concat(F.lit("u"), F.col("skew_key")).alias("label"),
            F.explode(F.sequence(F.lit(0), F.lit(7))).alias("salt"),
        )
    )
    return (
        fact.join(dim, ["skew_key", "salt"])
        .groupBy("label")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


@register(
    "join_interval_pairs",
    oracle="""
    SELECT COUNT(*) AS n_pairs
    FROM events e1 JOIN events e2
      ON e1.user_id = e2.user_id
     AND e1.event_id < e2.event_id
     AND ABS(epoch_ms(e1.ts) - epoch_ms(e2.ts)) <= 300000
    """,
)
def join_interval_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-user event pairs within a 5-minute interval — BANDED range
    join: each left event joins on (user, bucket) for its own 5-minute
    bucket and the two adjacent ones, so the equi-key is (user, bucket)
    and every candidate pair is within one band of the true interval.
    The exact |Δms| ≤ 300000 predicate filters residually.

    Vs a plain user-only equi-join, this bounds per-task pair counts by
    events-per-(user, 5-min-bucket)² instead of events-per-user² — the
    difference between a stable shuffle join and a hot-key blowup when a
    user has millions of events at 100 TB. Each pair is found exactly
    once: the right side keeps its true bucket; only the left explodes
    to the 3 probe buckets.
    """
    events = load(spark, sf_dir, "events")
    base = events.select(
        "user_id",
        "event_id",
        F.expr("ts_ns DIV 1000000").alias("ms"),
        F.expr("ts_ns DIV 1000000 DIV 300000").alias("bucket"),
    )
    left = base.select(
        F.col("user_id").alias("u1"),
        F.col("event_id").alias("id1"),
        F.col("ms").alias("ms1"),
        F.explode(
            F.array(F.col("bucket") - 1, F.col("bucket"), F.col("bucket") + 1)
        ).alias("probe_bucket"),
    )
    right = base.select(
        F.col("user_id").alias("u2"),
        F.col("event_id").alias("id2"),
        F.col("ms").alias("ms2"),
        F.col("bucket").alias("probe_bucket"),
    )
    pairs = left.join(
        right,
        (left.u1 == right.u2)
        & (left.probe_bucket == right.probe_bucket)
        & (left.id1 < right.id2)
        & (F.abs(left.ms1 - right.ms2) <= 300000),
    )
    return pairs.agg(F.count("*").alias("n_pairs"))


@register(
    "composed_q5_local_supplier",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def composed_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape — local-supplier revenue per nation for one region
    and order year: the 6-table composition every piece of the join
    surface exists to serve. The physical strategy is the 100 TB one:
    the two facts (orders, lineitem) shuffle on their join keys ONCE
    each; supplier / nation / region broadcast, so region pruning and
    the customer-nation = supplier-nation condition are in-memory hash
    probes, and the o_orderdate range pushes into the orders scan.
    Exact decimal revenue internally, one final cast to DOUBLE (G13)."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    disc_price = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(supplier),
            (li.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(disc_price).cast("double").alias("revenue"))
    )


@register(
    "join_asof_tolerance",
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, epoch_ms(ts) AS ms
        FROM events WHERE event_type = 'purchase'
    ),
    v AS (
        SELECT user_id, epoch_ms(ts) AS ms
        FROM events WHERE event_type = 'view'
    ),
    g AS (
        SELECT p.event_id, p.ms, MAX(v.ms) AS v_ms
        FROM p LEFT JOIN v
          ON p.user_id = v.user_id
         AND v.ms <= p.ms AND v.ms >= p.ms - 600000
        GROUP BY p.event_id, p.ms
    )
    SELECT COUNT(*) AS n_purchases,
           COUNT(v_ms) AS n_matched,
           CAST(COALESCE(SUM(ms - v_ms) // (COUNT(v_ms) * 60), -1)
                AS BIGINT) AS avg_gap_millimin
    FROM g
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join WITH a tolerance bound: each purchase matched to the
    latest prior view of the same user, but only if it happened within
    the last 10 minutes — the attribution-window semantics ad/product
    analytics actually needs (`join_asof` is the unbounded form).

    Same linearization as join_asof — union both event kinds, ONE
    shuffle on user_id, last(ignorenulls) over the time-ordered window
    — then the tolerance is a plain filter on the recovered gap. Still
    O(events) with no pair materialization; the oracle's LEFT JOIN +
    MAX formulation is the quadratic spelling of the same contract.
    """
    from pyspark.sql import Window

    events = load(spark, sf_dir, "events")
    tagged = events.filter(
        F.col("event_type").isin("purchase", "view")
    ).select(
        "user_id",
        F.expr("ts_ns DIV 1000000").alias("ms"),
        (F.col("event_type") == "purchase").cast("int").alias("is_p"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ms", "is_p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_view_ms = F.last(
        F.when(F.col("is_p") == 0, F.col("ms")), ignorenulls=True
    ).over(w)
    purchases = (
        tagged.withColumn("last_v_ms", last_view_ms)
        .filter(F.col("is_p") == 1)
        .withColumn(
            "matched",
            F.col("last_v_ms").isNotNull()
            & (F.col("ms") - F.col("last_v_ms") <= 600000),
        )
    )
    return purchases.agg(
        F.count("*").alias("n_purchases"),
        F.sum(F.col("matched").cast("long")).alias("n_matched"),
        # Zero matched purchases → NULL mean gap on both engines →
        # pandas NaN vs Spark None under the driver compare (G13c,
        # r11 random-fixture sweep) — sentinel -1.
        F.expr(
            "COALESCE(SUM(CASE WHEN matched THEN ms - last_v_ms END)"
            " DIV (SUM(CASE WHEN matched THEN 1 END) * 60), -1)"
        ).alias("avg_gap_millimin"),
    )

@register(
    "composed_q3_shipping_priority",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           o_orderpriority,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-07-01'
      AND l_shipdate  > TIMESTAMP '1997-07-01'
    GROUP BY o_orderkey, order_date, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def composed_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape — top-10 unshipped BUILDING-segment orders by
    open revenue. Composition check for filter pushdown + join + agg +
    global top-k in one plan: both date predicates push into the
    Parquet scans, customer prunes to one segment BEFORE its join, the
    agg shuffles on o_orderkey once, and the final top-10 is
    TakeOrderedAndProject (per-partition heaps, no global sort).
    Revenue is exact decimal internally, cast to DOUBLE once (G13);
    the o_orderkey tiebreak makes the top-10 selection deterministic
    across engines."""
    cutoff = F.lit("1997-07-01").cast("timestamp")
    customer = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    disc_price = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
        )
        .agg(F.sum(disc_price).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@register(
    "join_bloom_runtime_filter",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
    GROUP BY o_orderpriority
    """,
)
def join_bloom_runtime_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join pruning — the shuffle-reduction story
    for fact ⋈ fact at 100 TB. When the build side of a shuffle join is
    selectively filtered but too big (or too late) to broadcast,
    Catalyst's `InjectRuntimeFilter` builds a bloom filter of its join
    keys as a runtime subquery and applies `might_contain` to the probe
    side BEFORE its shuffle: lineitem rows whose order can't survive
    the orders filter are dropped at the scan, so the big side's
    exchange carries only ~matching keys. Plan-asserted in tests
    (`might_contain` + `bloom_filter_agg`).

    The thresholds that gate injection are sized for real clusters
    (probe-side scan ≥ 10 GB), so at fixture scale the op runs on an
    isolated `spark.newSession()` — same SparkContext, private SQLConf
    — with the probe threshold dropped and broadcast disabled to force
    the shuffle-join shape. The parent session's conf is untouched
    (tests pin this), so the driver's other queries keep their plans."""
    s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold",
        "0",
    )
    orders = load(s2, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
    )
    li = load(s2, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(disc_price).cast("double").alias("revenue"),
        )
    )


Q18_QTY_THRESHOLD = 200


@register(
    "composed_q18_large_orders",
    oracle="""
    SELECT o_custkey,
           o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
               AS total_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS total_qty
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 200
    )
    GROUP BY o_custkey, o_orderkey, order_date, total_price
    ORDER BY total_price DESC, o_orderkey
    LIMIT 100
    """,
)
def composed_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape — the 100 largest orders by total quantity over
    a HAVING-filtered grouped subquery. The classic formulation scans
    lineitem twice (once for the IN-subquery, once for the outer agg);
    here the per-order quantity agg is computed ONCE, HAVING-filtered,
    and joined back to orders — at 100 TB that halves the biggest scan
    and replaces the IN with an equi-join on an already-aggregated
    (small) side, which AQE can broadcast. Top-100 is
    TakeOrderedAndProject with a (price, orderkey) deterministic
    tiebreak. The oracle keeps the textbook double-scan spelling to
    prove the rewrite is semantics-preserving."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_qty")
        )
        .filter(F.col("total_qty") > Q18_QTY_THRESHOLD)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.col("o_totalprice")
            .cast("decimal(18,2)")
            .cast("double")
            .alias("total_price"),
            "total_qty",
        )
        .orderBy(F.desc("total_price"), "o_orderkey")
        .limit(100)
    )


@register(
    "composed_q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey  = l.l_suppkey
    JOIN orders   o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey  = o.o_custkey
    JOIN nation  n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation  n2 ON n2.n_nationkey = c.c_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY supp_nation, cust_nation, ship_year
    """,
)
def composed_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape — cross-border trade volume between two nations by
    ship year: the nation-pair self-role composition (nation joined
    TWICE, once for the supplier side, once for the customer side).

    100 TB strategy: the two facts (lineitem, orders) shuffle on their
    join keys once each; supplier, customer-side nation, and
    supplier-side nation broadcast (DIM_TABLES-fixed size), so both
    nation-name predicates become in-memory hash probes and Catalyst
    pushes the residual pair-disjunction below the aggregate. Customer
    is the only mid-size build side; AQE picks broadcast vs shuffle by
    its runtime stats. Decimal-exact revenue, one final DOUBLE cast
    (G13)."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    disc_price = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(
            F.sum(disc_price).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "join_null_safe_eq",
    oracle="""
    WITH a AS (
        SELECT nullif(l_returnflag, 'N') AS flag, COUNT(*) AS n_lines
        FROM lineitem GROUP BY flag
    ),
    b AS (
        SELECT nullif(l_returnflag, 'N') AS flag,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        FROM lineitem WHERE l_linestatus = 'F' GROUP BY flag
    )
    SELECT COALESCE(CAST(a.flag AS VARCHAR), 'NULL') AS flag,
           a.n_lines,
           COALESCE(b.qty, 0.0) AS qty
    FROM a JOIN b ON a.flag IS NOT DISTINCT FROM b.flag
    """,
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing — the semantics dimension
    ingest needs when a "key" is an optional attribute. Spark plans
    `eqNullSafe` as an ordinary hash join (NULL hashes like any other
    key value), so the shape stays shuffle-or-broadcast hash, never a
    fallback NLJ. Output coalesces the NULL key to a sentinel and the
    null-side aggregate to 0.0 (G13c: no nullable numeric outputs)."""
    li = load(spark, sf_dir, "lineitem")
    a = li.groupBy(
        F.nullif(F.col("l_returnflag"), F.lit("N")).alias("flag")
    ).agg(F.count("*").alias("n_lines"))
    b = (
        li.filter(F.col("l_linestatus") == "F")
        .groupBy(F.nullif(F.col("l_returnflag"), F.lit("N")).alias("bflag"))
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("qty")
        )
    )
    return a.join(b, a.flag.eqNullSafe(b.bflag)).select(
        F.coalesce(F.col("flag"), F.lit("NULL")).alias("flag"),
        "n_lines",
        F.coalesce(F.col("qty"), F.lit(0.0)).alias("qty"),
    )


@register(
    "composed_q10_returned_items",
    oracle="""
    SELECT c.c_custkey,
           c.c_name,
           n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue,
           COUNT(*) AS n_lines
    FROM customer c
    JOIN orders   o ON c.c_custkey   = o.o_custkey
    JOIN lineitem l ON l.l_orderkey  = o.o_orderkey
    JOIN nation   n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def composed_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape — top-20 customers by revenue lost to returned
    items in one quarter (the reference's downstream users run exactly
    this class of "who/what drove the archive's rows" report over the
    hive-partitioned store, README.md:88-102).

    100 TB strategy: both date bounds and the returnflag predicate sit
    BELOW the joins so the Parquet scans prune row groups first
    (quarter selectivity ~1/24 on orders, flag ~1/3 on lineitem);
    nation broadcasts (25 rows); orders⋈lineitem shuffles on orderkey
    — AQE broadcasts the quarter-filtered orders side when its runtime
    size permits. r13 (guide §2.3, aggregate before you shuffle):
    revenue/line counts aggregate per o_custkey FIRST — the custkey
    exchange carries map-side-combined per-customer partials instead
    of the lineitem-grain join output with c_name riding along — and
    customer/nation attributes (functionally dependent on the key)
    attach to the ~|active customers per quarter| aggregate, not to
    every line. Final top-20 is TakeOrderedAndProject (no global sort
    materialization), revenue decimal-exact with one final DOUBLE cast
    and c_custkey as the deterministic tiebreak (G11/G13)."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    nation = load(spark, sf_dir, "nation")
    disc_price = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .join(
            li.filter(F.col("l_returnflag") == "R"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(
            F.sum(disc_price).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "n_name", "revenue", "n_lines")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "composed_q12_priority_shipmode",
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count,
           COUNT(*) AS n_lines
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l.l_linestatus
    """,
)
def composed_q12_priority_shipmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape — conditional (CASE-WHEN) counts of high- vs
    low-priority orders per line status for one ship year. The fixture
    lineitem has no l_shipmode column, so l_linestatus plays the
    category role; the contract shape — fact⋈fact join with the
    selective date range on the PROBE side and a two-way conditional
    aggregation — is Q12's exactly.

    100 TB strategy: the ship-year range prunes lineitem row groups
    before the join (the filter reaches PushedFilters); the join
    shuffles both facts on orderkey (sort-merge; AQE re-plans if the
    filtered side collapses); the CASE-WHEN pair aggregates map-side
    (partial hash agg) so the final shuffle carries 2 groups, not
    600M rows. Integer counts only — no float hash risk (G13)."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "composed_q14_promo_revenue",
    oracle="""
    SELECT ROUND(
               100.00 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                   THEN CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))
                   ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
               / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE),
               4) + 0.0 AS promo_pct,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01'
    """,
)
def composed_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape — promo revenue share for one month: two
    conditional decimal sums over the same lineitem⋈part join, divided
    once at the end. The month filter prunes lineitem row groups
    BEFORE the join; part broadcasts (dimension); both sums are exact
    decimals accumulated in the SAME partial-agg pass (one scan, one
    broadcast probe, no second aggregation), so the only float op is
    the final ratio of two identical exact values — bit-equal across
    engines before the coarse ROUND (G2/G4/G13)."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    disc_price = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    promo_price = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.round(
                    F.lit(100.0)
                    * F.sum(promo_price).cast("double")
                    / F.sum(disc_price).cast("double"),
                    4,
                )
                + F.lit(0.0)
            ).alias("promo_pct"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "composed_q4_priority_exists",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def composed_q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape — order-priority counts for a quarter, keeping
    only orders with at least one line shipped after the order date
    (late-shipment EXISTS). The correlated EXISTS becomes a LEFT SEMI
    join with a composite condition: equi on orderkey (the hash key)
    plus the non-equi date comparison as a residual filter evaluated
    inside the semi probe — never a nested-loop, and each order emits
    at most once regardless of matching line count (semi semantics, no
    post-join distinct needed).

    100 TB strategy: the quarter filter prunes orders first (scan-level
    pushdown), so the semi join's build/probe is quarter-sized on the
    orders side; lineitem streams through it partitioned by orderkey.
    Integer-only output (G13)."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@register(
    "join_scd2_pointintime",
    oracle="""
    WITH dim AS (
        SELECT user_id, event_type AS state,
               epoch_ms(ts) AS valid_from_ms,
               COALESCE(
                   LEAD(epoch_ms(ts)) OVER (
                       PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
                   ),
                   CAST(253402300800000 AS BIGINT)
               ) AS valid_to_ms
        FROM events WHERE event_type IN ('signup', 'purchase')
    ),
    facts AS (
        SELECT event_id, user_id, epoch_ms(ts) AS ms
        FROM events WHERE event_type = 'error'
    )
    SELECT d.state,
           COUNT(*) AS n_errors,
           COUNT(DISTINCT f.user_id) AS n_users
    FROM facts f
    JOIN dim d
      ON f.user_id = d.user_id
     AND f.ms >= d.valid_from_ms
     AND f.ms <  d.valid_to_ms
    GROUP BY d.state
    ORDER BY d.state
    """,
)
def join_scd2_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (time-travel) lookup against an SCD2 dimension:
    each error event is joined to the state interval ACTIVE at its
    timestamp — the fact-to-history join every warehouse runs against
    the validity intervals `window_scd2_intervals` builds. Here the
    dimension is the per-user signup/purchase state history derived
    from the same events table, and the report is errors by
    then-active state.

    100 TB strategy: equi-prefix on user_id keeps this a hash join
    (one shuffle each side, keyed like every other per-entity op); the
    interval containment is a residual filter inside the probe, and
    [valid_from, valid_to) intervals are disjoint per user BY
    CONSTRUCTION (lead() over the change sequence), so each fact
    matches ≤1 interval — no fan-out, no post-join dedup. The
    half-open sentinel end (year 9999) keeps the open interval
    NULL-free (G13)."""
    from pyspark.sql import Window

    events = load(spark, sf_dir, "events")
    ms = F.expr("ts_ns DIV 1000000")
    dim = events.filter(
        F.col("event_type").isin("signup", "purchase")
    ).select(
        F.col("user_id").alias("d_user"),
        F.col("event_type").alias("state"),
        ms.alias("valid_from_ms"),
        F.coalesce(
            F.lead(ms).over(
                Window.partitionBy("user_id").orderBy(ms, F.col("event_id"))
            ),
            F.lit(253402300800000).cast("long"),
        ).alias("valid_to_ms"),
    )
    facts = events.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", ms.alias("ms")
    )
    return (
        facts.join(
            dim,
            (F.col("user_id") == F.col("d_user"))
            & (F.col("ms") >= F.col("valid_from_ms"))
            & (F.col("ms") < F.col("valid_to_ms")),
        )
        .groupBy("state")
        .agg(
            F.count("*").alias("n_errors"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("state")
    )


@register(
    "composed_q19_disjunctive",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def composed_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape — revenue under an OR-of-ANDs predicate spanning
    both join sides (three brand/size/quantity bands). The planner test
    here is DISJUNCTION handling: Catalyst factors the common
    `p_partkey` equi-condition out of the OR (the join stays a single
    broadcast hash join, never three unions of joins), pushes the
    quantity bounds' common envelope to the lineitem scan, and
    evaluates the residual disjunction post-probe in one codegen stage.

    100 TB strategy: one pass over lineitem, part broadcast; the OR
    never multiplies scans (a naive UNION ALL spelling would read the
    fact three times). Decimal-exact revenue, single DOUBLE cast
    (G2/G13)."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    disc_price = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(band)
        .agg(
            F.sum(disc_price).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "join_asof_nearest",
    oracle="""
    WITH e AS (
        SELECT event_id, user_id, epoch_ms(ts) AS ms
        FROM events WHERE event_type = 'error'
    ),
    s AS (
        SELECT event_id AS s_id, user_id, epoch_ms(ts) AS s_ms
        FROM events WHERE event_type = 'signup'
    ),
    pairs AS (
        SELECT e.event_id, e.ms, s.s_id, s.s_ms,
               abs(e.ms - s.s_ms) AS gap,
               ROW_NUMBER() OVER (
                   PARTITION BY e.event_id
                   ORDER BY abs(e.ms - s.s_ms), s.s_id
               ) AS rn
        FROM e JOIN s ON e.user_id = s.user_id
    )
    SELECT COUNT(*) AS n_matched,
           CAST(SUM(gap) AS BIGINT) AS total_gap_ms,
           CAST(SUM(CASE WHEN s_ms <= ms THEN 1 ELSE 0 END) AS BIGINT)
               AS n_backward
    FROM pairs WHERE rn = 1
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join — the third as-of mode alongside
    backward (`join_asof`) and tolerance-bounded (`join_asof_tolerance`):
    each error event matches the signup of the same user MINIMIZING
    |Δt| in EITHER direction (earlier signup id on exact ties — G5),
    the mode sensor-fusion and attribution pipelines use when the
    reference clock can drift both ways.

    Plan shape: equi-join on user_id (hash, one shuffle each side) +
    a per-error-event row_number window over that event's candidate
    set — fan-out bounded by per-user event counts, the same envelope
    as every per-entity op here; integer-exact gaps, no float math.
    At 100 TB with heavy per-user histories, pre-bucket both sides by
    (user_id, time_bucket) and probe adjacent buckets only (the
    join_range_binned pattern) to cap the candidate set per event."""
    from pyspark.sql import Window

    events = load(spark, sf_dir, "events")
    ms = F.expr("ts_ns DIV 1000000")
    e = events.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", ms.alias("ms")
    )
    s = events.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("s_id"),
        F.col("user_id").alias("s_user"),
        ms.alias("s_ms"),
    )
    gap = F.abs(F.col("ms") - F.col("s_ms"))
    w = Window.partitionBy("event_id").orderBy(gap, F.col("s_id"))
    nearest = (
        e.join(s, F.col("user_id") == F.col("s_user"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return nearest.agg(
        F.count("*").alias("n_matched"),
        F.sum(gap).alias("total_gap_ms"),
        F.sum(F.when(F.col("s_ms") <= F.col("ms"), 1).otherwise(0)).alias(
            "n_backward"
        ),
    )


@register(
    "composed_q8_market_share",
    oracle="""
    WITH rev AS (
        SELECT year(o_orderdate) AS yr,
               CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(18,2))) AS vol,
               sn.n_name AS supp_nation
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation   cn ON cn.n_nationkey = c_nationkey
        JOIN region   ON r_regionkey = cn.n_regionkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   sn ON sn.n_nationkey = s_nationkey
        WHERE r_name = 'ASIA'
          AND o_orderdate BETWEEN TIMESTAMP '1995-01-01'
                              AND TIMESTAMP '1996-12-31'
    )
    SELECT CAST(yr AS BIGINT) AS yr,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_2'
                         THEN vol ELSE 0 END) AS DOUBLE)
           / CAST(SUM(vol) AS DOUBLE) AS mkt_share
    FROM rev GROUP BY yr ORDER BY yr
    """,
)
def composed_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape — national market share: one nation's fraction of
    regional revenue by year, the conditional-sum-ratio over a
    double-role nation join (nation probes once for the customer side,
    once for the supplier side — the Q7 composition plus the ratio).

    Both the CASE'd numerator and the denominator accumulate in ONE
    partial-agg pass (no second scan, no self-join); both are exact
    decimals, and the single ratio is an IEEE divide of two identical-
    valued doubles — deterministic across engines (G4/G11; no ROUND
    needed).

    r13 (guide §2.4): the join order previously shuffled the WIDEST
    frame twice — lineitem⋈orders on orderkey, then that lineitem-
    grain result again on custkey to meet customer. Now customer is
    pruned to the ASIA region first (two broadcast probes, then
    projected to c_custkey alone), orders meets it on custkey while
    still order-grain, and the lineitem-grain frame shuffles exactly
    once (orderkey) — the q5 topology. Same four exchanges, but the
    custkey exchange carries orders rows, not lineitem rows, and the
    orderkey re-shuffle of the order side is two columns wide.

    Measured cost at sf0.1 (where EVERY side broadcasts, so the
    exchange win is invisible): ~+0.4 s med, because the
    orders⋈asian-customers intermediate becomes a broadcast build
    that must finish before lineitem streams — a serial chain the old
    shape didn't have. That regime inverts at scale: none of these
    sides is broadcastable at 100 TB, and the old shape's second
    lineitem-grain exchange dominates. Kept deliberately."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1996-12-31").cast("timestamp"))
    )
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")

    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_reg")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    asia = region.filter(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    cust_asia = (
        customer.join(F.broadcast(cn), customer.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(asia), F.col("cn_reg") == asia.r_regionkey)
        .select("c_custkey")
    )
    ordc = (
        orders.join(cust_asia, orders.o_custkey == cust_asia.c_custkey)
        .select(
            "o_orderkey", F.year("o_orderdate").cast("bigint").alias("yr")
        )
    )
    rev = (
        li.join(ordc, li.l_orderkey == ordc.o_orderkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(sn), supplier.s_nationkey == F.col("sn_key"))
        .select("yr", vol.alias("vol"), "supp_nation")
    )
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_2", F.col("vol")).otherwise(
            F.lit(0).cast("decimal(18,2)")
        )
    ).cast("double")
    den = F.sum("vol").cast("double")
    return (
        rev.groupBy("yr")
        .agg((num / den).alias("mkt_share"))
        .orderBy("yr")
    )


@register(
    "composed_q9_product_profit",
    oracle="""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    - CAST(p_retailprice AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(0.4 AS DECIMAL(2,1))) AS DOUBLE) AS profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%plat%'
    GROUP BY n_name, yr
    ORDER BY nation, yr DESC
    """,
)
def composed_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape — product-line profit by supplier nation and
    year: revenue minus cost over a 5-table star with a substring
    part-name filter. The fixtures carry no partsupp.ps_supplycost, so
    unit cost is proxied at 40% of p_retailprice — same join topology,
    same decimal-exact profit arithmetic (Spark's HALF_UP vs DuckDB's
    tie-truncation never fires: every product of two scale-2 decimals
    and the scale-1 literal is exact, G11).

    The '%plat%' LIKE cannot push to a parquet min/max but DOES prune
    the broadcast part dim before the join (filter-above-scan on the
    build side), so the fact joins only matching parts. One lineitem
    shuffle (orders join), all dims broadcast."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%plat%"))
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders")

    profit = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
        - F.col("p_retailprice").cast("decimal(18,2)")
        * F.col("l_quantity").cast("decimal(18,2)")
        * F.lit("0.4").cast("decimal(2,1)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("yr"),
        )
        .agg(F.sum(profit).cast("double").alias("profit"))
        .orderBy("nation", F.desc("yr"))
    )


@register(
    "composed_q13_order_distribution",
    oracle="""
    WITH c_orders AS (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN orders ON o_custkey = c_custkey
                        AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def composed_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape — the two-level distribution aggregate:
    per-customer order counts (INCLUDING zero — the left outer join
    with the filter INSIDE the join condition, not a WHERE, is the
    whole point), then a histogram of those counts. The textbook
    filters on o_comment; the fixture equivalent is the
    order-priority predicate.

    COUNT(o_orderkey) counts only matched rows (NULL from the outer
    side doesn't count) — both engines agree. Plan: orders filtered
    then shuffled on custkey once, customer shuffled once, outer join,
    two hash aggregations — the second one is over ≤ max-orders-per-
    customer distinct keys, map-side combinable. At 100 TB nothing
    here is quadratic; the zero-count customers ride the outer join,
    never a NOT EXISTS re-scan."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    c_orders = (
        customer.join(
            orders.filter(F.col("o_orderpriority") != "1-URGENT"),
            customer.c_custkey == orders.o_custkey,
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        c_orders.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "composed_q16_supplier_part_cnt",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#45'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    LIMIT 50
    """,
)
def composed_q16_supplier_part_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape — distinct supplier counts per part attribute
    triple, minus an excluded-supplier NOT IN: 'how many suppliers can
    provide each niche part class'. partsupp is absent, so the
    supplier↔part relation comes from lineitem (who actually shipped
    the part); the excluded set (complaint suppliers in the textbook)
    is negative-balance suppliers here.

    The NOT IN goes through the SQL path on purpose so Catalyst plans
    the REAL null-aware broadcast anti-join (BroadcastHashJoin ...
    isNullAwareAntiJoin=true, `spark.sql.optimizeNullAwareAntiJoin`):
    if the excluded set ever contained a NULL s_suppkey the whole
    NOT IN collapses to empty — textbook three-valued semantics a
    plain left_anti silently gets wrong. Excluded suppliers never
    enter the shuffle. The part predicate prunes the broadcast build
    side. One fact shuffle on the (brand, type, size) grouping with
    partial distinct aggregation; top-50 is TakeOrderedAndProject
    with the full-column tiebreak."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("q16_lineitem")
    load(spark, sf_dir, "part").createOrReplaceTempView("q16_part")
    load(spark, sf_dir, "supplier").createOrReplaceTempView("q16_supplier")
    return spark.sql(
        """
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM q16_lineitem JOIN q16_part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#45'
          AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
          AND l_suppkey NOT IN (
              SELECT s_suppkey FROM q16_supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        LIMIT 50
        """
    )


@register(
    "join_full_outer",
    oracle="""
    WITH urgent AS (
        SELECT o_custkey,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS urgent_spend
        FROM orders WHERE o_orderpriority = '1-URGENT'
        GROUP BY o_custkey
    ),
    building AS (
        SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS acctbal
        FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    SELECT CASE WHEN u.o_custkey IS NOT NULL AND b.c_custkey IS NOT NULL
                THEN 'both'
                WHEN u.o_custkey IS NOT NULL THEN 'left_only'
                ELSE 'right_only' END AS side,
           COUNT(*) AS n_customers,
           CAST(COALESCE(SUM(u.n_orders), 0) AS BIGINT) AS n_orders,
           CAST(COALESCE(SUM(CAST(u.urgent_spend AS DECIMAL(18,2))), 0)
                AS DOUBLE) AS urgent_spend
    FROM urgent u FULL OUTER JOIN building b ON u.o_custkey = b.c_custkey
    GROUP BY side
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join — both null-extension directions in one plan:
    urgent-order buyers without a BUILDING-segment profile (left_only)
    and BUILDING customers with no urgent orders (right_only).

    Physical shape: both sides are pre-aggregated/filtered to per-key
    frames, then sort-merge full-outer on custkey. Full outer forbids
    broadcast (every row of BOTH sides must survive unmatched), so the
    shuffle-on-key plan here IS the 100 TB plan; the pre-aggregation
    keeps the shuffled payload to one row per key per side. The final
    3-row classification aggregate is map-side combinable.

    Reference parity: the reference's restore-vs-live audit (the manual
    check after main.go:131-145 deletes) is exactly this both-sides
    diff; dataset_diff (scans.py) does the row-level form.
    """
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("urgent_spend"),
        )
    )
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", F.col("c_acctbal").cast("double").alias("acctbal")
    )
    joined = urgent.join(
        building, urgent.o_custkey == building.c_custkey, "full_outer"
    )
    side = (
        F.when(
            F.col("o_custkey").isNotNull() & F.col("c_custkey").isNotNull(),
            "both",
        )
        .when(F.col("o_custkey").isNotNull(), "left_only")
        .otherwise("right_only")
    )
    return joined.groupBy(side.alias("side")).agg(
        F.count("*").alias("n_customers"),
        F.coalesce(F.sum("n_orders"), F.lit(0)).alias("n_orders"),
        F.coalesce(
            F.sum(F.col("urgent_spend").cast("decimal(18,2)")), F.lit(0)
        )
        .cast("double")
        .alias("urgent_spend"),
    )



@register(
    "join_aqe_runtime_broadcast",
    oracle="""
    SELECT p.p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size < 5
    GROUP BY p.p_brand
    """,
)
def join_aqe_runtime_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADAPTIVE runtime join re-planning — the AQE behavior that saves
    the most shuffles at 100 TB: the static planner cannot know that
    `p_size < 5` keeps only a sliver of the dim table (stats say "part
    is big", so it plans a SortMergeJoin and a full fact shuffle), but
    AQE measures the ACTUAL post-filter size at the shuffle boundary
    and rewrites the join to a BroadcastHashJoin mid-query — the fact
    table's shuffle is elided at runtime. Tests assert the executed
    plan carries BOTH shapes: SortMergeJoin in the initial plan,
    BroadcastHashJoin in `isFinalPlan=true`.

    Conf shape (cloned session): static
    `autoBroadcastJoinThreshold=-1` (models the real-world case — the
    planner's estimate is too big/unknown to broadcast) while
    `adaptive.autoBroadcastJoinThreshold` stays enabled, so ONLY the
    runtime path can broadcast. This is the house rule "let Catalyst
    optimize" made load-bearing: declare the join, let measured sizes
    pick the strategy. At 100 TB the same mechanism converts any
    selective-dim star join after the dim's filter collapses it."""
    s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10m")
    li = load(s2, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice"
    )
    part = load(s2, sf_dir, "part").filter(F.col("p_size") < 5).select(
        "p_partkey", "p_brand"
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


@register(
    "join_point_in_time_features",
    oracle="""
    WITH labels AS (
        SELECT user_id, epoch_ms(ts) AS label_ms, value
        FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
        SELECT user_id, epoch_ms(ts) AS ms FROM events
        WHERE event_type = 'click'
    ),
    views AS (
        SELECT user_id, epoch_ms(ts) AS ms FROM events
        WHERE event_type = 'view'
    ),
    feat AS (
        SELECT l.user_id, l.label_ms,
               (SELECT COUNT(*) FROM clicks c
                WHERE c.user_id = l.user_id AND c.ms <= l.label_ms)
                   AS clicks_before,
               (SELECT COUNT(*) FROM views v
                WHERE v.user_id = l.user_id AND v.ms <= l.label_ms)
                   AS views_before
        FROM labels l
    )
    SELECT CAST(clicks_before > 0 AS VARCHAR) AS had_click,
           CAST(COUNT(*) AS BIGINT) AS n_labels,
           CAST(SUM(clicks_before) AS BIGINT) AS sum_clicks_before,
           CAST(SUM(views_before) AS BIGINT) AS sum_views_before
    FROM feat
    GROUP BY had_click
    """,
)
def join_point_in_time_features(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """POINT-IN-TIME-correct feature join — the feature-store
    operation that prevents label leakage: every training label
    (purchase) is enriched with feature values computed ONLY from
    events at-or-before the label's timestamp (clicks-so-far,
    views-so-far). Doing this with a plain join + filter is the classic
    leakage bug factory; doing it with a per-label correlated subquery
    (the oracle's spelling) is O(labels × history). The scalable
    spelling here: union the label and feature streams, ONE shuffle on
    user_id, and running-count windows — every label row reads its
    PIT-correct feature for free at O(events log events_per_user), the
    same envelope as join_asof (this op is its many-features,
    running-aggregate generalization).

    Output is grouped by a derived cohort (had any click before
    purchase) so the hash check pins every per-label feature value via
    the sums."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.expr("ts_ns DIV 1000000").alias("ms"),
        "event_type",
        "event_id",
    ).filter(F.col("event_type").isin("purchase", "click", "view"))
    # Order ties so same-ms features COUNT (<= semantics): feature
    # events sort before the label at equal timestamps.
    is_label = (F.col("event_type") == "purchase").cast("int")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ms", is_label.asc(), "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    enriched = ev.withColumn(
        "clicks_before",
        F.sum((F.col("event_type") == "click").cast("long")).over(w),
    ).withColumn(
        "views_before",
        F.sum((F.col("event_type") == "view").cast("long")).over(w),
    )
    labels = enriched.filter(F.col("event_type") == "purchase")
    return labels.groupBy(
        (F.col("clicks_before") > 0).cast("string").alias("had_click")
    ).agg(
        F.count("*").alias("n_labels"),
        F.sum("clicks_before").alias("sum_clicks_before"),
        F.sum("views_before").alias("sum_views_before"),
    )


SPATIAL_BOX = 1_000_000  # micro-degree box (~1.1° square)
SPATIAL_R = 15_000  # radius in micro-degrees (~1.7 km)


@register(
    "join_spatial_grid",
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey,
               ('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 1, 7))
                   ::BIGINT % {SPATIAL_BOX} AS lat,
               ('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 9, 7))
                   ::BIGINT % {SPATIAL_BOX} AS lon
        FROM customer
    )
    SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
           CAST((a.lat - b.lat) * (a.lat - b.lat)
                + (a.lon - b.lon) * (a.lon - b.lon) AS BIGINT) AS dist2
    FROM pts a JOIN pts b
      ON a.c_custkey < b.c_custkey
     AND (a.lat - b.lat) * (a.lat - b.lat)
         + (a.lon - b.lon) * (a.lon - b.lon) <= {SPATIAL_R}::BIGINT
                                                * {SPATIAL_R}
    ORDER BY custkey_a, custkey_b
    """,
)
def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial radius self-join via grid-cell bucketing — the
    proximity-pairs query (customers within ~1.7 km of each other)
    WITHOUT the quadratic cross join the oracle states. Each point
    lands in one R×R grid cell; a pair within radius R must sit in the
    same or an adjacent cell. r13 (guide §2.3): the left side fans out
    to the HALF-PLANE of its neighborhood — the 5 offsets
    {(0,0),(0,1),(1,-1),(1,0),(1,1)} instead of all 9 — and the join
    stays a plain EQUI-join on cell id, refined by the exact integer
    distance predicate. Found-exactly-once: for an unordered pair with
    cell delta δ = cell_b − cell_a, exactly one of δ/−δ lies in the
    half-set when δ ≠ 0 (the set and its negation are disjoint), so
    the pair matches in exactly one orientation and is canonicalized
    with least/greatest on custkey; for δ = 0 both orientations match
    the (0,0) offset, so that offset alone keeps the custkey_a <
    custkey_b order filter. Exploded shuffle rows: 5·|P| + |P| vs the
    9·|P| + |P| of the full neighborhood (−40 % exchange bytes), and
    the joined candidate stream halves (one orientation per pair
    instead of two).

    Coordinates are derived deterministically from md5(c_custkey) in
    integer micro-degrees (the fixtures carry no geo columns), so both
    engines compute identical points and the distance math is
    pure-integer — no trig libm drift (the production swap is a
    haversine refine on the same candidate set, one line).

    Plan: explode(9) → shuffle both sides on cell id → hash equi-join.
    At 100 TB this is THE scalable shape for spatial joins (geohash /
    S2-cell bucketing): candidates are bounded by 9·(points per cell),
    never |points|², and cell id doubles as a physical partition key
    so a sorted-bucketed layout joins with zero exchanges."""
    cust = load(spark, sf_dir, "customer")
    ncells = SPATIAL_BOX // SPATIAL_R + 1
    pts = cust.select(
        "c_custkey",
        (
            F.conv(
                F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 7),
                16,
                10,
            ).cast("bigint")
            % SPATIAL_BOX
        ).alias("lat"),
        (
            F.conv(
                F.substring(F.md5(F.col("c_custkey").cast("string")), 9, 7),
                16,
                10,
            ).cast("bigint")
            % SPATIAL_BOX
        ).alias("lon"),
    ).withColumn(
        "cell",
        (F.col("lat") / SPATIAL_R).cast("bigint") * ncells
        + (F.col("lon") / SPATIAL_R).cast("bigint"),
    )
    offsets = F.array(
        *[
            F.lit(dx * ncells + dy)
            for dx, dy in ((0, 0), (0, 1), (1, -1), (1, 0), (1, 1))
        ]
    )
    left = pts.select(
        F.col("c_custkey").alias("key_l"),
        F.col("lat").alias("lat_l"),
        F.col("lon").alias("lon_l"),
        F.explode(offsets).alias("off"),
        F.col("cell").alias("cell_l"),
    ).select(
        "key_l",
        "lat_l",
        "lon_l",
        "off",
        (F.col("cell_l") + F.col("off")).alias("cell"),
    )
    right = pts.select(
        F.col("c_custkey").alias("key_r"),
        F.col("lat").alias("lat_r"),
        F.col("lon").alias("lon_r"),
        "cell",
    )
    dist2 = (F.col("lat_l") - F.col("lat_r")) * (
        F.col("lat_l") - F.col("lat_r")
    ) + (F.col("lon_l") - F.col("lon_r")) * (F.col("lon_l") - F.col("lon_r"))
    return (
        left.join(right, "cell")
        .filter(
            ((F.col("off") != 0) | (F.col("key_l") < F.col("key_r")))
            & (dist2 <= SPATIAL_R * SPATIAL_R)
        )
        .select(
            F.least("key_l", "key_r").alias("custkey_a"),
            F.greatest("key_l", "key_r").alias("custkey_b"),
            dist2.cast("bigint").alias("dist2"),
        )
        .orderBy("custkey_a", "custkey_b")
    )


FUZZY_MAX_DIST = 2
FUZZY_LEN_BAND = 2


@register(
    "join_fuzzy_blocked",
    oracle=f"""
    WITH p AS (
        SELECT p_partkey, p_name, p_brand, p_size, length(p_name) AS ln
        FROM part
    )
    SELECT a.p_brand AS brand, a.p_size AS size,
           a.p_partkey AS id_a, b.p_partkey AS id_b,
           a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
    FROM p a JOIN p b
      ON a.p_brand = b.p_brand AND a.p_size = b.p_size
     AND a.p_partkey < b.p_partkey
     AND abs(a.ln - b.ln) <= {FUZZY_LEN_BAND}
    WHERE levenshtein(a.p_name, b.p_name) <= {FUZZY_MAX_DIST}
    ORDER BY brand, size, id_a, id_b
    """,
)
def join_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy entity-resolution join — the record-linkage
    primitive (matching near-identical product/customer/vendor names
    across feeds) done the scalable way: candidate pairs come from an
    EQUI-join on a blocking key (brand, size), are pre-filtered by the
    length-band necessary condition (|len_a − len_b| ≤ band implies
    edit distance ≥ the difference — cheap integer compare before the
    O(len²) DP), and only then refined by exact Levenshtein ≤ 2.

    The naive form is the corpus² cross join every dedup tutorial
    warns about; blocking bounds the pair space by the largest block
    (here ≤ the parts sharing one (brand, size) cell — at sf0.01 the
    blocks yield 1.4k candidates from a 2M-pair space, a 1400×
    reduction), and at 100 TB blocks shuffle independently like any
    equi-join. Levenshtein itself is the same DP in both engines
    (proven identical in string_levenshtein); `a < b` ordering halves
    the space and makes pairs canonical."""
    p = load(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand", "p_size", F.length("p_name").alias("ln")
    )
    a = p.alias("a")
    b = p.alias("b")
    pairs = a.join(
        b,
        (F.col("a.p_brand") == F.col("b.p_brand"))
        & (F.col("a.p_size") == F.col("b.p_size"))
        & (F.col("a.p_partkey") < F.col("b.p_partkey"))
        & (
            F.abs(F.col("a.ln") - F.col("b.ln")) <= FUZZY_LEN_BAND
        ),
    )
    return (
        pairs.withColumn(
            "edit_dist",
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).cast("bigint"),
        )
        .filter(F.col("edit_dist") <= FUZZY_MAX_DIST)
        .select(
            F.col("a.p_brand").alias("brand"),
            F.col("a.p_size").alias("size"),
            F.col("a.p_partkey").alias("id_a"),
            F.col("b.p_partkey").alias("id_b"),
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            "edit_dist",
        )
        .orderBy("brand", "size", "id_a", "id_b")
    )


@register(
    "join_hint_shuffle_hash",
    oracle="""
    SELECT o.o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY priority
    """,
)
def join_hint_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-STRATEGY HINTS — the per-query physical-plan control
    surface a tuning engineer reaches for when the optimizer's
    default is wrong for a known workload: a big-big equi-join above
    the broadcast threshold defaults to SortMergeJoin (sort both
    sides, spill-friendly), but when the build side's PER-PARTITION
    slice fits in memory, SHUFFLE_HASH skips both sorts — often the
    single biggest win on a join whose output feeds an aggregation
    (no downstream order to reuse). The op runs the hinted join and
    HARD-FAILS unless the executed plan actually contains
    ShuffledHashJoin (hints are advisory — silently ignored hints are
    precisely the production failure mode this pins); pytest asserts
    the unhinted twin picks SortMergeJoin, so the evidence covers
    both directions. Results hash-match the plain-SQL oracle — the
    strategy changes the plan, never the answer.

    At 100 TB the tradeoff is real: SMJ's sorts cost CPU but degrade
    gracefully to disk; SHUFFLE_HASH wins while build partitions fit
    (size via spark.sql.shuffle.partitions) and AQE's
    skew-join splitting keeps the hash side bounded."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    joined = li.join(
        orders.hint("SHUFFLE_HASH"),
        li.l_orderkey == orders.o_orderkey,
    )
    result = (
        joined.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .orderBy("priority")
    )
    plan = result._jdf.queryExecution().executedPlan().toString()
    if "ShuffledHashJoin" not in plan:
        raise RuntimeError(
            "SHUFFLE_HASH hint did not take effect — executed plan has: "
            + ", ".join(
                n for n in ("SortMergeJoin", "BroadcastHashJoin") if n in plan
            )
        )
    return result
