"""Set operators.

Reference parity: A7 multi-table union-all — the reference concatenates
per-table row slices (main.go:180-187); Spark's ``unionByName`` is the
same operation as a lazy plan node (zero cost until an action, no
materialization). A13 delete-behind (main.go:131-145) has EXCEPT/anti
set semantics — `except_keys` is its relational form.

UNION ALL never shuffles. DISTINCT/INTERSECT/EXCEPT hash-shuffle on the
full row — at 100 TB prefer key-only projections before them (done here)
so the shuffle payload is just the key column.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pg_archiver_spark.catalog import load
from pg_archiver_spark.registry import register


def union_all(dfs: list[DataFrame]) -> DataFrame:
    """The reference's append loop (main.go:180-187), Spark-first."""
    return reduce(DataFrame.unionByName, dfs)


@register(
    "union_all_multi_table",
    oracle="""
    SELECT table_name, COUNT(*) AS n_rows
    FROM (
        SELECT event_id, 'tbl_click' AS table_name FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT event_id, 'tbl_view' AS table_name FROM events WHERE event_type = 'view'
    )
    GROUP BY table_name
    """,
)
def union_all_multi_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two tagged subsets unioned and profiled — the reference's
    multi-table archive concat (A6 lineage literal + A7 union)."""
    events = load(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", F.lit("tbl_click").alias("table_name")
    )
    views = events.filter(F.col("event_type") == "view").select(
        "event_id", F.lit("tbl_view").alias("table_name")
    )
    return (
        union_all([clicks, views])
        .groupBy("table_name")
        .agg(F.count("*").alias("n_rows"))
    )


@register(
    "merge_upsert",
    oracle="""
    WITH updates AS (
        SELECT event_id, user_id, value * 2 AS value
        FROM events WHERE event_type = 'error'
    )
    SELECT
        COUNT(*) AS n_rows,
        CAST(SUM(CASE WHEN updated THEN 1 ELSE 0 END) AS BIGINT) AS n_updated,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM (
        SELECT u.event_id, u.value, TRUE AS updated
        FROM updates u
        UNION ALL
        SELECT e.event_id, e.value, FALSE AS updated
        FROM events e
        WHERE e.event_id NOT IN (SELECT event_id FROM updates)
    )
    """,
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style MERGE/upsert: a batch of updates (error events with
    doubled values) merged into the base table — matched rows replaced,
    unmatched preserved. Composed as update ∪ (base ⟕̸ update-keys), the
    relational core of a lakehouse MERGE INTO. At 100 TB both sides
    hash-partition on the merge key; with a bucketed base table the
    anti-join side is co-located and shuffle-free."""
    events = load(spark, sf_dir, "events")
    updates = events.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", (F.col("value") * 2).alias("value")
    )
    kept = events.join(updates.select("event_id"), "event_id", "left_anti").select(
        "event_id", "value", F.lit(False).alias("updated")
    )
    merged = updates.select(
        "event_id", "value", F.lit(True).alias("updated")
    ).unionByName(kept)
    return merged.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("updated"), 1).otherwise(0)).alias("n_updated"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_value"),
    )


@register(
    "union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supplier = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return customer.union(supplier).distinct()


@register(
    "intersect_keys",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def intersect_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supplier = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return customer.intersect(supplier)


@register(
    "except_keys",
    oracle="""
    SELECT o_orderkey AS orderkey FROM orders
    EXCEPT
    SELECT l_orderkey AS orderkey FROM lineitem
    """,
)
def except_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT — the delete-behind complement set (reference A13
    semantics, main.go:132-134): keys present upstream minus keys
    already archived. Catalyst plans it as a left-anti join; the
    key-only projection keeps the shuffle payload to one column.

    ``subtract`` IS SQL EXCEPT (distinct semantics). The round-1 form
    ``exceptAll(...).distinct()`` diverges on multiset inputs: with
    left=[k,k], right=[k], exceptAll leaves one k and distinct keeps
    it, while EXCEPT returns none — masked by the fixture's unique
    keys, caught in review."""
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("orderkey")
    )
    lineitem = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("orderkey")
    )
    return orders.subtract(lineitem)


@register(
    "merge_cdc_apply",
    oracle="""
    WITH log AS (
        SELECT user_id,
               epoch_ms(ts) AS ms,
               event_id,
               CASE event_type WHEN 'error' THEN 'D'
                               WHEN 'purchase' THEN 'U'
                               ELSE 'I' END AS op,
               value
        FROM events
    ),
    latest AS (
        SELECT user_id, op, value,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id
                   ORDER BY ms DESC, event_id DESC
               ) AS rn
        FROM log
    )
    SELECT COUNT(*) FILTER (WHERE op <> 'D') AS n_live,
           COUNT(*) FILTER (WHERE op = 'D') AS n_deleted,
           CAST(COALESCE(SUM(CAST(value AS DECIMAL(18,2)))
                         FILTER (WHERE op <> 'D'), 0) AS DOUBLE)
               AS live_value
    FROM latest WHERE rn = 1
    """,
)
def merge_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog compaction: collapse an ordered
    insert/update/delete log to current state — latest operation per
    key wins, a trailing delete erases the key. This is the snapshot
    rebuild every CDC consumer (Debezium→lakehouse, PG logical
    replication) runs, and the ordered generalization of
    `merge_upsert` (which has no deletes and no per-key ordering).

    ONE shuffle on the key, then a per-key top-1 window — state size
    |keys|, independent of changelog length, so a 100 TB log compacts
    to a keys-sized snapshot in a single pass. Deterministic total
    order per key: (epoch-ms, event_id) DESC (G5). The op codes are
    derived from event_type so the fixture stands in for a real
    changelog."""
    from pyspark.sql import Window

    events = load(spark, sf_dir, "events")
    log = events.select(
        "user_id",
        F.expr("ts_ns DIV 1000000").alias("ms"),
        "event_id",
        F.when(F.col("event_type") == "error", "D")
        .when(F.col("event_type") == "purchase", "U")
        .otherwise("I")
        .alias("op"),
        "value",
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ms").desc(), F.col("event_id").desc()
    )
    latest = log.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return latest.agg(
        F.count_if(F.col("op") != "D").alias("n_live"),
        F.count_if(F.col("op") == "D").alias("n_deleted"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("op") != "D", F.col("value").cast("decimal(18,2)")
                )
            ),
            F.lit(0).cast("decimal(18,2)"),
        )
        .cast("double")
        .alias("live_value"),
    )


# SCD2 merge: split the event log at this epoch-ms boundary (Jan 15
# 2024); history is built from batch 1, then batch 2 is MERGED in
# incrementally, and the oracle proves merged == full recompute.
SCD2_SPLIT_MS = (19723 + 14) * 86_400_000
SCD2_OPEN_MS = 253_402_300_800_000  # year-9999 sentinel (G13: no NULLs)


@register(
    "merge_scd2_upsert",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_type AS state, epoch_ms(ts) AS ms, event_id,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY epoch_ms(ts), event_id)
                   AS prev
        FROM events
    ),
    chg AS (
        SELECT user_id, state, ms, event_id
        FROM seq WHERE prev IS NULL OR state <> prev
    )
    SELECT user_id, state,
           ms AS valid_from_ms,
           CAST(COALESCE(LEAD(ms) OVER (PARTITION BY user_id
                                        ORDER BY ms, event_id),
                         {SCD2_OPEN_MS}) AS BIGINT) AS valid_to_ms
    FROM chg
    """,
)
def merge_scd2_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SCD2 history maintenance — the nightly MERGE every
    warehouse runs into its dimension-history table, proven equal to a
    full recompute by the oracle.

    True SCD2 opens a row only on state CHANGE (consecutive duplicates
    collapse). The op builds history from batch 1 (events before
    SCD2_SPLIT_MS), then merges batch 2: the subtlety a naive
    incremental MERGE gets wrong is that batch 2's first row per user
    must be compared against the INHERITED open state from history —
    a user whose first new event repeats their current state must NOT
    open a new interval. The merge (1) suppresses those inherited
    duplicates, (2) closes each affected open interval at the user's
    first surviving batch-2 change, (3) appends the new intervals.
    The driver then hash-compares against DuckDB's single-pass full
    recompute over the whole log — any suppression/closing mistake
    shifts an interval boundary and fails the hash.

    Plan: every stage is per-user windows or per-user equi-joins — one
    shuffle key throughout, and the merge's working set is the CHANGE
    table (dimension-history-sized), not the event log: at 100 TB the
    nightly batch joins against |users| open rows, never against
    history depth.
    """
    events = load(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_type").alias("state"),
        F.expr("ts_ns DIV 1000000").alias("ms"),
        "event_id",
    )
    b1 = events.filter(F.col("ms") < SCD2_SPLIT_MS)
    b2 = events.filter(F.col("ms") >= SCD2_SPLIT_MS)
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")

    def collapse(df: DataFrame) -> DataFrame:
        """Change rows only: state != previous state (per user)."""
        prev = F.lag("state").over(w)
        return (
            df.withColumn("prev", prev)
            .filter(F.col("prev").isNull() | (F.col("state") != F.col("prev")))
            .drop("prev")
        )

    # History from batch 1 (valid_to via lead; open rows = sentinel).
    chg1 = collapse(b1)
    h1 = chg1.select(
        "user_id",
        "state",
        "ms",
        "event_id",
        F.coalesce(F.lead("ms").over(w), F.lit(SCD2_OPEN_MS))
        .cast("bigint")
        .alias("valid_to_ms"),
    )
    open1 = h1.filter(F.col("valid_to_ms") == SCD2_OPEN_MS).select(
        "user_id", F.col("state").alias("open_state")
    )

    # Batch-2 change rows, comparing the first row per user against the
    # inherited open state (left join: brand-new users inherit nothing).
    chg2 = (
        b2.withColumn("lag_state", F.lag("state").over(w))
        .join(open1, "user_id", "left")
        .withColumn("prev", F.coalesce("lag_state", "open_state"))
        .filter(F.col("prev").isNull() | (F.col("state") != F.col("prev")))
        .select("user_id", "state", "ms", "event_id")
    )

    # Close affected open intervals at the first surviving batch-2
    # change; un-affected open rows stay open.
    first2 = chg2.groupBy("user_id").agg(F.min("ms").alias("first2_ms"))
    h1_closed = (
        h1.join(first2, "user_id", "left")
        .select(
            "user_id",
            "state",
            F.col("ms").alias("valid_from_ms"),
            F.when(
                (F.col("valid_to_ms") == SCD2_OPEN_MS)
                & F.col("first2_ms").isNotNull(),
                F.col("first2_ms"),
            )
            .otherwise(F.col("valid_to_ms"))
            .cast("bigint")
            .alias("valid_to_ms"),
        )
    )
    # New intervals from batch 2 (lead within the surviving changes).
    h2 = chg2.select(
        "user_id",
        "state",
        F.col("ms").alias("valid_from_ms"),
        F.coalesce(F.lead("ms").over(w), F.lit(SCD2_OPEN_MS))
        .cast("bigint")
        .alias("valid_to_ms"),
    )
    return h1_closed.unionByName(h2)
